"""Area lights + uniform light selection (light.cpp, scene.h:45-57,
mesh.cpp:108-133), vectorized per-lane.

A "light" is an emissive mesh; sampling picks a triangle from the per-light
area CDF (built by the scene compiler, mesh.cpp:31-44) and warps a uniform
pair onto it (pbrt sqrt-warp). PDFs follow light.cpp:36-51: mesh area pdf
(1/total area) converted to solid angle by dist^2/cos(theta).

Reference quirk preserved: the interpolated light normal is NOT normalized
(mesh.cpp:126: ``n.normalized()`` discards its result); with per-mesh unit
normals on planar lights this is exact anyway.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as km


class LightSample(NamedTuple):
    p: jnp.ndarray  # (N, 3) point on light
    n: jnp.ndarray  # (N, 3) light normal (unnormalized interp, see above)
    wi: jnp.ndarray  # (N, 3) ref -> light, unit
    dist: jnp.ndarray  # (N,)
    pdf: jnp.ndarray  # (N,) solid-angle pdf
    ls: jnp.ndarray  # (N, 3) Le / pdf (light.cpp:30-33), 0 when invalid


def select_uniform(num_lights: int, u):
    """Scene::getRandomLight (scene.h:45-53): index = min(floor(n*u), n-1)."""
    idx = jnp.floor(num_lights * u).astype(jnp.int32)
    return jnp.clip(idx, 0, num_lights - 1)


def sample_area_light(scene, light_idx, ref_p, u_tri, u1, u2):
    """AreaLight::sample via Mesh::sample (light.cpp:21-34, mesh.cpp:108-133).

    Draw order matches the reference: u_tri picks the triangle from the CDF,
    (u1, u2) warp onto it.
    """
    # CDF search: fetch each lane's CDF row with an exact where-chain
    # (lights are few) then one batched compare -- no per-k gathers.
    L, max_lf = scene.light_faces.shape
    cdf_rows = km.select_rows(light_idx, scene.light_cdf)  # (N, max_lf+1)
    tri = jnp.sum(
        (u_tri[:, None] >= cdf_rows[:, 1:max_lf]).astype(jnp.int32), axis=1
    )
    tri = jnp.clip(tri, 0, max_lf - 1)

    su0 = jnp.sqrt(u1)
    u = 1.0 - su0
    v = u2 * su0

    if L * max_lf <= 64:
        # two-level fetch: the light-face shade rows form a tiny table
        # (L*max_lf, 24); per-lane rows come from a where-chain, so the
        # whole light sample runs without a single XLA gather (max_unroll
        # matches the 64-row gate -- select_rows' default of 40 would
        # silently fall back to the gather for 41-64 rows, advisor r3)
        small = scene.face_shade[scene.light_faces.reshape(-1)]
        row = km.select_rows(light_idx * max_lf + tri, small, max_unroll=64)
    else:
        face = scene.light_faces[light_idx, tri]
        row = scene.face_shade[face]
    p0 = row[:, 0:3]
    p1 = row[:, 3:6]
    p2 = row[:, 6:9]
    p = p0 + u[:, None] * (p1 - p0) + v[:, None] * (p2 - p0)

    has_n = km.select_rows(
        light_idx, scene.mesh_has_normals[scene.light_mesh]
    )
    n0 = row[:, 9:12]
    n1 = row[:, 12:15]
    n2 = row[:, 15:18]
    n_interp = n0 + u[:, None] * (n1 - n0) + v[:, None] * (n2 - n0)
    n_geo = km.normalize(km.cross(p1 - p0, p2 - p0))
    n = jnp.where(has_n[:, None], n_interp, n_geo)

    to_light = p - ref_p
    dist = km.norm(to_light)
    wi = to_light / jnp.maximum(dist, 1e-9)[:, None]

    pdf = pdf_area_light(scene, light_idx, n, wi, dist)
    radiance = eval_area_light(scene, light_idx, n, wi)
    valid = (pdf > 0.0) & jnp.isfinite(pdf)
    ls = jnp.where(
        valid[:, None], radiance / jnp.maximum(pdf, 1e-9)[:, None], 0.0
    )
    return LightSample(p=p, n=n, wi=wi, dist=dist, pdf=pdf, ls=ls)


def eval_area_light(scene, light_idx, n, wi):
    """AreaLight::eval (light.cpp:16-19): one-sided radiance."""
    cos_theta = km.dot(n, -wi)
    rad = km.select_rows(light_idx, scene.light_radiance)
    return jnp.where((cos_theta > 0.0)[:, None], rad, 0.0)


def pdf_area_light(scene, light_idx, n, wi, dist):
    """AreaLight::pdf (light.cpp:36-51): area->solid-angle conversion."""
    cos_theta = km.dot(n, -wi)
    inv_area = km.select_rows(light_idx, scene.light_inv_area)
    pdf = inv_area * km.sqr(dist) / jnp.maximum(cos_theta, 1e-9)
    return jnp.where(cos_theta > 0.0, pdf, 0.0)


class EnvSample(NamedTuple):
    wi: jnp.ndarray  # (N, 3) unit direction toward the environment
    pdf: jnp.ndarray  # (N,) solid-angle pdf
    radiance: jnp.ndarray  # (N, 3) env radiance along wi
    ls: jnp.ndarray  # (N, 3) radiance / pdf (0 when pdf invalid)


def _bisect_rows(cdf_2d, row, u, n):
    """Per-lane bisect_right over ``cdf_2d[row]`` (n+1 entries): returns j
    with cdf[j] <= u < cdf[j+1]. log2(n) scalar-step gathers instead of a
    (N, n+1) row gather."""
    lo = jnp.zeros_like(row)
    hi = jnp.full_like(row, n)
    for _ in range(int(np.ceil(np.log2(max(n, 2))))):
        mid = (lo + hi) // 2
        cm = cdf_2d[row, mid]
        go_right = u >= cm
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def env_dir_to_uv(d):
    """The lat-long mapping of eval_texture_dir (textures.py)."""
    u = (jnp.arctan2(d[..., 0], d[..., 2]) + jnp.pi) * km.INV_TWOPI
    v = (jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) + 0.5 * jnp.pi) * km.INV_PI
    return u, v


def sample_env_light(scene, static, u1, u2) -> EnvSample:
    """Importance-sample the environment from the compile-time luminance
    tables (compiler._build_env_tables): u1 inverts the row-marginal CDF,
    u2 the per-row conditional, with continuous offsets inside the chosen
    texel so directions cover the sphere densely."""
    Eh, Ew = static.env_res
    row_cdf = scene.env_row_cdf  # (Eh+1,)
    col_cdf = scene.env_col_cdf  # (Eh, Ew+1)

    i = jnp.clip(
        jnp.searchsorted(row_cdf, u1, side="right") - 1, 0, Eh - 1
    ).astype(jnp.int32)
    seg = jnp.maximum(row_cdf[i + 1] - row_cdf[i], 1e-12)
    dv = jnp.clip((u1 - row_cdf[i]) / seg, 0.0, 1.0)
    v = (i.astype(jnp.float32) + dv) / Eh

    j = _bisect_rows(col_cdf, i, u2, Ew).astype(jnp.int32)
    segc = jnp.maximum(col_cdf[i, j + 1] - col_cdf[i, j], 1e-12)
    du = jnp.clip((u2 - col_cdf[i, j]) / segc, 0.0, 1.0)
    u = (j.astype(jnp.float32) + du) / Ew

    phi = u * (2.0 * jnp.pi) - jnp.pi
    lat = (v - 0.5) * jnp.pi
    cos_lat = jnp.cos(lat)
    wi = jnp.stack(
        [cos_lat * jnp.sin(phi), jnp.sin(lat), cos_lat * jnp.cos(phi)], -1
    )
    pdf = scene.env_pdf[i, j]
    radiance = background_radiance(scene, static, wi)
    valid = pdf > 0.0
    ls = jnp.where(
        valid[:, None], radiance / jnp.maximum(pdf, 1e-12)[:, None], 0.0
    )
    return EnvSample(wi=wi, pdf=pdf, radiance=radiance, ls=ls)


def pdf_env_dir(scene, static, d):
    """Solid-angle pdf the env sampler assigns to direction ``d`` (for MIS
    against BSDF sampling)."""
    Eh, Ew = static.env_res
    u, v = env_dir_to_uv(d)
    i = jnp.clip((v * Eh).astype(jnp.int32), 0, Eh - 1)
    j = jnp.clip((u * Ew).astype(jnp.int32), 0, Ew - 1)
    return scene.env_pdf[i, j]


def background_radiance(scene, static, d):
    """Scene::getBackgroundColor (scene.cpp:54-79): env texture by direction,
    intensity-scaled (texture.cpp:104-145); NaN-guarded."""
    if not static.has_background:
        return jnp.zeros_like(d)
    from .textures import eval_texture_dir

    tid = jnp.broadcast_to(scene.bg_tex, d.shape[:-1])
    lod = None
    if getattr(static, "mip_textures", False) and static.pixel_cone > 0.0:
        # constant per-render footprint: one pixel's cone angle mapped
        # through the lat-long v axis (dv/dlat = 1/pi); per-texture
        # resolution is added inside eval_texture
        import numpy as _np

        lod = jnp.full(
            d.shape[:-1],
            _np.float32(_np.log2(max(static.pixel_cone / _np.pi, 1e-9))),
        )
    col = eval_texture_dir(
        static, scene.textures, tid, d,
        jnp.broadcast_to(scene.bg_color, d.shape), lod=lod,
    )
    col = scene.bg_intensity * col
    finite = jnp.all(jnp.isfinite(d), axis=-1)
    return jnp.where(finite[..., None], col, 0.0)
