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
    # CDF search as a static loop of (N,) compares: per-lane rows are short
    # (padded to the largest light's face count) and vmap'd searchsorted is
    # gather-bound on TPU.
    max_lf = scene.light_faces.shape[1]
    tri = jnp.zeros(u_tri.shape, jnp.int32)
    for k in range(1, max_lf):
        tri = tri + (u_tri >= scene.light_cdf[light_idx, k]).astype(jnp.int32)
    tri = jnp.clip(tri, 0, max_lf - 1)
    face = scene.light_faces[light_idx, tri]

    su0 = jnp.sqrt(u1)
    u = 1.0 - su0
    v = u2 * su0

    row = scene.face_shade[face]
    p0 = row[:, 0:3]
    p1 = row[:, 3:6]
    p2 = row[:, 6:9]
    p = p0 + u[:, None] * (p1 - p0) + v[:, None] * (p2 - p0)

    mesh = scene.light_mesh[light_idx]
    has_n = scene.mesh_has_normals[mesh]
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
    rad = scene.light_radiance[light_idx]
    return jnp.where((cos_theta > 0.0)[:, None], rad, 0.0)


def pdf_area_light(scene, light_idx, n, wi, dist):
    """AreaLight::pdf (light.cpp:36-51): area->solid-angle conversion."""
    cos_theta = km.dot(n, -wi)
    inv_area = scene.light_inv_area[light_idx]
    pdf = inv_area * km.sqr(dist) / jnp.maximum(cos_theta, 1e-9)
    return jnp.where(cos_theta > 0.0, pdf, 0.0)


def background_radiance(scene, static, d):
    """Scene::getBackgroundColor (scene.cpp:54-79): env texture by direction,
    intensity-scaled (texture.cpp:104-145); NaN-guarded."""
    if not static.has_background:
        return jnp.zeros_like(d)
    from .textures import eval_texture_dir

    tid = jnp.broadcast_to(scene.bg_tex, d.shape[:-1])
    col = eval_texture_dir(
        static, scene.textures, tid, d, jnp.broadcast_to(scene.bg_color, d.shape)
    )
    col = scene.bg_intensity * col
    finite = jnp.all(jnp.isfinite(d), axis=-1)
    return jnp.where(finite[..., None], col, 0.0)
