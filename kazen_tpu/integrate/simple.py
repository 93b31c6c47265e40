"""Debug integrators: normals / ao / whitted / path_mats
(integrator.cpp:11-181), as masked wavefronts sharing the path_mis stages.

These are the reference's debugging ladder (SURVEY §2.6); they reuse the
same intersect / shade / light machinery so each one exercises a subset of
the pipeline.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..accel.intersect import Rays
from ..core import math as km
from ..core import warp
from ..samplers import streams
from ..scene.compiler import BSDF_DIFFUSE, BSDF_LAMBERTIAN
from ..shade import bsdf as bsdf_mod
from ..shade import lights as lights_mod
from .path_mis import EPSILON, INF, intersect
from ..shade.interaction import prepare

_WHITTED_MAX_DEPTH = 16


def li_normals(scene, static, spec, stream, rays: Rays):
    """NormalIntegrator (integrator.cpp:11-34): |geometric normal|."""
    hit = intersect(scene, rays)
    its = prepare(scene, rays, hit)
    col = jnp.abs(its.geo_frame.n)
    return stream, jnp.where(its.valid[:, None], col, 0.0), jnp.sum(
        jnp.ones(rays.o.shape[0], jnp.float32)
    )


def li_ao(scene, static, spec, stream, rays: Rays):
    """AmbientOcclusionIntegrator (integrator.cpp:37-70)."""
    n = rays.o.shape[0]
    hit = intersect(scene, rays)
    its = prepare(scene, rays, hit)
    stream, u2 = streams.next_2d(spec, stream)
    sample = warp.square_to_uniform_hemisphere(u2)
    point = its.sh_frame.to_world(sample)
    shadow = Rays(
        o=its.p,
        d=point,
        mint=jnp.full(n, EPSILON),
        maxt=jnp.full(n, INF),
    )
    sh = intersect(scene, shadow)
    cos_theta = km.cos_theta(its.sh_frame.to_local(km.normalize(point)))
    val = (cos_theta / jnp.pi) / km.INV_TWOPI
    visible = its.valid & ~sh.valid
    col = jnp.where(
        visible[:, None], jnp.repeat(val[:, None], 3, axis=-1), 0.0
    )
    rays_count = jnp.sum(jnp.ones(n, jnp.float32)) + jnp.sum(
        its.valid.astype(jnp.float32)
    )
    return stream, col, rays_count


def li_path_mats(scene, static, spec, stream, rays: Rays):
    """PathMatsIntegrator (integrator.cpp:137-181): BSDF sampling only,
    RR on throughput.x with `>=` kill, capped at static.max_depth."""
    n = rays.o.shape[0]
    color = jnp.zeros((n, 3))
    t = jnp.ones((n, 3))
    alive = jnp.ones(n, bool)
    ray_o, ray_d = rays.o, rays.d
    mint, maxt = rays.mint, rays.maxt
    nrays = jnp.sum(jnp.ones(n, jnp.float32))
    accum = jnp.zeros(n)

    for _ in range(static.max_depth):
        hit = intersect(scene, Rays(o=ray_o, d=ray_d, mint=mint, maxt=maxt))
        its = prepare(scene, Rays(o=ray_o, d=ray_d, mint=mint, maxt=maxt), hit)
        alive = alive & hit.valid
        # emitter contribution
        hit_light = alive & (its.light >= 0)
        wi = km.normalize(its.p - ray_o)
        le = lights_mod.eval_area_light(
            scene, jnp.maximum(its.light, 0), its.sh_frame.n, wi
        )
        color = color + jnp.where(hit_light[:, None], t * le, 0.0)
        # RR
        stream, u = streams.next_1d(spec, stream)
        prob = jnp.minimum(t[:, 0], 0.95)
        alive = alive & (u < prob)
        t = jnp.where(alive[:, None], t / jnp.maximum(prob, 1e-9)[:, None], t)
        # BSDF
        wi_local = its.sh_frame.to_local(-ray_d)
        stream, s1 = streams.next_1d(spec, stream)
        stream, s2 = streams.next_2d(spec, stream)
        res = bsdf_mod.sample(
            static, scene, its.material, its.uv, its.sh_frame, its.dpdu,
            wi_local, s1, s2, accum,
        )
        t = jnp.where(alive[:, None], t * res.weight, t)
        alive = alive & jnp.any(res.weight > 0.0, axis=-1)
        ray_o = jnp.where(alive[:, None], its.p, ray_o)
        ray_d = jnp.where(alive[:, None], its.sh_frame.to_world(res.wo), ray_d)
        mint = jnp.full(n, EPSILON)
        maxt = jnp.full(n, INF)
        nrays = nrays + jnp.sum(alive.astype(jnp.float32))
    return stream, color, nrays


def li_whitted(scene, static, spec, stream, rays: Rays):
    """WhittedIntegrator (integrator.cpp:74-134): direct light sampling on
    diffuse surfaces, RR(0.95) continuation through specular ones."""
    n = rays.o.shape[0]
    color = jnp.zeros((n, 3))
    weight = jnp.ones((n, 3))  # product of specular sample weights / 0.95
    alive = jnp.ones(n, bool)
    ray_o, ray_d = rays.o, rays.d
    mint, maxt = rays.mint, rays.maxt
    nrays = jnp.sum(jnp.ones(n, jnp.float32))
    accum = jnp.zeros(n)
    mats = scene.materials

    for _ in range(min(_WHITTED_MAX_DEPTH, static.max_depth)):
        r = Rays(o=ray_o, d=ray_d, mint=mint, maxt=maxt)
        hit = intersect(scene, r)
        its = prepare(scene, r, hit)
        alive = alive & hit.valid
        btype = mats.btype[its.material]
        is_diffuse = (btype == BSDF_DIFFUSE) | (btype == BSDF_LAMBERTIAN)

        # Le for directly visible lights
        hit_light = alive & (its.light >= 0)
        wi_cam = km.normalize(its.p - ray_o)
        le = lights_mod.eval_area_light(
            scene, jnp.maximum(its.light, 0), its.sh_frame.n, wi_cam
        )
        le = jnp.where(hit_light[:, None], le, 0.0)

        # diffuse branch: one light sample
        stream, u_pick = streams.next_1d(spec, stream)
        stream, u_tri = streams.next_1d(spec, stream)
        stream, u_a = streams.next_1d(spec, stream)
        stream, u_b = streams.next_1d(spec, stream)
        if static.num_lights > 0:
            lidx = lights_mod.select_uniform(static.num_lights, u_pick)
            ls = lights_mod.sample_area_light(scene, lidx, its.p, u_tri, u_a, u_b)
            shadow = Rays(
                o=its.p,
                d=ls.wi,
                mint=jnp.full(n, EPSILON),
                maxt=ls.dist,
            )
            occ = intersect(scene, shadow).valid
            ls_val = jnp.where(occ[:, None], 0.0, ls.ls)
            cos_theta = jnp.maximum(
                km.cos_theta(its.sh_frame.to_local(ls.wi)), 0.0
            )
            wi_local = its.sh_frame.to_local(-ray_d)
            wo_local = its.sh_frame.to_local(ls.wi)
            f = bsdf_mod.eval(
                static, scene, its.material, its.uv, its.sh_frame, its.dpdu,
                wi_local, wo_local, accum,
            )
            # NOTE reference multiplies eval (which already folds cos) by the
            # cosine again (integrator.cpp:104-113) -- preserved verbatim.
            lr = f * ls_val * cos_theta[:, None] * static.num_lights
        else:
            lr = jnp.zeros((n, 3))
        diffuse_li = le + lr
        color = color + jnp.where(
            (alive & is_diffuse)[:, None], weight * diffuse_li, 0.0
        )

        # specular branch: sample BSDF, RR(0.95), continue
        wi_local = its.sh_frame.to_local(-ray_d)
        stream, s1 = streams.next_1d(spec, stream)
        stream, s2 = streams.next_2d(spec, stream)
        res = bsdf_mod.sample(
            static, scene, its.material, its.uv, its.sh_frame, its.dpdu,
            wi_local, s1, s2, accum,
        )
        stream, u_rr = streams.next_1d(spec, stream)
        cont = alive & ~is_diffuse & (u_rr < 0.95)
        weight = jnp.where(cont[:, None], weight * res.weight / 0.95, weight)
        alive = cont & jnp.any(res.weight > 0.0, axis=-1)
        ray_o = jnp.where(alive[:, None], its.p, ray_o)
        ray_d = jnp.where(alive[:, None], its.sh_frame.to_world(res.wo), ray_d)
        mint = jnp.full(n, EPSILON)
        maxt = jnp.full(n, INF)
        nrays = nrays + jnp.sum(alive.astype(jnp.float32))
    return stream, color, nrays


LI_FNS = {
    "normals": li_normals,
    "ao": li_ao,
    "whitted": li_whitted,
    "path_mats": li_path_mats,
}
