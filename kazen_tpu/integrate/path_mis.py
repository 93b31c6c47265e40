"""Wavefront NEE+MIS path tracer.

Faithful re-expression of the reference's iterative megaloop
(PathMisIntegrator::Li, integrator.cpp:195-338) as a masked SoA wavefront:
every lane carries (ray, throughput, eta, bsdfWeight, accumulatedRoughness,
alive) and all lanes advance through the same per-bounce stages, so the
per-lane random-stream consumption matches the reference exactly and images
agree at equal (sampler, spp, seed).

Bounce structure (per iteration):
  1. emitter-hit termination with MIS weight       (integrator.cpp:226-231)
  2. Russian roulette from depth>=3, `<=` compare  (:237-244)
  3. NEE: uniform light pick, area-light sample, biased shadow ray with
     step-through of primary-invisible lights      (:247-294)
  4. roughness-bias accumulation (opt-in)          (:297-301)
  5. BSDF sample; throughput/eta update            (:303-309)
  6. trace; miss -> background; emitter-hit MIS
     weight for next iteration                     (:312-331)

The first three bounces are Python-unrolled so the RR draw is only consumed
from depth 3 (parity with the reference's conditional draw); the remaining
depth is a lax.scan with uniform consumption.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel.intersect import Rays, intersect_brute
from ..core import math as km
from ..samplers import streams
from ..shade import bsdf as bsdf_mod
from ..shade import lights as lights_mod
from ..shade.interaction import Interaction, prepare, prepare_from_rows

EPSILON = 1e-4  # Ray3f default mint (define.h)
INF = jnp.float32(3.0e38)
_MAX_OCCLUSION_STEPS = 8


def _spread10(x):
    """Spread the low 10 bits of x two apart (Morton interleave)."""
    x = jnp.bitwise_and(x, jnp.uint32(0x3FF))
    x = jnp.bitwise_and(x | (x << 16), jnp.uint32(0x030000FF))
    x = jnp.bitwise_and(x | (x << 8), jnp.uint32(0x0300F00F))
    x = jnp.bitwise_and(x | (x << 4), jnp.uint32(0x030C30C3))
    x = jnp.bitwise_and(x | (x << 2), jnp.uint32(0x09249249))
    return x


def _morton3(cell):
    return (
        (_spread10(cell[:, 0]) << 2)
        | (_spread10(cell[:, 1]) << 1)
        | _spread10(cell[:, 2])
    )


def _trace_key(scene, o, d):
    """Per-ray packet-coherence sort key: direction octant (major), origin
    Morton cell (32^3), direction Morton cell (16^3, minor). Measured on
    the 36k-face reference scene (benchmarks/trace_stats.py): octant-major
    ordering cuts the packet walk's node steps ~4x on bounce rays vs
    origin-Morton alone; the direction-Morton minor bits give camera rays
    (identical origins) pixel-tile-like coherence, so one key serves every
    trace. The key orders *trace I/O only* -- per-lane state stays in pixel
    order (sorting the whole wavefront state was ~10x the gather cost of
    permuting 8 ray rows in + 40 hit rows out)."""
    bmin = jnp.min(scene.V, axis=0)
    ext = jnp.maximum(jnp.max(scene.V, axis=0) - bmin, 1e-6)
    ocell = jnp.clip((o - bmin) / ext * 32.0, 0.0, 31.0).astype(jnp.uint32)
    mo = _morton3(ocell)  # 15 bits
    dcell = jnp.clip((d * 0.5 + 0.5) * 16.0, 0.0, 15.0).astype(jnp.uint32)
    md = _morton3(dcell)  # 12 bits
    octant = (
        (d[:, 0] > 0).astype(jnp.uint32) * 4
        + (d[:, 1] > 0).astype(jnp.uint32) * 2
        + (d[:, 2] > 0).astype(jnp.uint32)
    )
    return (octant << 27) | (mo << 12) | md


_PAD_VALS = (3.0e38, 3.0e38, 3.0e38, 1.0, 1.0, 1.0, 0.0, -1.0)


def _dmorton(d):
    """12-bit direction Morton code (16^3 cells)."""
    dcell = jnp.clip((d * 0.5 + 0.5) * 16.0, 0.0, 15.0).astype(jnp.uint32)
    return _morton3(dcell)


def cluster_key(cluster, d):
    """Bounce-trace sort key: hit-cluster id (major) | direction Morton.

    The winner cluster id comes straight out of the previous trace
    (cluster_trace.py out row 33), so the key costs two shifts instead of
    a 3D origin Morton; measured on the hero scene it also *beats* the
    origin-Morton key (benchmarks/trace_stats2.py: 19.4 vs 35.9 union
    visits per 1024-lane block on bounce rays)."""
    return (cluster.astype(jnp.uint32) << 12) | _dmorton(d)


def shadow_key(cluster, pick, d):
    """NEE shadow-trace key: picked light (major) | hit cluster |
    direction Morton (trace_stats2: 33.2 vs 42.5 union visits)."""
    return (
        (pick.astype(jnp.uint32) << 26)
        | (jnp.minimum(cluster, 16383).astype(jnp.uint32) << 12)
        | _dmorton(d)
    )


def _trace_sorted(scene, tt, o, d, mint, maxt, any_hit, key=None):
    """Key-sorted packet trace: permute packed ray rows in (one (8, N)
    gather), run the Pallas kernel on coherent blocks, permute the result
    rows back (one gather). Dead lanes (maxt < 0) sort last and their
    blocks exit the kernel on the first test."""
    import os

    from ..accel import cluster_trace as ct

    n = o.shape[0]
    do_sort = os.environ.get("KAZEN_TRACE_SORT", "1") not in ("0", "false")
    rows = jnp.stack(
        [
            o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2],
            jnp.broadcast_to(mint, (n,)),
            jnp.broadcast_to(maxt, (n,)),
        ],
        0,
    )
    if do_sort:
        if key is None:
            key = _trace_key(scene, o, d)
        # dead lanes (empty segments) last: their blocks exit on one test
        key = jnp.where(maxt < 0.0, jnp.uint32(0xFFFFFFFF), key)
        order = jnp.argsort(key)
        rows = rows[:, order]
    pad = (-n) % ct.BLOCK
    if pad:
        pad_cols = jnp.tile(
            jnp.asarray(_PAD_VALS, jnp.float32)[:, None], (1, pad)
        )
        rows = jnp.concatenate([rows, pad_cols], axis=1)
    out = ct._dispatch(tt, rows, any_hit, ct._mode())[:, :n]
    if not do_sort:
        return out
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(n, dtype=order.dtype)
    )
    return out[:, inv]


def intersect_prepare(scene, rays: Rays, key=None):
    """Scene::rayIntersect + post-hit shade prep (accel.cpp:63-236) in one
    step. With cluster trace tables attached (the TPU production path) the
    fused Pallas kernel returns the hit *and* the winning face's shading
    attributes directly from VMEM (accel/cluster_trace.py) over
    key-sorted coherent packets, so no XLA gathers run at all; otherwise
    the XLA BVH walk / brute-force oracle is followed by the gather-based
    ``prepare``.

    The kernel runs on gradient-stopped rays; (t, u, v) and the interaction
    quantities are recomputed in closed form against the returned rows so
    gradients flow exactly as in the gather path."""
    tt = getattr(scene, "trace_tables", None)
    if tt is not None:
        rays_ng = jax.tree_util.tree_map(jax.lax.stop_gradient, rays)
        rows = _trace_sorted(
            scene, tt, rays_ng.o, rays_ng.d, rays_ng.mint, rays_ng.maxt,
            any_hit=False, key=key,
        )
        return prepare_from_rows(rays, rows)
    hit = intersect(scene, rays)
    return hit, prepare(scene, rays, hit)


def intersect(scene, rays: Rays):
    """Scene::rayIntersect: nearest hit only. Backend order: fused Pallas
    cluster trace (TPU; see intersect_prepare), XLA gather-walk BVH,
    brute-force oracle."""
    tt = getattr(scene, "trace_tables", None)
    if tt is not None:
        hit, _ = intersect_prepare(scene, rays)
        return hit
    bvh = getattr(scene, "bvh", None)
    if bvh is not None:
        from ..accel.bvh import intersect_bvh

        hit = intersect_bvh(scene, rays)
    else:
        hit = intersect_brute(scene, rays)
    return hit


def power_heuristic(pdf_a, pdf_b):
    """powerHeuristic (integrator.cpp:340-344). The untaken branch of the
    where must not compute 0/0 (reverse-mode turns its NaN into NaN
    cotangents), so the denominator is substituted where a2 == 0."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    ok = a2 > 0.0
    return jnp.where(ok, a2 / jnp.where(ok, a2 + b2, 1.0), 0.0)


def _occluded_with_stepthrough(
    scene, static, o, d, mint, maxt, active, key=None
):
    """Shadow-ray occlusion with the reference's step-through of
    primary-invisible lights (integrator.cpp:259-278): the nearest hit is
    examined; invisible lights are skipped by re-casting past them. The
    re-cast loop is capped at _MAX_OCCLUSION_STEPS=8 (the reference's loop
    is unbounded; >8 stacked invisible lights along one shadow ray differ).

    With Pallas trace tables attached, occlusion is instead a single
    any-hit pass that ignores invisible-light faces (the megakernel's
    epsilon-level deviation, documented in accel/cluster_trace.py)."""
    tt = getattr(scene, "trace_tables", None)
    if tt is not None:
        n = o.shape[0]
        out = _trace_sorted(
            scene, tt, o, d,
            jnp.broadcast_to(jnp.asarray(mint, jnp.float32), (n,)),
            maxt, any_hit=True, key=key,
        )
        return (out[0] > 0.0) & active

    def cond(state):
        _, _, _, done, steps = state
        return (~jnp.all(done)) & (steps < _MAX_OCCLUSION_STEPS)

    def body(state):
        o, mt, occluded, done, steps = state
        rays = Rays(o=o, d=d, mint=jnp.full_like(mt, mint), maxt=mt)
        hit = intersect(scene, rays)
        its_mesh = scene.face_mesh[jnp.clip(hit.face, 0, scene.F.shape[0] - 1)]
        its_light = scene.mesh_light[its_mesh]
        is_light = hit.valid & (its_light >= 0)
        light_visible = scene.light_primary_vis[jnp.maximum(its_light, 0)]
        blocked = hit.valid & (~is_light | (is_light & light_visible))
        newly_done = ~hit.valid | blocked
        # step past the invisible light (integrator.cpp:273)
        o_next = o + d * (hit.t + static.trace_bias)[:, None]
        mt_next = mt - hit.t
        upd = ~done & ~newly_done
        return (
            jnp.where(upd[:, None], o_next, o),
            jnp.where(upd, mt_next, mt),
            jnp.where(~done & blocked, True, occluded),
            done | newly_done,
            steps + 1,
        )

    n = o.shape[0]
    init = (
        o,
        maxt,
        jnp.zeros(n, bool),
        ~active,  # inactive lanes are pre-done
        jnp.int32(0),
    )
    _, _, occluded, _, _ = jax.lax.while_loop(cond, body, init)
    return occluded


class _State(NamedTuple):
    stream: streams.StreamState
    ray_o: jnp.ndarray
    ray_d: jnp.ndarray
    its: Interaction
    li: jnp.ndarray  # (N, 3)
    throughput: jnp.ndarray  # (N, 3)
    eta: jnp.ndarray  # (N,)
    bsdf_weight: jnp.ndarray  # (N,)
    accum_rough: jnp.ndarray  # (N,)
    alive: jnp.ndarray  # (N,) bool
    rays: jnp.ndarray  # () f32: useful rays traced (primary+shadow+path)


def _light_eval_at_hit(scene, its: Interaction, ray_o):
    """Light::eval with lRec(ref=ray.o, p=its.p, n=its.shFrame.n)."""
    wi = km.normalize(its.p - ray_o)
    lidx = jnp.maximum(its.light, 0)
    return lights_mod.eval_area_light(scene, lidx, its.sh_frame.n, wi)


def _light_pdf_at_hit(scene, its: Interaction, ray_o):
    to_p = its.p - ray_o
    dist = km.norm(to_p)
    wi = to_p / jnp.maximum(dist, 1e-9)[:, None]
    lidx = jnp.maximum(its.light, 0)
    return lights_mod.pdf_area_light(scene, lidx, its.sh_frame.n, wi, dist)


def _bounce(scene, static, spec, st: _State, draw_rr) -> _State:
    """One wavefront bounce; ``draw_rr`` is a traced bool scalar -- when
    false the RR draw is *not consumed* (per-lane stream state is selected
    back), matching the reference's depth>=3 conditional draw exactly while
    keeping the bounce body a single scan iteration. Lane state stays in
    pixel order throughout; packet coherence is the trace wrappers' job
    (_trace_sorted permutes ray rows per trace call)."""
    stream = st.stream
    its = st.its
    alive = st.alive
    li = st.li
    throughput = st.throughput
    eta = st.eta
    accum = st.accum_rough

    wi_world = -st.ray_d
    wi_local = its.sh_frame.to_local(wi_world)
    lod = None
    if getattr(static, "mip_textures", False):
        # Mip level from a per-segment ray-cone footprint: world width
        # t * pixel_cone, mapped to uv space through the *larger* of the
        # two uv-axis footprints, i.e. the smaller of |dpdu|/|dpdv| (the
        # isotropic-conservative choice; OIIO's EWA would treat the axes
        # anisotropically, texture.cpp:46-64). log2 of the uv footprint;
        # per-texture resolution is added inside eval_texture.
        foot_world = jnp.abs(its.t) * static.pixel_cone
        dp_len = jnp.maximum(
            jnp.minimum(km.norm(its.dpdu), km.norm(its.dpdv)), 1e-6
        )
        lod = jnp.log2(jnp.maximum(foot_world / dp_len, 1e-9))
    ctx = bsdf_mod.make_ctx(
        scene=scene, static=static, mat_id=its.material, uv=its.uv,
        sh_frame=its.sh_frame, dpdu=its.dpdu, wi=wi_local, lod=lod,
    )

    # (1) emitter hit terminates the lane (integrator.cpp:226-231)
    hit_light = alive & (its.light >= 0)
    le = _light_eval_at_hit(scene, its, st.ray_o)
    li = li + jnp.where(
        hit_light[:, None],
        st.bsdf_weight[:, None] * throughput * le,
        0.0,
    )
    alive = alive & ~hit_light

    # (2) Russian roulette (integrator.cpp:237-244); `<=` keeps 0-throughput
    # lanes from dividing 0/0. The draw is consumed only when draw_rr.
    stream_rr, u_rr = streams.next_1d(spec, stream)
    stream = jax.tree_util.tree_map(
        lambda a, b: jnp.where(draw_rr, a, b), stream_rr, stream
    )
    prob = jnp.minimum(jnp.max(throughput, axis=-1) * eta * eta, 0.95)
    dead = draw_rr & (prob <= u_rr)
    alive = alive & ~dead
    rr_scale = jnp.where(
        draw_rr & alive, 1.0 / jnp.maximum(prob, 1e-9), 1.0
    )
    throughput = throughput * rr_scale[:, None]

    # (3) NEE (integrator.cpp:247-294). With env importance sampling on
    # (opt-in, beyond reference) the environment joins the uniform light
    # pick as one extra strategy; draw count/order is unchanged (the env
    # reuses the two triangle-warp draws as its 2D sample).
    do_env = static.env_importance and static.has_background
    n_strat = static.num_lights + (1 if do_env else 0)
    if n_strat > 0:
        stream, u_pick = streams.next_1d(spec, stream)
        stream, u_tri = streams.next_1d(spec, stream)
        stream, u_a = streams.next_1d(spec, stream)
        stream, u_b = streams.next_1d(spec, stream)
        pick = lights_mod.select_uniform(n_strat, u_pick)
        if static.num_lights > 0:
            lidx = jnp.clip(pick, 0, static.num_lights - 1)
            ls = lights_mod.sample_area_light(
                scene, lidx, its.p, u_tri, u_a, u_b
            )
            nee_wi = ls.wi
            nee_maxt = ls.dist - static.trace_bias
            nee_ls = ls.ls
            nee_pdf = ls.pdf
        if do_env:
            env = lights_mod.sample_env_light(scene, static, u_a, u_b)
            if static.num_lights > 0:
                is_env = pick == static.num_lights
                nee_wi = jnp.where(is_env[:, None], env.wi, nee_wi)
                nee_maxt = jnp.where(is_env, INF, nee_maxt)
                nee_ls = jnp.where(is_env[:, None], env.ls, nee_ls)
                nee_pdf = jnp.where(is_env, env.pdf, nee_pdf)
            else:
                nee_wi = env.wi
                nee_maxt = jnp.full(env.pdf.shape, INF)
                nee_ls = env.ls
                nee_pdf = env.pdf
        # Ls / getLightPdf() (integrator.cpp:252)
        ls_val = nee_ls * n_strat

        occluded = _occluded_with_stepthrough(
            scene,
            static,
            its.p,
            nee_wi,
            static.trace_bias,
            # dead lanes get an empty [bias, -1] segment so their blocks
            # exit the packet walk on the root test
            jnp.where(alive, nee_maxt, -1.0),
            alive,
            key=shadow_key(its.cluster, pick, nee_wi),
        )
        wo_local = its.sh_frame.to_local(nee_wi)
        f, pdf_b = bsdf_mod.eval_pdf_ctx(static, scene, ctx, wo_local, accum)
        w_light = power_heuristic(nee_pdf, pdf_b)
        contrib = throughput * ls_val * f * w_light[:, None]
        li = li + jnp.where((alive & ~occluded)[:, None], contrib, 0.0)
        n_shadow_rays = jnp.sum(alive.astype(jnp.float32))
    else:
        n_shadow_rays = jnp.float32(0.0)

    # (4) roughness-bias firefly control (integrator.cpp:297-301)
    if static.regularization:
        reg = bsdf_mod.regularize_ctx(static, scene, ctx)
        accum = jnp.where(
            alive, accum + reg * static.accumulated_roughness, accum
        )

    # (5) BSDF sampling (integrator.cpp:303-309)
    stream, s1 = streams.next_1d(spec, stream)
    stream, s2 = streams.next_2d(spec, stream)
    res = bsdf_mod.sample_ctx(static, scene, ctx, s1, s2, accum)
    throughput = jnp.where(alive[:, None], throughput * res.weight, throughput)
    eta = jnp.where(alive, eta * res.eta, eta)
    # zero-weight lanes can never contribute again
    alive = alive & jnp.any(res.weight > 0.0, axis=-1)

    bsdf_pdf = res.pdf

    # (6) trace the BSDF ray (integrator.cpp:312-331)
    new_d = its.sh_frame.to_world(res.wo)
    new_o = its.p
    n = new_o.shape[0]
    rays = Rays(
        o=new_o,
        d=new_d,
        mint=jnp.full(n, static.trace_bias, jnp.float32),
        maxt=jnp.where(alive, INF, -1.0),
    )
    hit, new_its = intersect_prepare(
        scene, rays, key=cluster_key(its.cluster, new_d)
    )

    n_path_rays = jnp.sum(alive.astype(jnp.float32))

    missed = alive & ~hit.valid
    bg = lights_mod.background_radiance(scene, static, new_d)
    if static.env_importance and static.has_background:
        # MIS weight against the env NEE strategy (only exists when env
        # importance sampling is on; reference escape weight is 1)
        w_bg = power_heuristic(
            bsdf_pdf, lights_mod.pdf_env_dir(scene, static, new_d)
        )
        w_bg = jnp.where(res.is_discrete, 1.0, w_bg)
        li = li + jnp.where(
            missed[:, None], throughput * bg * w_bg[:, None], 0.0
        )
    else:
        li = li + jnp.where(missed[:, None], throughput * bg, 0.0)
    alive = alive & hit.valid

    # MIS weight for a light hit by the BSDF ray (integrator.cpp:320-331)
    new_hit_light = alive & (new_its.light >= 0)
    light_pdf_next = _light_pdf_at_hit(scene, new_its, new_o)
    bsdf_weight = jnp.where(
        new_hit_light,
        power_heuristic(bsdf_pdf, light_pdf_next),
        st.bsdf_weight,
    )
    bsdf_weight = jnp.where(res.is_discrete, 1.0, bsdf_weight)

    # keep lane state frozen where not alive (li already masked)
    def keep(new, old, mask=alive):
        extra = (1,) * (new.ndim - mask.ndim)
        return jnp.where(mask.reshape(mask.shape + extra), new, old)

    its_out = jax.tree_util.tree_map(lambda a, b: keep(a, b), new_its, its)
    return _State(
        stream=stream,
        ray_o=keep(new_o, st.ray_o),
        ray_d=keep(new_d, st.ray_d),
        its=its_out,
        li=li,
        throughput=throughput,
        eta=eta,
        bsdf_weight=bsdf_weight,
        accum_rough=accum,
        alive=alive,
        rays=st.rays + n_shadow_rays + n_path_rays,
    )


def li_wavefront(scene, static, spec, stream, rays: Rays):
    """Integrator::Li over a whole lane batch. Returns (stream, li).

    Lane state lives in the caller's (pixel) order for the whole path;
    each trace call sorts its own ray I/O into coherent packets
    (_trace_sorted), so no wavefront-wide permutation ever happens."""
    return _li_wavefront_core(scene, static, spec, stream, rays)


def _li_wavefront_core(scene, static, spec, stream, rays: Rays):
    n = rays.o.shape[0]
    hit, its = intersect_prepare(scene, rays)

    # Camera-ray punch-through for primary-invisible lights
    # (integrator.cpp:213-220): a single re-cast past the light; if the
    # re-cast misses, the stale light hit is kept (reference behavior).
    lvis = km.select_rows(
        jnp.maximum(its.light, 0), scene.light_primary_vis
    )
    punch = hit.valid & (its.light >= 0) & ~lvis
    if static.num_lights > 0:
        o2 = its.p + static.trace_bias * rays.d
        # only punch lanes re-cast; the rest get empty segments so their
        # sorted-last blocks exit the packet kernel on the first test
        rays2 = Rays(
            o=o2,
            d=rays.d,
            mint=jnp.full(n, EPSILON),
            maxt=jnp.where(punch, INF, -1.0),
        )
        hit2, its2 = intersect_prepare(scene, rays2)
        take = punch & hit2.valid

        def pick(a, b):
            extra = (1,) * (a.ndim - take.ndim)
            return jnp.where(take.reshape(take.shape + extra), a, b)

        its = jax.tree_util.tree_map(pick, its2, its)

    st = _State(
        stream=stream,
        ray_o=rays.o,
        ray_d=rays.d,
        its=its,
        li=jnp.zeros((n, 3), jnp.float32),
        throughput=jnp.ones((n, 3), jnp.float32),
        eta=jnp.ones(n, jnp.float32),
        bsdf_weight=jnp.ones(n, jnp.float32),
        accum_rough=jnp.zeros(n, jnp.float32),
        alive=its.valid,
        rays=jnp.sum(jnp.ones(n, jnp.float32)),
    )

    draw_rr_flags = jnp.arange(static.max_depth) >= 3

    def body(carry, flag):
        return _bounce(scene, static, spec, carry, draw_rr=flag), None

    st, _ = jax.lax.scan(body, st, draw_rr_flags)
    return st.stream, st.li, st.rays
