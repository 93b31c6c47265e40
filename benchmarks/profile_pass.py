#!/usr/bin/env python
"""Stage-wise profile of one render pass on the reference hero scene.

Times, on the real device: the full pass, the trace kernel alone, shading
prep, BSDF dispatch, occlusion, and the per-bounce lane re-sort -- so we
know exactly where a 1-spp pass spends its time. Usage:

    python benchmarks/profile_pass.py [--scene PATH] [--size WxH]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=3, **kw):
    """Force a full device->host sync per repetition: block_until_ready
    through the axon tunnel does not reliably wait (xla_lab.py), so sum a
    leaf and pull the scalar."""
    import jax
    import jax.numpy as jnp

    def sync(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "astype")]
        return float(jnp.sum(leaves[0][..., :1].astype(jnp.float32)))

    out = fn(*args, **kw)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        sync(out)
    return (time.time() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scene",
        default="/root/reference/scene/2022_q1/parameters/default_m0_r0.5.xml",
    )
    ap.add_argument("--size", default="960x540")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from kazen_tpu.scene import xml_io
    from kazen_tpu.scene.compiler import compile_scene
    import dataclasses

    from kazen_tpu.core import rng
    from kazen_tpu.film import film as film_mod
    from kazen_tpu.integrate import camera as camera_mod
    from kazen_tpu.integrate import path_mis
    from kazen_tpu.integrate.render import li_fn_for, sampler_spec, _render_pass
    from kazen_tpu.samplers import streams
    from kazen_tpu.shade import bsdf as bsdf_mod
    from kazen_tpu.shade.interaction import prepare

    desc = xml_io.load_xml(args.scene)
    desc.camera.width = w
    desc.camera.height = h
    arrays, static = compile_scene(desc)
    print(f"scene: {arrays.F.shape[0]} faces, materials={static.num_materials}, "
          f"lights={static.num_lights}, mk={getattr(static,'use_megakernel',False)}, "
          f"tt={'yes' if arrays.trace_tables is not None else 'no'}", flush=True)

    spec = sampler_spec(static)
    n = w * h
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))
    a, c = rng.advance_constants(0)
    jump = ((jnp.uint32(a >> 32), jnp.uint32(a & 0xFFFFFFFF)),
            (jnp.uint32(c >> 32), jnp.uint32(c & 0xFFFFFFFF)))
    film = film_mod.make_film(static)

    # ---- full pass ----
    t0 = time.time()
    dt, (film2, nrays) = timed(
        _render_pass, arrays, static, spec, film, px, py, jnp.uint32(0), jump,
        n=2,
    )
    print(f"[compile+warm took {time.time()-t0:.1f}s]", flush=True)
    print(f"full pass          : {dt*1e3:9.1f} ms   "
          f"({float(nrays)/dt/1e6:.2f}M rays/s, {n/dt/1e6:.2f}M px-samp/s)", flush=True)

    # ---- camera rays + primary trace ----
    @jax.jit
    def camera_rays(scene):
        stream = streams.init_stream_jump(spec, px, py, jnp.uint32(0), jump)
        stream, jitter = streams.next_pixel_2d(spec, stream)
        ps = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
        stream, ap_ = streams.next_2d(spec, stream)
        return stream, camera_mod.sample_ray(scene, static, ps, ap_)

    _, rays = camera_rays(arrays)
    jax.block_until_ready(rays)

    tt = arrays.trace_tables
    if tt is not None:
        from kazen_tpu.accel import cluster_trace

        @jax.jit
        def trace_only(tt, o, d, mint, maxt):
            return cluster_trace.trace(tt, o, d, mint, maxt)

        dt, res = timed(trace_only, tt, rays.o, rays.d, rays.mint, rays.maxt)
        print(f"trace (coherent)   : {dt*1e3:9.1f} ms   ({n/dt/1e6:.2f}M rays/s)", flush=True)

        # incoherent trace: shuffled rays
        perm = np.random.default_rng(0).permutation(n)
        o_s, d_s = rays.o[perm], rays.d[perm]
        dt, _ = timed(trace_only, tt, o_s, d_s, rays.mint, rays.maxt)
        print(f"trace (shuffled)   : {dt*1e3:9.1f} ms   ({n/dt/1e6:.2f}M rays/s)", flush=True)

        @jax.jit
        def occl_only(tt, o, d):
            return cluster_trace.occluded(
                tt, o, d, jnp.full(n, 1e-3, jnp.float32), jnp.full(n, 10.0, jnp.float32)
            )

        dt, _ = timed(occl_only, tt, rays.o, rays.d)
        print(f"occluded (coherent): {dt*1e3:9.1f} ms   ({n/dt/1e6:.2f}M rays/s)", flush=True)

    # ---- intersect + prepare ----
    @jax.jit
    def isect_prep(scene, rays):
        hit = path_mis.intersect(scene, rays)
        return prepare(scene, rays, hit)

    dt, its = timed(isect_prep, arrays, rays)
    print(f"intersect+prepare  : {dt*1e3:9.1f} ms", flush=True)

    # ---- trace-I/O sort overhead (key + argsort + row permutes) ----
    @jax.jit
    def sort_io(scene, rays):
        key = path_mis._trace_key(scene, rays.o, rays.d)
        order = jnp.argsort(key)
        rows = jnp.stack([rays.o[:, 0], rays.o[:, 1], rays.o[:, 2],
                          rays.d[:, 0], rays.d[:, 1], rays.d[:, 2],
                          rays.mint, rays.maxt], 0)[:, order]
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype))
        back = jnp.tile(rows, (5, 1))[:, inv]  # stand-in for 40 result rows
        return back

    dt, _ = timed(sort_io, arrays, rays)
    print(f"trace-I/O sorting  : {dt*1e3:9.1f} ms", flush=True)

    # ---- one full bounce ----
    stream0 = streams.init_stream_jump(spec, px, py, jnp.uint32(0), jump)
    st_init = path_mis._State(
        stream=stream0, ray_o=rays.o, ray_d=rays.d, its=its,
        li=jnp.zeros((n, 3), jnp.float32),
        throughput=jnp.ones((n, 3), jnp.float32),
        eta=jnp.ones(n, jnp.float32), bsdf_weight=jnp.ones(n, jnp.float32),
        accum_rough=jnp.zeros(n, jnp.float32), alive=its.valid,
        rays=jnp.float32(0),
    )

    @jax.jit
    def one_bounce(scene, st):
        return path_mis._bounce(scene, static, spec, st, draw_rr=jnp.bool_(False))

    dt, _ = timed(one_bounce, arrays, st_init)
    print(f"one bounce (all-in): {dt*1e3:9.1f} ms", flush=True)

    # ---- BSDF dispatch alone (eval_pdf + sample on the kiss ctx) ----
    @jax.jit
    def shade_only(scene, its, rays):
        wi_local = its.sh_frame.to_local(-rays.d)
        ctx = bsdf_mod.make_ctx(
            scene=scene, static=static, mat_id=its.material, uv=its.uv,
            sh_frame=its.sh_frame, dpdu=its.dpdu, wi=wi_local, lod=None,
        )
        accum = jnp.zeros(n, jnp.float32)
        f, pdf_b = bsdf_mod.eval_pdf_ctx(static, scene, ctx, wi_local, accum)
        res = bsdf_mod.sample_ctx(
            static, scene, ctx, jnp.full(n, 0.4, jnp.float32),
            jnp.full((n, 2), 0.3, jnp.float32), accum,
        )
        return f, pdf_b, res.weight

    dt, _ = timed(shade_only, arrays, its, rays)
    print(f"bsdf eval+pdf+samp : {dt*1e3:9.1f} ms", flush=True)

    # ---- light sampling (NEE sans occlusion) ----
    from kazen_tpu.shade import lights as lights_mod

    @jax.jit
    def nee_sample(scene, its):
        u = jnp.full(n, 0.3, jnp.float32)
        pick = lights_mod.select_uniform(static.num_lights, u)
        ls = lights_mod.sample_area_light(scene, pick, its.p, u, u, u)
        return ls

    if static.num_lights:
        dt, _ = timed(nee_sample, arrays, its)
        print(f"light sample       : {dt*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
