#!/usr/bin/env python
"""Precise stage attribution for one hero-scene pass (batched-sync timing:
n dispatches, one device->host sync, minus measured round-trip -- the
axon tunnel adds ~1-25ms per sync which swamped profile_pass.py's
per-stage numbers).

Measures, with REALISTIC bounce-1 ray populations (true BSDF-sampled
directions and NEE shadow rays from the real pass state):
  - full pass
  - path trace sorted/unsorted (kernel vs sort I/O split)
  - shadow trace (any-hit) sorted
  - argsort + 8-row + 40-row permutes in isolation
  - the shade glue (bounce minus traces)

Usage: python benchmarks/profile_pass2.py [--size 960x540]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_LAT = [0.0]


def timed(fn, *args, n=6):
    import jax
    import jax.numpy as jnp

    def sync(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "astype")]
        v = leaves[0].astype(jnp.float32)
        return float(jnp.sum(v[..., :1] if v.ndim else v))

    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return max((time.time() - t0 - _LAT[0]) / n, 0.0), out


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

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from kazen_tpu.core import rng
    from kazen_tpu.film import film as film_mod
    from kazen_tpu.integrate import camera as camera_mod
    from kazen_tpu.integrate import path_mis
    from kazen_tpu.integrate.render import _render_pass, sampler_spec
    from kazen_tpu.samplers import streams
    from kazen_tpu.scene import xml_io
    from kazen_tpu.scene.compiler import compile_scene

    desc = xml_io.load_xml(args.scene)
    desc.camera.width = w
    desc.camera.height = h
    arrays, static = compile_scene(desc)
    spec = sampler_spec(static)
    n = w * h
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))
    a, c = rng.advance_constants(0)
    jump = ((jnp.uint32(a >> 32), jnp.uint32(a & 0xFFFFFFFF)),
            (jnp.uint32(c >> 32), jnp.uint32(c & 0xFFFFFFFF)))
    film = film_mod.make_film(static)

    _LAT[0] = 0.0
    _LAT[0], _ = timed(jax.jit(lambda s: s + 1.0), jnp.float32(0.0), n=10)
    print(f"[round-trip latency {_LAT[0]*1e3:.2f} ms]", flush=True)

    dt, (film2, nrays) = timed(
        _render_pass, arrays, static, spec, film, px, py, jnp.uint32(0), jump
    )
    print(
        f"full pass          : {dt*1e3:9.1f} ms  "
        f"({float(nrays)/dt/1e6:6.2f}M rays/s, {n/dt/1e6:5.2f}M px-samp/s)",
        flush=True,
    )

    # ---- build a REAL bounce-1 state --------------------------------------
    @jax.jit
    def bounce1_rays(scene):
        stream = streams.init_stream_jump(spec, px, py, jnp.uint32(0), jump)
        stream, jitter = streams.next_pixel_2d(spec, stream)
        ps = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
        stream, ap_ = streams.next_2d(spec, stream)
        rays = camera_mod.sample_ray(scene, static, ps, ap_)
        hit, its = path_mis.intersect_prepare(scene, rays)
        from kazen_tpu.shade import bsdf as bsdf_mod
        from kazen_tpu.shade import lights as lights_mod

        wi_local = its.sh_frame.to_local(-rays.d)
        ctx = bsdf_mod.make_ctx(
            scene=scene, static=static, mat_id=its.material, uv=its.uv,
            sh_frame=its.sh_frame, dpdu=its.dpdu, wi=wi_local, lod=None,
        )
        stream, u_pick = streams.next_1d(spec, stream)
        stream, u_tri = streams.next_1d(spec, stream)
        stream, u_a = streams.next_1d(spec, stream)
        stream, u_b = streams.next_1d(spec, stream)
        pick = lights_mod.select_uniform(static.num_lights, u_pick)
        ls = lights_mod.sample_area_light(scene, pick, its.p, u_tri, u_a, u_b)
        stream, s1 = streams.next_1d(spec, stream)
        stream, s2 = streams.next_2d(spec, stream)
        accum = jnp.zeros(n, jnp.float32)
        res = bsdf_mod.sample_ctx(static, scene, ctx, s1, s2, accum)
        new_d = its.sh_frame.to_world(res.wo)
        alive = its.valid
        return (
            its.p, new_d, its.cluster, alive,
            ls.wi, jnp.where(alive, ls.dist - static.trace_bias, -1.0), pick,
        )

    p, new_d, cluster, alive, swi, smaxt, pick = bounce1_rays(arrays)
    jax.block_until_ready(new_d)
    maxt_path = jnp.where(alive, jnp.float32(path_mis.INF), -1.0)
    mint = jnp.full(n, static.trace_bias, jnp.float32)
    tt = arrays.trace_tables
    key_p = path_mis.cluster_key(cluster, new_d)
    key_s = path_mis.shadow_key(cluster, pick, swi)

    def path_trace_sorted(p, d, key):
        return path_mis._trace_sorted(
            arrays, tt, p, d, mint, maxt_path, any_hit=False, key=key
        )

    def shadow_trace_sorted(p, d, key):
        return path_mis._trace_sorted(
            arrays, tt, p, d, mint, smaxt, any_hit=True, key=key
        )

    dt, _ = timed(jax.jit(path_trace_sorted), p, new_d, key_p)
    print(f"bounce path trace (sorted, +I/O) : {dt*1e3:9.1f} ms", flush=True)
    os.environ["KAZEN_TRACE_SORT"] = "0"

    dt, _ = timed(
        jax.jit(lambda p, d: path_mis._trace_sorted(
            arrays, tt, p, d, mint, maxt_path, any_hit=False
        )), p, new_d,
    )
    print(f"bounce path trace (UNSORTED)     : {dt*1e3:9.1f} ms", flush=True)
    del os.environ["KAZEN_TRACE_SORT"]

    dt, _ = timed(jax.jit(shadow_trace_sorted), p, swi, key_s)
    print(f"shadow trace (sorted, +I/O)      : {dt*1e3:9.1f} ms", flush=True)

    # ---- glue pieces ------------------------------------------------------
    dt, _ = timed(jax.jit(jnp.argsort), key_p)
    print(f"argsort (u32, {n} lanes)     : {dt*1e3:9.1f} ms", flush=True)

    order = jnp.argsort(key_p)
    rows8 = jnp.stack([p[:, 0], p[:, 1], p[:, 2], new_d[:, 0], new_d[:, 1],
                       new_d[:, 2], mint, maxt_path], 0)
    dt, _ = timed(jax.jit(lambda r, o: r[:, o]), rows8, order)
    print(f"permute 8 rows                   : {dt*1e3:9.1f} ms", flush=True)
    rows40 = jnp.tile(rows8, (5, 1))
    dt, _ = timed(jax.jit(lambda r, o: r[:, o]), rows40, order)
    print(f"permute 40 rows                  : {dt*1e3:9.1f} ms", flush=True)

    @jax.jit
    def isect_prep(scene):
        stream = streams.init_stream_jump(spec, px, py, jnp.uint32(0), jump)
        stream, jitter = streams.next_pixel_2d(spec, stream)
        ps = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
        stream, ap_ = streams.next_2d(spec, stream)
        rays = camera_mod.sample_ray(scene, static, ps, ap_)
        hit, its = path_mis.intersect_prepare(scene, rays, do_sort=False)
        return its.p

    dt, _ = timed(isect_prep, arrays)
    print(f"primary isect+prepare            : {dt*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
