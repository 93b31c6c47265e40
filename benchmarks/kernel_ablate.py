#!/usr/bin/env python
"""Kernel-internal attribution on real bounce-1 rays of the hero scene.

Times cluster_trace._run directly on PRE-SORTED packed rays (no sort I/O)
and reads the kernel's free diagnostics (out rows 34/35: per-block visit
and walk-step counts) to compute the per-visit and per-step costs.

Run twice to attribute the winner fetch:
    python benchmarks/kernel_ablate.py
    KAZEN_TRACE_ABLATE=nofetch python benchmarks/kernel_ablate.py
(fresh process per setting: the ablation flag is captured at compile).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from kazen_tpu.accel import cluster_trace as ct
    from kazen_tpu.core import rng
    from kazen_tpu.integrate import camera as camera_mod
    from kazen_tpu.integrate import path_mis
    from kazen_tpu.integrate.render import sampler_spec
    from kazen_tpu.samplers import streams
    from kazen_tpu.scene import xml_io
    from kazen_tpu.scene.compiler import compile_scene
    from kazen_tpu.shade import bsdf as bsdf_mod
    from kazen_tpu.shade import lights as lights_mod

    w, h = 960, 540
    desc = xml_io.load_xml(
        "/root/reference/scene/2022_q1/parameters/default_m0_r0.5.xml"
    )
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

    # face -> cluster map so the primary can run on the XLA BVH walk
    # (ablation env vars must not corrupt the primary hits)
    geo_sh = np.asarray(arrays.trace_tables.geo_shade)
    f2c = np.zeros(arrays.F.shape[0], np.int32)
    for ci in range(geo_sh.shape[0]):
        fid = geo_sh[ci, 24]
        fid = fid[fid >= 0].astype(np.int64)
        f2c[fid] = ci
    f2c = jnp.asarray(f2c)

    @jax.jit
    def bounce1(scene):
        from kazen_tpu.accel.bvh import intersect_bvh
        from kazen_tpu.shade.interaction import prepare

        stream = streams.init_stream_jump(spec, px, py, jnp.uint32(0), jump)
        stream, jitter = streams.next_pixel_2d(spec, stream)
        ps = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
        stream, ap_ = streams.next_2d(spec, stream)
        rays = camera_mod.sample_ray(scene, static, ps, ap_)
        hit = intersect_bvh(scene, rays)
        its = prepare(scene, rays, hit)
        its = its._replace(cluster=f2c[jnp.clip(hit.face, 0, None)])
        wi_local = its.sh_frame.to_local(-rays.d)
        ctx = bsdf_mod.make_ctx(
            scene=scene, static=static, mat_id=its.material, uv=its.uv,
            sh_frame=its.sh_frame, dpdu=its.dpdu, wi=wi_local, lod=None,
        )
        for _ in range(5):
            stream, _u = streams.next_1d(spec, stream)
        stream, s1 = streams.next_1d(spec, stream)
        stream, s2 = streams.next_2d(spec, stream)
        res = bsdf_mod.sample_ctx(
            static, scene, ctx, s1, s2, jnp.zeros(n, jnp.float32)
        )
        d = its.sh_frame.to_world(res.wo)
        key = path_mis.cluster_key(its.cluster, d)
        return its.p, d, jnp.where(its.valid, jnp.float32(3.0e38), -1.0), key

    p, d, maxt, key = bounce1(arrays)
    order = jnp.argsort(
        jnp.where(maxt < 0, jnp.uint32(0xFFFFFFFF), key)
    )
    p, d, maxt = p[order], d[order], maxt[order]
    mint = jnp.full(n, static.trace_bias, jnp.float32)
    rays_packed, _ = ct._pack_rays(p, d, mint, maxt)
    rays_packed = jax.block_until_ready(rays_packed)
    tt = arrays.trace_tables

    # IMPORTANT: reduce the (40, N) output to (40,) INSIDE the jit -- the
    # axon tunnel reads whole outputs back eagerly (~18ms for 83MB), which
    # swamped every earlier kernel measurement in this file's history.
    run = jax.jit(
        lambda t, r: jnp.sum(
            ct._run(t, r, any_hit=False, mode="tpu", smem_nodes=True),
            axis=1,
        )
    )

    s = run(tt, rays_packed)
    blocks = n // ct.BLOCK
    vis = float(s[34]) / ct.BLOCK / blocks
    stp = float(s[35]) / ct.BLOCK / blocks
    t0 = time.time()
    nrep = 16
    for _ in range(nrep):
        s = run(tt, rays_packed)
    _ = float(jnp.sum(s))
    dt = (time.time() - t0) / nrep
    print(
        f"ablate={os.environ.get('KAZEN_TRACE_ABLATE', 'none'):8s} "
        f"kernel {dt*1e3:7.1f} ms | blocks {blocks} | "
        f"visits/block {vis:6.1f} | steps/block {stp:6.1f} | "
        f"us/block {dt/blocks*1e6:7.1f}",
        flush=True,
    )

    # any-hit kernel on the same rays (uniform maxt segment)
    runo = jax.jit(
        lambda t, r: jnp.sum(
            ct._run(t, r, any_hit=True, mode="tpu", smem_nodes=True),
            axis=1,
        )
    )
    so = runo(tt, rays_packed)
    _ = float(jnp.sum(so))
    t0 = time.time()
    for _ in range(nrep):
        so = runo(tt, rays_packed)
    _ = float(jnp.sum(so))
    dt = (time.time() - t0) / nrep
    print(f"any-hit same rays: {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
