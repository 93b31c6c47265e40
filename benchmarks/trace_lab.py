#!/usr/bin/env python
"""Trace-kernel design lab: microbenchmarks of packet-walk variants on the
real chip, over the reference hero scene's BVH. Not part of the package --
this is the measurement harness behind accel/mega_trace.py design choices.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kazen_tpu.scene import xml_io
from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.integrate import camera as camera_mod
from kazen_tpu.integrate.render import sampler_spec
from kazen_tpu.samplers import streams
from kazen_tpu.core import rng
from kazen_tpu.accel import mega_trace

W, H = 960, 540
N = W * H


def scene_and_rays():
    desc = xml_io.load_xml(
        "/root/reference/scene/2022_q1/parameters/default_m0_r0.5.xml"
    )
    desc.camera.width, desc.camera.height = W, H
    arrays, static = compile_scene(desc)
    spec = sampler_spec(static)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))
    a, c = rng.advance_constants(0)
    jump = ((jnp.uint32(a >> 32), jnp.uint32(a & 0xFFFFFFFF)),
            (jnp.uint32(c >> 32), jnp.uint32(c & 0xFFFFFFFF)))
    stream = streams.init_stream_jump(spec, px, py, jnp.uint32(0), jump)
    stream, jitter = streams.next_pixel_2d(spec, stream)
    ps = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
    stream, ap_ = streams.next_2d(spec, stream)
    rays = camera_mod.sample_ray(arrays, static, ps, ap_)
    # tile-order rays (32x32) like li_wavefront does
    key = (py >> 5) * jnp.uint32(0x8000) + (px >> 5)
    order = jnp.argsort(key)
    o = rays.o[order]
    d = rays.d[order]
    return arrays, o, d, rays.mint, rays.maxt


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n, out


# --------------------------------------------------------------------------
# Variant 0: current kernel + step counter
# --------------------------------------------------------------------------
def count_steps(tables, o, d, mint, maxt):
    BLOCK = 1024
    NODE_F = 64

    def kernel(rays_ref, nodes_ref, out_ref):
        o = (rays_ref[0, :], rays_ref[1, :], rays_ref[2, :])
        d = (rays_ref[3, :], rays_ref[4, :], rays_ref[5, :])
        mint = rays_ref[6, :]
        maxt = rays_ref[7, :]
        inv = tuple(1.0 / jnp.where(jnp.abs(c) < 1e-20, 1e-20, c) for c in d)
        n_nodes = nodes_ref.shape[0] * 2

        def body(state):
            cursor, steps, leaves = state
            nrow = nodes_ref[jax.lax.shift_right_logical(cursor, 1), :]
            q = jnp.bitwise_and(cursor, 1)

            def nv(i):
                return jnp.where(q == 1, nrow[NODE_F + i], nrow[i])

            tx0 = (nv(0) - o[0]) * inv[0]
            tx1 = (nv(3) - o[0]) * inv[0]
            ty0 = (nv(1) - o[1]) * inv[1]
            ty1 = (nv(4) - o[1]) * inv[1]
            tz0 = (nv(2) - o[2]) * inv[2]
            tz1 = (nv(5) - o[2]) * inv[2]
            tnear = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)), jnp.minimum(tz0, tz1))
            tfar = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)), jnp.maximum(tz0, tz1))
            hit_box = (tnear <= tfar) & (tfar >= mint) & (tnear <= maxt)
            any_box = jnp.any(hit_box)
            is_leaf = nv(7) > 0.0
            nxt = jnp.where(any_box & jnp.logical_not(is_leaf), cursor + 1, nv(6).astype(jnp.int32))
            return nxt, steps + 1, leaves + jnp.where(any_box & is_leaf, 1, 0)

        _, steps, leaves = jax.lax.while_loop(
            lambda s: s[0] < n_nodes, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        )
        out_ref[0, 0] = steps
        out_ref[1, 0] = leaves

    n = o.shape[0]
    rays_packed, _ = mega_trace._pack_rays(o, d, mint, maxt)
    out = pl.pallas_call(
        kernel,
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((8, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(tables.nodes.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n // BLOCK), jnp.int32),
    )(rays_packed, tables.nodes)
    return out


def main():
    arrays, o, d, mint, maxt = scene_and_rays()
    tt = arrays.trace_tables
    print(f"tables: geo {tt.geo.shape} nodes {tt.nodes.shape} "
          f"({(tt.geo.size + tt.nodes.size) * 4 / 1e6:.1f} MB)", flush=True)

    dt, _ = timed(lambda: mega_trace.trace(tt, o, d, mint, maxt))
    print(f"current trace      : {dt*1e3:8.1f} ms  ({N/dt/1e6:.2f}M rays/s)", flush=True)

    cnt = count_steps(tt, o, d, mint, maxt)
    steps = np.asarray(cnt[0])
    leaves = np.asarray(cnt[1])
    print(f"walk steps/block   : mean {steps.mean():.0f}  p50 {np.percentile(steps,50):.0f}  "
          f"max {steps.max()}  total {steps.sum()}", flush=True)
    print(f"leaf visits/block  : mean {leaves.mean():.0f}  max {leaves.max()}  total {leaves.sum()}", flush=True)

    dt, _ = timed(lambda: count_steps(tt, o, d, mint, maxt))
    total_steps = steps.sum()
    cyc = dt * 940e6
    print(f"walk-only (no leaf): {dt*1e3:8.1f} ms  -> {cyc/total_steps:.0f} cycles/step", flush=True)


if __name__ == "__main__":
    main()
