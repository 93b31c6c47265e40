#!/usr/bin/env python
"""MXU cost model probe for the trace kernel redesign.

The cluster-trace kernel's per-visit cost is dominated by four
(16,K)x(16,BLOCK) dot_generals at HIGHEST precision (6 bf16 passes).
Questions this lab answers on the real chip:

1. Does a contraction dim of 16 cost the same as 128 (systolic-depth
   underutilization)? If yes, block-diagonal packing of the four MT
   quantities (and/or several clusters) into one K=64/128 matmul is a
   ~4-8x saving.
2. What is the real HIGHEST vs DEFAULT (1-pass bf16) ratio inside a
   Pallas kernel?
3. Cost of the surrounding VPU work (the sign-folded acceptance chain)
   relative to the matmuls.

Usage: python benchmarks/mxu_lab.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LAT = [0.0]


def timed(fn, *args, n=20):
    """One host sync per batch of n dispatches (the axon tunnel round trip
    is ~25ms; per-rep syncing would swamp every kernel under test)."""

    def sync(x):
        x = x.astype(jnp.float32)
        return float(jnp.sum(x[..., :1] if x.ndim else x))

    sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return max((time.time() - t0 - _LAT[0]) / n, 0.0)


def make_mm_kernel(M, K, N, precision, reps):
    """Kernel: out = sum over reps of W @ f, W (K, M) contracted on dim0
    with f (K, N) -- the trace kernel's exact dot_general shape."""

    def kernel(w_ref, f_ref, o_ref):
        acc = jnp.zeros((M, N), jnp.float32)
        for r in range(reps):
            acc = acc + jax.lax.dot_general(
                w_ref[...],
                f_ref[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        o_ref[...] = acc

    @jax.jit
    def run(w, f):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )(w, f)

    return run


def main():
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    rng = np.random.default_rng(0)
    _LAT[0] = timed(jax.jit(lambda s: s + 1.0), jnp.float32(0.0), n=30)
    print(f"round-trip latency: {_LAT[0]*1e6:.0f} us")

    N = 1024
    REPS = 512  # amortize kernel launch
    for prec_name, prec in (
        ("DEFAULT", jax.lax.Precision.DEFAULT),
        ("HIGHEST", jax.lax.Precision.HIGHEST),
    ):
        for M, K in ((128, 16), (512, 16), (128, 64), (128, 128),
                     (512, 64), (512, 128), (1024, 128)):
            w = jnp.asarray(rng.random((K, M), dtype=np.float32))
            f = jnp.asarray(rng.random((K, N), dtype=np.float32))
            run = make_mm_kernel(M, K, N, prec, REPS)
            dt = timed(run, w, f)
            per = dt / REPS
            macs = M * N * K
            print(
                f"{prec_name:8s} M={M:5d} K={K:4d} N={N}: "
                f"{per*1e6:8.3f} us/mm  ({macs/per/1e12:7.2f} Tmac/s)"
            )

    # bf16 operands, DEFAULT (true 1-pass)
    for M, K in ((128, 16), (512, 64), (512, 128), (1024, 128)):
        w = jnp.asarray(
            rng.random((K, M), dtype=np.float32).astype(np.dtype("bfloat16"))
        )
        f = jnp.asarray(
            rng.random((K, N), dtype=np.float32).astype(np.dtype("bfloat16"))
        )
        run = make_mm_kernel(M, K, N, jax.lax.Precision.DEFAULT, REPS)
        dt = timed(run, w, f)
        per = dt / REPS
        macs = M * N * K
        print(
            f"bf16-in  M={M:5d} K={K:4d} N={N}: "
            f"{per*1e6:8.3f} us/mm  ({macs/per/1e12:7.2f} Tmac/s)"
        )

    # VPU: the acceptance chain alone on (512, 1024) f32
    def vpu_kernel(a_ref, o_ref):
        acc = jnp.zeros((128, N), jnp.float32)
        for r in range(32):
            det = a_ref[0:128]
            tn = a_ref[128:256]
            un = a_ref[256:384]
            vn = a_ref[384:512]
            s = jnp.where(det < 0.0, -1.0, 1.0)
            sd = det * s
            su = un * s
            sv = vn * s
            st = tn * s
            q = jnp.minimum(
                jnp.minimum(su, sv),
                jnp.minimum(sd - su - sv, jnp.minimum(st, sd - st)),
            )
            ok = (sd > 1e-8) & (q >= 0.0)
            tt = jnp.where(ok, st * pl.reciprocal(sd, approx=True), 3e38)
            acc = jnp.minimum(acc, tt + r)
        o_ref[...] = acc

    a = jnp.asarray(rng.random((512, N), dtype=np.float32))

    @jax.jit
    def vrun(a):
        return pl.pallas_call(
            vpu_kernel,
            out_shape=jax.ShapeDtypeStruct((128, N), jnp.float32),
        )(a)

    dt = timed(vrun, a)
    print(f"VPU acceptance chain (128x1024, 32 reps): {dt/32*1e6:8.3f} us/rep")


if __name__ == "__main__":
    main()
