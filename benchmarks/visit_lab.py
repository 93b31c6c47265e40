#!/usr/bin/env python
"""Per-visit cost of the cluster-trace drain loop, measured at the grid
level (the only reliable way through the axon tunnel: single dispatches
disappear under ~1ms RPC latency, so every config runs a full
grid=(blocks,) pallas_call like the real kernel).

Each kernel: per block, V simulated leaf visits; each visit runs the MT
test matmuls in one of several packings/precisions over resident VMEM
data, plus optionally the argmin+one-hot winner fetch and the HBM DMA.
Compare to the real kernel's ~8.7us/visit (bounce trace, round 3).

Usage: python benchmarks/visit_lab.py
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

BLOCK = 1024
_HIGH = jax.lax.Precision.HIGHEST
_DEF = jax.lax.Precision.DEFAULT


def timed(fn, *args, n=10):
    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n


def make_drain(
    visits, quantities_packed, K_tri, precision, with_fetch, with_dma,
    blocks, bf16=False,
):
    """One grid=(blocks,) kernel; per block run `visits` visits.

    quantities_packed: 1 -> four (16,K)x(16,B) dots per visit;
                       4 -> one (64, 4K)x(64,B) block-diag dot per visit.
    """
    F = 16 * quantities_packed
    M = K_tri * quantities_packed
    ROWSW = F  # weight rows per visit in the resident table
    wdt = jnp.bfloat16 if bf16 else jnp.float32

    def kernel(geo_hbm_ref, out_ref, wbuf_ref, feat_ref, sem_ref, acc_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            feat_ref[...] = jnp.ones((F, BLOCK), wdt)

        acc_ref[...] = jnp.zeros((8, BLOCK), jnp.float32)

        def visit(i, z):
            if with_dma:
                slot = jax.lax.rem(i, 2)
                cid = jax.lax.rem(b * 7 + i * 13, jnp.int32(256))
                dma = pltpu.make_async_copy(
                    geo_hbm_ref.at[cid],
                    wbuf_ref.at[pl.ds(slot * ROWSW, ROWSW)],
                    sem_ref.at[slot],
                )
                dma.start()
                dma.wait()
                w = wbuf_ref[pl.ds(slot * ROWSW, ROWSW), pl.ds(0, M)]
            else:
                w = wbuf_ref[pl.ds(0, ROWSW), pl.ds(0, M)]
            feat = feat_ref[...]
            if quantities_packed == 4:
                prod = jax.lax.dot_general(
                    w, feat,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )  # (4K, B)
                det = prod[0 * K_tri : 1 * K_tri]
                tn = prod[1 * K_tri : 2 * K_tri]
                un = prod[2 * K_tri : 3 * K_tri]
                vn = prod[3 * K_tri : 4 * K_tri]
            else:
                dg = functools.partial(
                    jax.lax.dot_general,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                det = dg(w, feat)
                tn = dg(w + wdt(1), feat)
                un = dg(w + wdt(2), feat)
                vn = dg(w + wdt(3), feat)
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
            leaf_min = jnp.min(tt, axis=0)
            if with_fetch:
                improved = leaf_min < acc_ref[0, :]

                @pl.when(jnp.any(improved))
                def _():
                    kwin = jnp.argmin(tt, axis=0)
                    iota_k = jax.lax.broadcasted_iota(
                        jnp.int32, (K_tri, BLOCK), 0
                    )
                    onehot = jnp.where(
                        (iota_k == kwin[None, :]) & improved[None, :],
                        1.0, 0.0,
                    )
                    sh = wbuf_ref[pl.ds(0, 32), pl.ds(0, K_tri)].astype(
                        jnp.float32
                    )
                    fetched = jax.lax.dot_general(
                        sh, onehot,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_HIGH,
                    )
                    acc_ref[0, :] = jnp.where(
                        improved, leaf_min, acc_ref[0, :]
                    )
                    acc_ref[1, :] = fetched[0, :]
            else:
                acc_ref[0, :] = jnp.minimum(acc_ref[0, :], leaf_min)
            return z

        jax.lax.fori_loop(0, visits, visit, jnp.int32(0))
        out_ref[...] = acc_ref[...]

    geo = jnp.ones((256, ROWSW, max(M, 128)), wdt)

    @jax.jit
    def run(geo):
        return pl.pallas_call(
            kernel,
            grid=(blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (8, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((8, blocks * BLOCK), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2 * ROWSW, max(M, 128)), wdt),
                pltpu.VMEM((F, BLOCK), wdt),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((8, BLOCK), jnp.float32),
            ],
        )(geo)

    return run, geo


def main():
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    blocks = 506
    visits = 40
    configs = [
        # (label, qpack, K_tri, precision, bf16, fetch, dma)
        ("current: 4x(16,128) HIGHEST +fetch +dma", 1, 128, _HIGH, False, True, True),
        ("4x(16,128) HIGHEST, no fetch, no dma   ", 1, 128, _HIGH, False, False, False),
        ("4x(16,128) DEFAULT +fetch +dma         ", 1, 128, _DEF, False, True, True),
        ("packed (64,512) HIGHEST +fetch +dma    ", 4, 128, _HIGH, False, True, True),
        ("packed (64,512) DEFAULT +fetch +dma    ", 4, 128, _DEF, False, True, True),
        ("packed (64,512) bf16 +fetch +dma       ", 4, 128, _DEF, True, True, True),
        ("packed (64,512) bf16, no fetch +dma    ", 4, 128, _DEF, True, False, True),
        ("packed K=64 (64,256) bf16 +fetch +dma  ", 4, 64, _DEF, True, True, True),
    ]
    for label, qp, kt, prec, bf16, fetch, dma in configs:
        run, geo = make_drain(
            visits, qp, kt, prec, fetch, dma, blocks, bf16=bf16
        )
        dt = timed(run, geo)
        per_visit = dt / (blocks * visits)
        print(
            f"{label}: {dt*1e3:8.2f} ms total, {per_visit*1e6:6.3f} us/visit",
            flush=True,
        )


if __name__ == "__main__":
    main()
