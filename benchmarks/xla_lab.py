#!/usr/bin/env python
"""Micro-costs of the XLA glue ops the wavefront leans on, on the real
device: argsort, permutation gathers (1/8/48 rows), big-table gathers vs
one-hot matmul gathers for small tables. Decides the bounce-loop redesign
(which sorts/permutes/gathers we can afford per bounce).

Usage: python benchmarks/xla_lab.py [--lanes 518400]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_LAT = [0.0]


def timed(fn, *args, n=5):
    """block_until_ready through the axon tunnel does not actually wait, so
    force a full-result device->host sync (float of a sum) per iteration
    and subtract the measured empty round-trip latency."""
    import jax
    import jax.numpy as jnp

    def total(x):
        return sum(
            float(jnp.sum(l.astype(jnp.float32)))
            for l in jax.tree_util.tree_leaves(x)
        )

    total(fn(*args))  # compile+warm
    t0 = time.time()
    out = None
    for _ in range(n):
        out = fn(*args)
    total(out)  # one sync per batch: the tunnel round trip is ~1-25ms
    return max((time.time() - t0 - _LAT[0]) / n, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=518144)  # 1024-multiple
    args = ap.parse_args()
    n = args.lanes

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.uint32))
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    rows1 = jnp.asarray(rng.random((1, n), dtype=np.float32))
    rows8 = jnp.asarray(rng.random((8, n), dtype=np.float32))
    rows48 = jnp.asarray(rng.random((48, n), dtype=np.float32))
    table_big = jnp.asarray(rng.random((36378, 24), dtype=np.float32))
    fid = jnp.asarray(rng.integers(0, 36378, n, dtype=np.int32))
    table6 = jnp.asarray(rng.random((8, 24), dtype=np.float32))
    lid = jnp.asarray(rng.integers(0, 6, n, dtype=np.int32))
    blocks = jnp.asarray(rng.random((n // 1024, 288), dtype=np.float32))

    results = {}

    # empty round-trip latency (scalar identity), subtracted from all rows
    _LAT[0] = 0.0
    _LAT[0] = timed(jax.jit(lambda s: s + 1.0), jnp.float32(0.0), n=10)
    results["(round-trip latency)"] = _LAT[0]

    results["argsort u32"] = timed(jax.jit(jnp.argsort), keys)
    results["sort-keys u32 (values only)"] = timed(jax.jit(jnp.sort), keys)
    perm1 = jax.jit(lambda r, o: r[:, o])
    results["permute 1 row"] = timed(perm1, rows1, order)
    results["permute 8 rows"] = timed(perm1, rows8, order)
    results["permute 48 rows"] = timed(perm1, rows48, order)
    pt = jax.jit(lambda t, i: t[i])
    results["gather (36k,24) table by id"] = timed(pt, table_big, fid)

    def onehot_gather(t, i):
        oh = (i[:, None] == jnp.arange(t.shape[0])[None, :]).astype(
            jnp.float32
        )
        return oh @ t

    results["one-hot gather (8,24) table"] = timed(
        jax.jit(onehot_gather), table6, lid
    )
    results["plain gather (8,24) table"] = timed(pt, table6, lid)
    results["rowwise argsort (B,288)"] = timed(
        jax.jit(lambda b: jnp.argsort(b, axis=1)), blocks
    )
    results["rowwise top128 (B,288)"] = timed(
        jax.jit(lambda b: jax.lax.top_k(-b, 128)[1]), blocks
    )
    # elementwise baseline: 50 fused where-ops over (n,3)
    x = jnp.asarray(rng.random((n, 3), dtype=np.float32))

    @jax.jit
    def elem(x):
        for _ in range(50):
            x = jnp.where(x > 0.5, x * 0.99, x + 0.01)
        return x

    results["50 fused elementwise (n,3)"] = timed(elem, x)

    # segment min/max per 1024-block (frustum boxes)
    pts = jnp.asarray(rng.random((n, 3), dtype=np.float32))
    results["per-block min/max (frustum)"] = timed(
        jax.jit(
            lambda p: (
                p.reshape(-1, 1024, 3).min(1),
                p.reshape(-1, 1024, 3).max(1),
            )
        ),
        pts,
    )

    for k, v in results.items():
        print(f"{k:38s}: {v * 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
