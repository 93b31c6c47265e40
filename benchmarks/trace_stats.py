#!/usr/bin/env python
"""Walk-vs-drain visit statistics on the hero scene (host simulation).

For representative 1024-ray blocks (primary tile-sorted, and bounce-style
rays under different sort keys) this computes:
  - walk: shared-cursor node steps + any-lane leaf visits (what the walk
    kernel executes serially per block)
  - drain: frustum-cull candidate count + the drain length after the
    sorted early exit (needs per-lane nearest t, computed brute-force)

Decides where the trace kernel's time must go. CPU-only, numpy.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["KAZEN_PALLAS_TRACE"] = "1"

import numpy as np


def block_stats(nodes, leaf_id, o, d, mint, maxt, leaf_bounds, tbest):
    """One 1024-ray block: returns (walk_steps, walk_leaf_visits,
    drain_candidates, drain_visits_with_early_exit)."""
    n_nodes = len(nodes)
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    # ---- shared-cursor walk ----
    steps = 0
    leaves = 0
    cursor = 0
    cur_tmax = np.minimum(maxt, tbest)  # per-lane prune as in kernel
    while cursor < n_nodes:
        steps += 1
        bmin = nodes[cursor, 0:3]
        bmax = nodes[cursor, 3:6]
        t0 = (bmin[None, :] - o) * inv
        t1 = (bmax[None, :] - o) * inv
        tn = np.maximum.reduce(np.minimum(t0, t1), axis=1)
        tf = np.minimum.reduce(np.maximum(t0, t1), axis=1)
        hit = (tn <= tf) & (tf >= mint) & (tn <= cur_tmax)
        any_hit = hit.any()
        is_leaf = nodes[cursor, 7] > 0
        if any_hit and is_leaf:
            leaves += 1
        cursor = cursor + 1 if (any_hit and not is_leaf) else int(nodes[cursor, 6])
    # ---- frustum cull + sorted drain ----
    olo, ohi = o.min(0), o.max(0)
    dlo, dhi = d.min(0), d.max(0)
    mintlo = mint.min()
    tmaxhi = maxt.max()
    C = len(leaf_bounds)
    tn_lo = np.full(C, -np.inf)
    tf_hi = np.full(C, np.inf)
    tn_lo_all = np.zeros(C)
    tf_hi_all = np.zeros(C)
    tn_lo_all[:] = -np.inf
    tf_hi_all[:] = np.inf
    tn_lo = np.full(C, -np.inf)
    tf_hi = np.full(C, np.inf)
    for a in range(3):
        d0, d1 = dlo[a], dhi[a]
        if d0 <= 0.0 <= d1:
            continue
        i0, i1 = 1.0 / d0, 1.0 / d1
        ilo, ihi = min(i0, i1), max(i0, i1)
        for which, arr in ((0, None), (3, None)):
            pass
        A0 = leaf_bounds[:, a] - ohi[a]
        A1 = leaf_bounds[:, a] - olo[a]
        B0 = leaf_bounds[:, 3 + a] - ohi[a]
        B1 = leaf_bounds[:, 3 + a] - olo[a]
        tA_lo = np.minimum.reduce([A0 * ilo, A0 * ihi, A1 * ilo, A1 * ihi])
        tA_hi = np.maximum.reduce([A0 * ilo, A0 * ihi, A1 * ilo, A1 * ihi])
        tB_lo = np.minimum.reduce([B0 * ilo, B0 * ihi, B1 * ilo, B1 * ihi])
        tB_hi = np.maximum.reduce([B0 * ilo, B0 * ihi, B1 * ilo, B1 * ihi])
        tn_lo = np.maximum(tn_lo, np.minimum(tA_lo, tB_lo))
        tf_hi = np.minimum(tf_hi, np.maximum(tA_hi, tB_hi))
    t_lb = np.maximum(np.maximum(tn_lo, mintlo), 0.0)
    okc = (tn_lo <= tf_hi) & (tf_hi >= mintlo) & (t_lb <= tmaxhi)
    okc &= leaf_bounds[:, 0] <= leaf_bounds[:, 3]
    n_cand = int(okc.sum())
    # early exit point: candidates sorted by t_lb; drain until
    # max-lane tbest <= next t_lb
    order = np.argsort(np.where(okc, t_lb, np.inf))
    m = np.minimum(maxt, tbest).max()  # after full trace: final tbest hull
    visits = 0
    for j in range(n_cand):
        visits += 1
        nxt = t_lb[order[j + 1]] if j + 1 < n_cand else np.inf
        if m <= nxt:
            break
    return steps, leaves, n_cand, visits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scene",
        default="/root/reference/scene/2022_q1/parameters/default_m0_r0.5.xml",
    )
    ap.add_argument("--size", default="960x540")
    ap.add_argument("--blocks", type=int, default=24)
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from kazen_tpu.scene import xml_io
    from kazen_tpu.scene.compiler import compile_scene
    from kazen_tpu.integrate import camera as camera_mod
    from kazen_tpu.integrate.render import sampler_spec
    from kazen_tpu.samplers import streams
    from kazen_tpu.core import rng as krng

    desc = xml_io.load_xml(args.scene)
    desc.camera.width = w
    desc.camera.height = h
    arrays, static = compile_scene(desc)
    tt = arrays.trace_tables
    nodes = np.asarray(tt.nodes).reshape(-1, 64)
    # un-pack the 2-per-row node records
    nodes = np.concatenate([nodes[:, :64]]).reshape(-1, 64)
    nodes_flat = np.asarray(tt.nodes).reshape(-1, 128)
    n2 = np.concatenate([nodes_flat[:, :64], nodes_flat[:, 64:]], axis=0)
    # interleave: row r holds records 2r and 2r+1
    rec = np.empty((nodes_flat.shape[0] * 2, 64), np.float32)
    rec[0::2] = nodes_flat[:, :64]
    rec[1::2] = nodes_flat[:, 64:]
    leaf_bounds = np.asarray(tt.leaf_bounds)

    spec = sampler_spec(static)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))
    a, c = krng.advance_constants(0)
    jump = ((jnp.uint32(a >> 32), jnp.uint32(a & 0xFFFFFFFF)),
            (jnp.uint32(c >> 32), jnp.uint32(c & 0xFFFFFFFF)))
    stream = streams.init_stream_jump(spec, px, py, jnp.uint32(0), jump)
    stream, jitter = streams.next_pixel_2d(spec, stream)
    ps = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
    stream, ap2 = streams.next_2d(spec, stream)
    rays = camera_mod.sample_ray(arrays, static, ps, ap2)
    o = np.asarray(rays.o)
    d = np.asarray(rays.d)
    n = o.shape[0]

    # tile sort (32x32) as li_wavefront does
    key = (np.asarray(py) >> 5).astype(np.uint64) * 0x8000 + (
        np.asarray(px) >> 5
    )
    order = np.argsort(key)
    o_t, d_t = o[order], d[order]

    # brute-force nearest t for early-exit simulation + bounce origins
    from kazen_tpu.accel.bvh import intersect_bvh
    from kazen_tpu.accel.intersect import Rays
    hit = intersect_bvh(arrays, rays)
    t = np.asarray(hit.t)
    valid = np.asarray(hit.valid)
    t_hull = np.where(valid, t, 3.0e38)

    rng_np = np.random.default_rng(0)
    p_hit = o + d * np.where(valid, t, 1.0)[:, None]
    nrm = rng_np.standard_normal((n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    # bounce rays only from valid hits
    bo = p_hit[valid]
    bd = nrm[valid]
    bt = np.full(len(bo), 3.0e38, np.float32)

    def morton_key(p, dd=None):
        bmin = np.asarray(arrays.V).min(0)
        ext = np.maximum(np.asarray(arrays.V).max(0) - bmin, 1e-6)
        cell = np.clip((p - bmin) / ext * 64.0, 0, 63).astype(np.uint64)
        def spread(x):
            x = x & 0x3FF
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x
        m = (spread(cell[:, 0]) << 2) | (spread(cell[:, 1]) << 1) | spread(
            cell[:, 2]
        )
        if dd is not None:
            octant = (
                (dd[:, 0] > 0).astype(np.uint64) * 4
                + (dd[:, 1] > 0).astype(np.uint64) * 2
                + (dd[:, 2] > 0).astype(np.uint64)
            )
            return (m << 3) | octant
        return m

    def run(name, oo, dd, tbest):
        nb = len(oo) // 1024
        pick = np.linspace(0, nb - 1, min(args.blocks, nb)).astype(int)
        rows = []
        for b in pick:
            s = slice(b * 1024, (b + 1) * 1024)
            rows.append(
                block_stats(
                    rec, None, oo[s], dd[s],
                    np.full(1024, 1e-3, np.float32),
                    np.full(1024, 3.0e38, np.float32),
                    leaf_bounds, tbest[s],
                )
            )
        rows = np.asarray(rows, np.float64)
        print(
            f"{name:28s}: walk steps {rows[:,0].mean():6.0f}  "
            f"walk leaves {rows[:,1].mean():5.1f}  "
            f"cand {rows[:,2].mean():5.1f}  drain visits {rows[:,3].mean():5.1f}"
        )

    print(f"clusters C={int((leaf_bounds[:,0]<=leaf_bounds[:,3]).sum())}, "
          f"nodes={len(rec)}")
    run("primary tile-sorted", o_t, d_t, t_hull[order])

    bt_hull = np.full(len(bo), 3.0e38, np.float32)
    # nearest t for bounce rays (brute force via bvh)
    rb = Rays(o=jnp.asarray(bo), d=jnp.asarray(bd),
              mint=jnp.full(len(bo), 1e-3), maxt=jnp.full(len(bo), 3.0e38))
    hb = intersect_bvh(arrays, rb)
    bt_hull = np.where(np.asarray(hb.valid), np.asarray(hb.t), 3.0e38)

    m = len(bo) // 1024 * 1024
    run("bounce unsorted", bo[:m], bd[:m], bt_hull[:m])
    k1 = morton_key(bo)
    ord1 = np.argsort(k1[:m])
    run("bounce morton(o)", bo[:m][ord1], bd[:m][ord1], bt_hull[:m][ord1])
    k2 = morton_key(bo, bd)
    ord2 = np.argsort(k2[:m])
    run("bounce morton(o)+octant", bo[:m][ord2], bd[:m][ord2],
        bt_hull[:m][ord2])
    # octant-major
    k3 = (
        (
            (bd[:, 0] > 0).astype(np.uint64) * 4
            + (bd[:, 1] > 0).astype(np.uint64) * 2
            + (bd[:, 2] > 0).astype(np.uint64)
        )
        << 36
    ) | morton_key(bo)
    ord3 = np.argsort(k3[:m])
    run("bounce octant-major+morton", bo[:m][ord3], bd[:m][ord3],
        bt_hull[:m][ord3])


if __name__ == "__main__":
    main()
