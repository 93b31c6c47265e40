#!/usr/bin/env python
"""Sort-key / block-size design sweep for the trace kernel (host sim).

Simulates the shared-cursor union walk per ray block on the hero scene
with REALISTIC per-bounce ray populations (cosine-hemisphere bounce dirs
around the true hit normals; NEE shadow rays toward sampled points on the
scene's area lights) and reports, per candidate sort key and block size:

  visits/block  (leaf clusters tested -- the MXU+DMA cost driver)
  steps/block   (serial node-walk steps -- the scalar-loop cost driver)
  need          (mean fraction of lanes per visit whose own traversal
                 would test that cluster -- MXU utilization)
  visits/ray    (sum of visits over blocks / rays: total work per ray)

CPU-only. Usage: python benchmarks/trace_stats2.py [--size 960x540]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["KAZEN_PALLAS_TRACE"] = "1"  # force trace-table packing on CPU

import numpy as np


def walk_stats(rec, o, d, mint, maxt, tbest):
    """Union walk over one block: (steps, visit_cluster_ids)."""
    n_nodes = len(rec)
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    steps = 0
    visits = []
    cursor = 0
    cur_tmax = np.minimum(maxt, tbest)
    while cursor < n_nodes:
        steps += 1
        bmin = rec[cursor, 0:3]
        bmax = rec[cursor, 3:6]
        with np.errstate(over="ignore", invalid="ignore"):
            t0 = (bmin[None, :] - o) * inv
            t1 = (bmax[None, :] - o) * inv
        tn = np.maximum.reduce(np.minimum(t0, t1), axis=1)
        tf = np.minimum.reduce(np.maximum(t0, t1), axis=1)
        hit = (tn <= tf) & (tf >= mint) & (tn <= cur_tmax)
        any_hit = bool(hit.any())
        is_leaf = rec[cursor, 7] > 0
        if any_hit and is_leaf:
            visits.append((int(rec[cursor, 8]), int(hit.sum())))
        cursor = cursor + 1 if (any_hit and not is_leaf) else int(rec[cursor, 6])
    return steps, visits


def per_ray_clusters(rec, o, d, mint, maxt, tbest):
    """visits a single ray's own walk would make (lower bound per ray)."""
    return walk_stats(
        rec, o[None], d[None], mint[None], maxt[None], tbest[None]
    )[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scene",
        default="/root/reference/scene/2022_q1/parameters/default_m0_r0.5.xml",
    )
    ap.add_argument("--size", default="960x540")
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--perray", type=int, default=256)
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kazen_tpu.accel.bvh import intersect_bvh
    from kazen_tpu.accel.intersect import Rays
    from kazen_tpu.core import rng as krng
    from kazen_tpu.integrate import camera as camera_mod
    from kazen_tpu.integrate.render import sampler_spec
    from kazen_tpu.samplers import streams
    from kazen_tpu.scene import xml_io
    from kazen_tpu.scene.compiler import compile_scene

    desc = xml_io.load_xml(args.scene)
    desc.camera.width = w
    desc.camera.height = h
    arrays, static = compile_scene(desc)
    tt = arrays.trace_tables
    nodes_flat = np.asarray(tt.nodes).reshape(-1, 128)
    rec = np.empty((nodes_flat.shape[0] * 2, 64), np.float32)
    rec[0::2] = nodes_flat[:, :64]
    rec[1::2] = nodes_flat[:, 64:]
    leaf_bounds = np.asarray(tt.leaf_bounds)
    C = int((leaf_bounds[:, 0] <= leaf_bounds[:, 3]).sum())

    V = np.asarray(arrays.V)
    F = np.asarray(arrays.F)

    # face -> cluster id map (from the geo blocks' face rows)
    geo = np.asarray(tt.geo_shade)
    face_cluster = np.full(len(F), -1, np.int64)
    for ci in range(geo.shape[0]):
        fids = geo[ci, 24, :]
        fids = fids[fids >= 0].astype(np.int64)
        face_cluster[fids] = ci

    spec = sampler_spec(static)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))
    a, c = krng.advance_constants(0)
    jump = (
        (jnp.uint32(a >> 32), jnp.uint32(a & 0xFFFFFFFF)),
        (jnp.uint32(c >> 32), jnp.uint32(c & 0xFFFFFFFF)),
    )
    stream = streams.init_stream_jump(spec, px, py, jnp.uint32(0), jump)
    stream, jitter = streams.next_pixel_2d(spec, stream)
    ps = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
    stream, ap2 = streams.next_2d(spec, stream)
    rays = camera_mod.sample_ray(arrays, static, ps, ap2)
    o = np.asarray(rays.o)
    d = np.asarray(rays.d)
    n = o.shape[0]

    hit = intersect_bvh(arrays, rays)
    t = np.asarray(hit.t)
    valid = np.asarray(hit.valid)
    face = np.asarray(hit.face)

    rng = np.random.default_rng(0)
    p_hit = o + d * np.where(valid, t, 1.0)[:, None]

    # true geometric normals at hits
    f0 = np.clip(face, 0, len(F) - 1)
    e1 = V[F[f0, 1]] - V[F[f0, 0]]
    e2 = V[F[f0, 2]] - V[F[f0, 0]]
    gn = np.cross(e1, e2)
    gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-12)
    gn = np.where((np.einsum("ij,ij->i", gn, -d) < 0)[:, None], -gn, gn)

    # cosine-hemisphere bounce dirs around gn
    u1 = rng.random(n)
    u2 = rng.random(n)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    lx = r * np.cos(phi)
    ly = r * np.sin(phi)
    lz = np.sqrt(np.maximum(1 - u1, 0))
    a0 = np.where(
        (np.abs(gn[:, 0]) > 0.9)[:, None], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]
    )
    tx = np.cross(a0, gn)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-12)
    tyv = np.cross(gn, tx)
    bd = (lx[:, None] * tx + ly[:, None] * tyv + lz[:, None] * gn).astype(
        np.float32
    )
    bsel = valid
    bo = p_hit[bsel].astype(np.float32)
    bdir = bd[bsel]
    bface = f0[bsel]
    bcl = face_cluster[bface]

    # NEE shadow rays: random point on a random light face
    lf = np.asarray(arrays.light_faces).reshape(-1)
    lf = lf[lf >= 0]
    pickf = lf[rng.integers(0, len(lf), len(bo))]
    s1 = np.sqrt(rng.random(len(bo)))
    s2 = rng.random(len(bo))
    lp = (
        V[F[pickf, 0]] * (1 - s1)[:, None]
        + V[F[pickf, 1]] * (s1 * (1 - s2))[:, None]
        + V[F[pickf, 2]] * (s1 * s2)[:, None]
    )
    sd_vec = lp - bo
    sdist = np.linalg.norm(sd_vec, axis=1)
    sdir = (sd_vec / np.maximum(sdist, 1e-9)[:, None]).astype(np.float32)
    smaxt = (sdist - 1e-3).astype(np.float32)

    # nearest-t hulls for prune realism
    rb = Rays(
        o=jnp.asarray(bo), d=jnp.asarray(bdir),
        mint=jnp.full(len(bo), 1e-3, jnp.float32),
        maxt=jnp.full(len(bo), 3.0e38, jnp.float32),
    )
    hb = intersect_bvh(arrays, rb)
    bt_hull = np.where(np.asarray(hb.valid), np.asarray(hb.t), 3.0e38).astype(
        np.float32
    )

    def spread(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    bmin = V.min(0)
    ext = np.maximum(V.max(0) - bmin, 1e-6)

    def morton(p, bits):
        cell = np.clip(
            (p - bmin) / ext * (1 << bits), 0, (1 << bits) - 1
        ).astype(np.uint64)
        return (
            (spread(cell[:, 0]) << 2)
            | (spread(cell[:, 1]) << 1)
            | spread(cell[:, 2])
        )

    def octant(dd):
        return (
            (dd[:, 0] > 0).astype(np.uint64) * 4
            + (dd[:, 1] > 0).astype(np.uint64) * 2
            + (dd[:, 2] > 0).astype(np.uint64)
        )

    def dmorton(dd, bits=4):
        cell = np.clip(
            (dd * 0.5 + 0.5) * (1 << bits), 0, (1 << bits) - 1
        ).astype(np.uint64)
        return (
            (spread(cell[:, 0]) << 2)
            | (spread(cell[:, 1]) << 1)
            | spread(cell[:, 2])
        )

    def run(name, oo, dd, mt, xt, key, bs):
        order = np.argsort(key, kind="stable")
        oo, dd, mt, xt = oo[order], dd[order], mt[order], xt[order]
        nb = len(oo) // bs
        pick = np.linspace(0, nb - 1, min(args.blocks, nb)).astype(int)
        st, vi, need = [], [], []
        for b in pick:
            s = slice(b * bs, (b + 1) * bs)
            steps, visits = walk_stats(rec, oo[s], dd[s], mt[s], xt[s], xt[s])
            st.append(steps)
            vi.append(len(visits))
            if visits:
                need.append(np.mean([nl / bs for _, nl in visits]))
        print(
            f"  {name:34s} bs={bs:5d}: visits {np.mean(vi):6.1f}  "
            f"steps {np.mean(st):5.0f}  need {np.mean(need):5.2f}  "
            f"visit-lanes/ray {np.mean(vi)/bs*1024:6.1f}/1024",
            flush=True,
        )

    print(f"clusters C={C}, nodes={len(rec)}, bounce rays={len(bo)}")

    # per-ray lower bound
    pick = rng.integers(0, len(bo), args.perray)
    own = [
        len(
            per_ray_clusters(
                rec, bo[i], bdir[i],
                np.float32(1e-3), np.float32(3.0e38), bt_hull[i],
            )
        )
        for i in pick
    ]
    print(f"bounce per-ray own visits: mean {np.mean(own):.1f}")
    owns = [
        len(
            per_ray_clusters(
                rec, bo[i], sdir[i], np.float32(1e-3), smaxt[i], smaxt[i]
            )
        )
        for i in pick
    ]
    print(f"shadow per-ray own visits: mean {np.mean(owns):.1f}")

    mt_b = np.full(len(bo), 1e-3, np.float32)
    xt_b = np.minimum(bt_hull, 3.0e38).astype(np.float32)

    print("bounce rays:")
    key_cur = (
        (octant(bdir) << 27) | (morton(bo, 5) << 12) | dmorton(bdir, 4)
    )
    key_cl = (
        (bcl.astype(np.uint64) << 15) | (octant(bdir) << 12) | dmorton(bdir, 4)
    )
    key_cl_fine = (bcl.astype(np.uint64) << 12) | dmorton(bdir, 4)
    for bs in (256, 1024):
        run("octant|morton(o)|morton(d) [cur]", bo, bdir, mt_b, xt_b, key_cur, bs)
        run("cluster|octant|morton(d)", bo, bdir, mt_b, xt_b, key_cl, bs)
        run("cluster|morton(d)", bo, bdir, mt_b, xt_b, key_cl_fine, bs)

    print("bounce rays, NO sort (static pixel enumeration order):")
    # tile order: pixels enumerated in 16x8 tiles at pass setup (free)
    tx = np.asarray(px)[bsel] // 16
    tyy = np.asarray(py)[bsel] // 8
    tile_key = (tyy.astype(np.uint64) << 20) | tx.astype(np.uint64)
    ident = np.zeros(len(bo), np.uint64)
    for bs in (128, 256):
        run("scanline order", bo, bdir, mt_b, xt_b, ident, bs)
        run("16x8 tile order", bo, bdir, mt_b, xt_b, tile_key, bs)

    print("shadow rays, NO sort (static pixel enumeration order):")
    for bs in (128, 256):
        run("scanline order", bo, sdir, mt_b, smaxt, ident, bs)
        run("16x8 tile order", bo, sdir, mt_b, smaxt, tile_key, bs)

    print("primary rays, NO sort:")
    pident = np.zeros(n, np.uint64)
    ptile = (
        (np.asarray(py).astype(np.uint64) // 8) << 20
    ) | (np.asarray(px).astype(np.uint64) // 16)
    t_hull_p = np.where(valid, t, 3.0e38).astype(np.float32)
    mt_p = np.full(n, 1e-4, np.float32)
    for bs in (128, 256):
        run("scanline order", o, d, mt_p, t_hull_p, pident, bs)
        run("16x8 tile order", o, d, mt_p, t_hull_p, ptile, bs)

    print("SHARED per-bounce order (one sort serves both traces):")
    lid = np.asarray(arrays.mesh_light)[np.asarray(arrays.face_mesh)[pickf]]
    lid = np.maximum(lid, 0).astype(np.uint64)
    shared_keys = {
        "cluster|dmorton(path)": (bcl.astype(np.uint64) << 12)
        | dmorton(bdir, 4),
        "light|cluster|dmorton(path)": (lid << 40)
        | (bcl.astype(np.uint64) << 12)
        | dmorton(bdir, 4),
        "cluster|light|dmorton(sdir)": (bcl.astype(np.uint64) << 26)
        | (lid << 24)
        | dmorton(sdir, 4),
        "cluster|light|dmorton(path)": (bcl.astype(np.uint64) << 26)
        | (lid << 24)
        | dmorton(bdir, 4),
    }
    for name, key in shared_keys.items():
        for bs in (1024,):
            run(f"path  under {name}", bo, bdir, mt_b, xt_b, key, bs)
            run(f"shadow under {name}", bo, sdir, mt_b, smaxt, key, bs)

    print("shadow rays (NEE):")
    key_s_cur = (
        (octant(sdir) << 27) | (morton(bo, 5) << 12) | dmorton(sdir, 4)
    )
    key_s_light = (
        (pickf.astype(np.uint64) // 1000 << 40)
        | (bcl.astype(np.uint64) << 15)
        | dmorton(sdir, 4)
    )
    for bs in (256, 1024):
        run("octant|morton(o)|morton(d) [cur]", bo, sdir, mt_b, smaxt, key_s_cur, bs)
        run("cluster|morton(d)", bo, sdir, mt_b, smaxt, key_cl_fine, bs)
        run("lightgrp|cluster|morton(d)", bo, sdir, mt_b, smaxt, key_s_light, bs)


if __name__ == "__main__":
    main()
