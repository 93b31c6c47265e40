"""Pallas TPU kernel: packet-synchronized stackless BVH traversal.

TPU vector lanes have no per-lane gather, so the classic per-ray divergent
cursor walk (accel/bvh.py) pays an XLA gather per step. This kernel uses
*packet traversal* instead: each Pallas program owns a block of rays and a
SINGLE scalar cursor walking the flattened BVH (same escape-link layout as
accel/bvh.py). Node data is fetched with a scalar dynamic slice from a
VMEM-resident node table (supported, fast); the AABB slab test and the
Möller-Trumbore leaf tests are vectorized over the whole block. The block
descends when ANY of its rays hits the node's box -- for coherent packets
(primary/shadow rays, sorted bounce rays) this skips the same subtrees a
per-ray walk would, with zero gathers.

Node table layout (built by pack_bvh): (M, 16) f32
  [0:3] bounds_min, [3:6] bounds_max, [6] skip, [7] prim_count,
  [8] prim_offset, [9..15] pad.
Leaf triangles: (F, 16) f32: [0:3] p0, [3:6] e1, [6:9] e2, [9] face_id.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import BVHArrays, LEAF_SIZE
from .intersect import Hit, Rays

BLOCK = 1024  # rays per packet (8 sublanes x 128 lanes)
_BIG = 3.4e38


def pack_bvh(bvh: BVHArrays) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack node + leaf-triangle SoA into the kernel's padded tables."""
    m = bvh.bounds_min.shape[0]
    nodes = jnp.zeros((m, 16), jnp.float32)
    nodes = nodes.at[:, 0:3].set(bvh.bounds_min)
    nodes = nodes.at[:, 3:6].set(bvh.bounds_max)
    nodes = nodes.at[:, 6].set(bvh.skip.astype(jnp.float32))
    nodes = nodes.at[:, 7].set(bvh.prim_count.astype(jnp.float32))
    nodes = nodes.at[:, 8].set(bvh.prim_offset.astype(jnp.float32))
    f = bvh.tri_p0.shape[0]
    tris = jnp.zeros((f, 16), jnp.float32)
    tris = tris.at[:, 0:3].set(bvh.tri_p0)
    tris = tris.at[:, 3:6].set(bvh.tri_e1)
    tris = tris.at[:, 6:9].set(bvh.tri_e2)
    tris = tris.at[:, 9].set(bvh.prim_faces.astype(jnp.float32))
    return nodes, tris


def _kernel(
    o_ref, d_ref, mint_ref, maxt_ref, nodes_ref, tris_ref,
    t_ref, face_ref, u_ref, v_ref, hit_ref,
):
    n_nodes = nodes_ref.shape[0]
    ox = o_ref[0, :]
    oy = o_ref[1, :]
    oz = o_ref[2, :]
    dx = d_ref[0, :]
    dy = d_ref[1, :]
    dz = d_ref[2, :]
    mint = mint_ref[0, :]
    maxt = maxt_ref[0, :]

    tiny = 1e-20
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < tiny, tiny, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < tiny, tiny, dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < tiny, tiny, dz)

    def body(state):
        cursor, best_t, best_face, best_u, best_v, found = state
        node = nodes_ref[cursor, :]  # (16,) scalar-indexed fetch

        # AABB slab test vs the whole packet
        tx0 = (node[0] - ox) * inv_dx
        tx1 = (node[3] - ox) * inv_dx
        ty0 = (node[1] - oy) * inv_dy
        ty1 = (node[4] - oy) * inv_dy
        tz0 = (node[2] - oz) * inv_dz
        tz1 = (node[5] - oz) * inv_dz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        cur_maxt = jnp.minimum(maxt, best_t)
        hit_box = (tnear <= tfar) & (tfar >= mint) & (tnear <= cur_maxt)
        any_hit = jnp.any(hit_box)

        prim_count = node[7].astype(jnp.int32)
        prim_offset = node[8].astype(jnp.int32)
        is_leaf = prim_count > 0

        def leaf_tests(args):
            best_t, best_face, best_u, best_v, found = args
            for k in range(LEAF_SIZE):
                tri = tris_ref[prim_offset + k, :]
                p0x, p0y, p0z = tri[0], tri[1], tri[2]
                e1x, e1y, e1z = tri[3], tri[4], tri[5]
                e2x, e2y, e2z = tri[6], tri[7], tri[8]
                fid = tri[9]
                # pvec = d x e2
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok = jnp.abs(det) > 1e-8
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                tvx = ox - p0x
                tvy = oy - p0y
                tvz = oz - p0z
                uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                vv = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = (
                    ok
                    & (k < prim_count)
                    & hit_box
                    & (uu >= 0.0)
                    & (uu <= 1.0)
                    & (vv >= 0.0)
                    & (uu + vv <= 1.0)
                    & (tt >= mint)
                    & (tt <= jnp.minimum(maxt, best_t))
                )
                best_t = jnp.where(ok, tt, best_t)
                best_face = jnp.where(ok, fid, best_face)
                best_u = jnp.where(ok, uu, best_u)
                best_v = jnp.where(ok, vv, best_v)
                found = found | ok
            return best_t, best_face, best_u, best_v, found

        best_t, best_face, best_u, best_v, found = jax.lax.cond(
            any_hit & is_leaf,
            leaf_tests,
            lambda a: a,
            (best_t, best_face, best_u, best_v, found),
        )

        descend = any_hit & ~is_leaf
        nxt = jnp.where(descend, cursor + 1, node[6].astype(jnp.int32))
        return nxt, best_t, best_face, best_u, best_v, found

    def cond(state):
        return state[0] < n_nodes

    init = (
        jnp.int32(0),
        jnp.full((BLOCK,), _BIG, jnp.float32),
        jnp.full((BLOCK,), -1.0, jnp.float32),
        jnp.zeros((BLOCK,), jnp.float32),
        jnp.zeros((BLOCK,), jnp.float32),
        jnp.zeros((BLOCK,), bool),
    )
    _, t, face, u, v, found = jax.lax.while_loop(cond, body, init)
    t_ref[0, :] = t
    face_ref[0, :] = face
    u_ref[0, :] = u
    v_ref[0, :] = v
    hit_ref[0, :] = found.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def traverse_packets(nodes, tris, rays: Rays, interpret: bool = False) -> Hit:
    """Run the packet kernel over all rays (padded to BLOCK)."""
    n = rays.o.shape[0]
    pad = (-n) % BLOCK
    o = jnp.pad(rays.o, ((0, pad), (0, 0))).T  # (3, Np)
    d = jnp.pad(rays.d, ((0, pad), (0, 0)), constant_values=1.0).T
    mint = jnp.pad(rays.mint, (0, pad))[None, :]
    maxt = jnp.pad(rays.maxt, (0, pad))[None, :]

    np_total = n + pad
    grid = np_total // BLOCK

    out_shape = [
        jax.ShapeDtypeStruct((1, np_total), jnp.float32),  # t
        jax.ShapeDtypeStruct((1, np_total), jnp.float32),  # face
        jax.ShapeDtypeStruct((1, np_total), jnp.float32),  # u
        jax.ShapeDtypeStruct((1, np_total), jnp.float32),  # v
        jax.ShapeDtypeStruct((1, np_total), jnp.float32),  # hit
    ]
    lane_spec = lambda rows: pl.BlockSpec(
        (rows, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    t, face, u, v, hit = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            lane_spec(3),
            lane_spec(3),
            lane_spec(1),
            lane_spec(1),
            pl.BlockSpec(nodes.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[lane_spec(1)] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(o, d, mint, maxt, nodes, tris)

    return Hit(
        valid=hit[0, :n] > 0.5,
        t=t[0, :n],
        face=face[0, :n].astype(jnp.int32),
        u=u[0, :n],
        v=v[0, :n],
    )
