"""Pallas packet trace kernels: the TPU Embree-replacement hot path.

Replaces the XLA gather-walk (accel/bvh.py:intersect_bvh) on TPU backends.
The XLA walk runs per-lane cursors through a lockstep ``while_loop`` whose
per-iteration gathers at 2M lanes cost ~ms each and whose trip count is the
*maximum* walk length over all lanes -- measured 0.026M rays/s on a 36k-tri
scene. This kernel instead walks one shared scalar cursor per 1024-lane
block over VMEM-resident packed tables (escape-link layout, same as
accel/bvh.py), with per-lane state reduced to the bare minimum (t, u, v,
slot) so the whole loop state stays in vector registers:

  * geo table:   8 triangle records per 128-float row; a BVH leaf is
    exactly one row (slots padded; padding has e1=e2=0 so Moller-Trumbore
    rejects via det==0). Record: [0:3] p0, [3:6] e1, [6:9] e2, [9] light
    id (-1 none), [10] light primary-visibility.
  * node table:  2 node records per row: [0:3] bmin, [3:6] bmax, [6] skip
    (escape link), [7] prim_count, [8] leaf row index.
  * slot_face:   slot -> global face id (host array; XLA gathers shading
    attributes by face id after the trace, so the kernel never touches
    normals/uvs -- that is what keeps the walk state tiny).

Shading-normal / uv / material attribution, and the differentiable (t,u,v)
recomputation, happen in XLA after the kernel (see path_mis.intersect):
one 2M-lane gather costs ~0.05ms on v5e, measured.

Packet coherence matters: blocks of spatially-coherent rays walk ~5-10x
fewer nodes. li_wavefront orders primary lanes into 32x32 pixel tiles
(one block = one tile) before tracing; measured 27M rays/s coherent vs
3.6M incoherent on the 36k-tri reference scene (single v5e chip).

Reference contract: Accel::rayIntersect (accel.cpp:63-110, Embree
rtcIntersect1) for nearest-hit, Scene::rayOccluded + the invisible-light
step-through (integrator.cpp:259-278) for shadow rays. Deviation (same as
integrate/megakernel.py): occlusion is a single any-hit pass that ignores
primary-invisible light faces instead of iterated re-casts biased past
each skipped light; occluders hidden within trace_bias behind a skipped
light differ.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024
LEAF = 8  # slots per geo row == BVH leaf size
GEO_F = 16
NODE_F = 64  # 2 node records per 128-float row
BIG = 3.0e38
# VMEM budget for geo+node tables (512B per row after Mosaic lane tiling);
# the chip has ~16MB, the kernel needs ~1MB for IO + loop state.
TRACE_VMEM_BUDGET = 13 * 1024 * 1024
_ROW_BYTES = 512


class TraceTables(NamedTuple):
    geo: jnp.ndarray  # (Rg, 128) f32
    nodes: jnp.ndarray  # (Rn, 128) f32
    slot_face: jnp.ndarray  # (Rg * LEAF,) int32, -1 padding


def pack_trace_tables(V, F, light_of_face=None, light_pv=None):
    """Host-side packing (numpy). light_of_face: (Nf,) int32 light id per
    face (-1 none); light_pv: (L,) bool primary visibility per light.
    Returns None when the tables exceed TRACE_VMEM_BUDGET."""
    from .bvh import build_bvh

    V = np.asarray(V, np.float32)
    F = np.asarray(F, np.int32)
    nf = len(F)
    bvh = build_bvh(V, F, leaf_size=LEAF)
    pcnt = np.asarray(bvh.prim_count)
    poff = np.asarray(bvh.prim_offset)
    pfaces = np.asarray(bvh.prim_faces)
    leaf_nodes = np.nonzero(pcnt > 0)[0]
    n_leaves = len(leaf_nodes)

    rows = n_leaves + (-n_leaves) % 8
    if (2 * rows + -(-len(pcnt) // 2)) * _ROW_BYTES > TRACE_VMEM_BUDGET:
        return None

    slot_faces = np.full((n_leaves, LEAF), -1, np.int64)
    for i, nidx in enumerate(leaf_nodes):
        c = int(pcnt[nidx])
        o = int(poff[nidx])
        slot_faces[i, :c] = pfaces[o:o + c]
    flat = slot_faces.reshape(-1)
    valid = flat >= 0
    fidx = flat[valid]

    p0 = V[F[:, 0]]
    geo = np.zeros((rows * LEAF, GEO_F), np.float32)
    geo[:, 9] = -1.0  # padding is "no light"
    gv = np.zeros((valid.sum(), GEO_F), np.float32)
    gv[:, 0:3] = p0[fidx]
    gv[:, 3:6] = V[F[fidx, 1]] - p0[fidx]
    gv[:, 6:9] = V[F[fidx, 2]] - p0[fidx]
    if light_of_face is not None:
        lid = np.asarray(light_of_face, np.int64)[fidx]
        gv[:, 9] = lid.astype(np.float32)
        if light_pv is not None and len(light_pv):
            lpv = np.asarray(light_pv)
            gv[:, 10] = np.where(lid >= 0, lpv[np.maximum(lid, 0)], 0.0)
    else:
        gv[:, 9] = -1.0
    geo[: n_leaves * LEAF][valid] = gv

    mn = len(pcnt)
    leaf_row = np.zeros(mn, np.float32)
    leaf_row[leaf_nodes] = np.arange(n_leaves, dtype=np.float32)
    mpad = (-mn) % 16
    node = np.zeros((mn + mpad, NODE_F), np.float32)
    node[:mn, 0:3] = np.asarray(bvh.bounds_min)
    node[:mn, 3:6] = np.asarray(bvh.bounds_max)
    node[:mn, 6] = np.asarray(bvh.skip).astype(np.float32)
    node[:mn, 7] = pcnt.astype(np.float32)
    node[:mn, 8] = leaf_row
    if mpad:
        # inverted boxes: never hit; their skip exits the walk
        node[mn:, 0:3] = BIG
        node[mn:, 3:6] = -BIG
        node[mn:, 6] = float(mn + mpad)

    sf = np.full(rows * LEAF, -1, np.int32)
    sf[: n_leaves * LEAF] = flat.astype(np.int32)
    return TraceTables(
        geo=jnp.asarray(geo.reshape(rows, 128)),
        nodes=jnp.asarray(node.reshape(-1, 128)),
        slot_face=jnp.asarray(sf),
    )


def _make_kernel(any_hit: bool):
    def kernel(rays_ref, geo_ref, nodes_ref, out_ref):
        o = (rays_ref[0, :], rays_ref[1, :], rays_ref[2, :])
        d = (rays_ref[3, :], rays_ref[4, :], rays_ref[5, :])
        mint = rays_ref[6, :]
        maxt = rays_ref[7, :]
        inv = tuple(
            1.0 / jnp.where(jnp.abs(c) < 1e-20, 1e-20, c) for c in d
        )
        zero = jnp.zeros_like(o[0])
        n_nodes = nodes_ref.shape[0] * 2

        def node_vals(cursor):
            nrow = nodes_ref[jax.lax.shift_right_logical(cursor, 1), :]
            q = jnp.bitwise_and(cursor, 1)

            def nv(i):
                return jnp.where(q == 1, nrow[NODE_F + i], nrow[i])

            return nv

        def slab(nv, tmax):
            tx0 = (nv(0) - o[0]) * inv[0]
            tx1 = (nv(3) - o[0]) * inv[0]
            ty0 = (nv(1) - o[1]) * inv[1]
            ty1 = (nv(4) - o[1]) * inv[1]
            tz0 = (nv(2) - o[2]) * inv[2]
            tz1 = (nv(5) - o[2]) * inv[2]
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            return (tnear <= tfar) & (tfar >= mint) & (tnear <= tmax)

        def mt(grow, k):
            b = k * GEO_F
            p0 = (grow[b], grow[b + 1], grow[b + 2])
            e1 = (grow[b + 3], grow[b + 4], grow[b + 5])
            e2 = (grow[b + 6], grow[b + 7], grow[b + 8])
            pvx = d[1] * e2[2] - d[2] * e2[1]
            pvy = d[2] * e2[0] - d[0] * e2[2]
            pvz = d[0] * e2[1] - d[1] * e2[0]
            det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
            ok = jnp.abs(det) > 1e-8
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tvx = o[0] - p0[0]
            tvy = o[1] - p0[1]
            tvz = o[2] - p0[2]
            uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1[2] - tvz * e1[1]
            qvy = tvz * e1[0] - tvx * e1[2]
            qvz = tvx * e1[1] - tvy * e1[0]
            vv = (d[0] * qvx + d[1] * qvy + d[2] * qvz) * inv_det
            tt = (e2[0] * qvx + e2[1] * qvy + e2[2] * qvz) * inv_det
            ok = (
                ok
                & (uu >= 0.0)
                & (uu <= 1.0)
                & (vv >= 0.0)
                & (uu + vv <= 1.0)
            )
            return tt, uu, vv, ok

        if any_hit:

            def body(state):
                cursor, blocked = state
                nv = node_vals(cursor)
                hit_box = slab(nv, maxt) & (blocked == 0.0)
                any_box = jnp.any(hit_box)
                is_leaf = nv(7) > 0.0

                def leaf_tests(blocked):
                    lr = nv(8).astype(jnp.int32)
                    grow = geo_ref[lr, :]
                    for k in range(LEAF):
                        tt, _, _, ok = mt(grow, k)
                        ok = ok & hit_box & (tt >= mint) & (tt <= maxt)
                        b = k * GEO_F
                        # primary-invisible lights do not block
                        # (integrator.cpp:259-278 step-through)
                        inv_light = (grow[b + 9] >= 0.0) & (
                            grow[b + 10] == 0.0
                        )
                        blocked = jnp.where(
                            ok & jnp.logical_not(inv_light), 1.0, blocked
                        )
                    return blocked

                blocked = jax.lax.cond(
                    any_box & is_leaf, leaf_tests, lambda b: b, blocked
                )
                nxt = jnp.where(
                    any_box & jnp.logical_not(is_leaf),
                    cursor + 1,
                    nv(6).astype(jnp.int32),
                )
                return nxt, blocked

            _, blocked = jax.lax.while_loop(
                lambda s: (s[0] < n_nodes)
                & jnp.logical_not(jnp.all(s[1] > 0.0)),
                body,
                (jnp.int32(0), zero),
            )
            out_ref[0, :] = blocked
        else:

            def body(state):
                cursor, t, u, v, slot = state
                nv = node_vals(cursor)
                hit_box = slab(nv, jnp.minimum(t, maxt))
                any_box = jnp.any(hit_box)
                is_leaf = nv(7) > 0.0

                def leaf_tests(args):
                    t, u, v, slot = args
                    lr = nv(8).astype(jnp.int32)
                    grow = geo_ref[lr, :]
                    for k in range(LEAF):
                        tt, uu, vv, ok = mt(grow, k)
                        ok = (
                            ok
                            & hit_box
                            & (tt >= mint)
                            & (tt <= maxt)
                            & (tt < t)
                        )
                        t = jnp.where(ok, tt, t)
                        u = jnp.where(ok, uu, u)
                        v = jnp.where(ok, vv, v)
                        slot = jnp.where(ok, nv(8) * LEAF + k, slot)
                    return t, u, v, slot

                t, u, v, slot = jax.lax.cond(
                    any_box & is_leaf, leaf_tests, lambda a: a, (t, u, v, slot)
                )
                nxt = jnp.where(
                    any_box & jnp.logical_not(is_leaf),
                    cursor + 1,
                    nv(6).astype(jnp.int32),
                )
                return nxt, t, u, v, slot

            state = (
                jnp.int32(0),
                jnp.full_like(o[0], BIG),
                zero,
                zero,
                zero - 1.0,
            )
            state = jax.lax.while_loop(
                lambda s: s[0] < n_nodes, body, state
            )
            out_ref[0, :] = state[1]
            out_ref[1, :] = state[2]
            out_ref[2, :] = state[3]
            out_ref[3, :] = state[4]

    return kernel


class _ArrayRef:
    """Plain-array Ref shim: runs the kernel function as traced JAX on CPU
    backends (no Pallas interpreter; see megakernel._ShimRef)."""

    def __init__(self, a=None, shape=None):
        self.a = a
        self.rows = {} if a is None else None
        self._shape = shape if shape is not None else a.shape

    @property
    def shape(self):
        return self._shape

    def __getitem__(self, idx):
        return self.a[idx]

    def __setitem__(self, idx, val):
        row, col = idx
        assert col == slice(None)
        self.rows[int(row)] = val

    def stacked(self):
        return jnp.stack([self.rows[i] for i in range(len(self.rows))])


@functools.partial(jax.jit, static_argnames=("any_hit", "mode"))
def _run(tables: TraceTables, rays_packed, any_hit=False, mode="tpu"):
    """rays_packed: (8, N) = [o3, d3, mint, maxt], N a BLOCK multiple.
    Returns (4, N) [t,u,v,slot] or (1, N) [blocked]."""
    kernel = _make_kernel(any_hit)
    n = rays_packed.shape[1]
    out_rows = 1 if any_hit else 4
    if mode == "shim":
        grid = n // BLOCK

        def one_block(rb):
            out = _ArrayRef(shape=(out_rows, BLOCK))
            kernel(
                _ArrayRef(rb), _ArrayRef(tables.geo), _ArrayRef(tables.nodes),
                out,
            )
            return out.stacked()

        rb = rays_packed.reshape(8, grid, BLOCK)
        outs = jax.vmap(one_block, in_axes=1, out_axes=1)(rb)
        return outs.reshape(out_rows, n)
    return pl.pallas_call(
        kernel,
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((8, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                tables.geo.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                tables.nodes.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, n), jnp.float32),
        interpret=(mode == "interpret"),
    )(rays_packed, tables.geo, tables.nodes)


def _mode():
    return "shim" if jax.default_backend() == "cpu" else "tpu"


def _pack_rays(o, d, mint, maxt):
    n = o.shape[0]
    pad = (-n) % BLOCK
    mint = jnp.broadcast_to(mint, (n,))
    maxt = jnp.broadcast_to(maxt, (n,))
    rows = [
        o[:, 0], o[:, 1], o[:, 2],
        d[:, 0], d[:, 1], d[:, 2],
        mint, maxt,
    ]
    if pad:
        # padded lanes: degenerate rays that exit on the root slab test
        rows = [
            jnp.pad(r, (0, pad), constant_values=v)
            for r, v in zip(rows, (BIG, BIG, BIG, 1.0, 1.0, 1.0, 0.0, -1.0))
        ]
    return jnp.stack(rows, 0), n


def trace(tables: TraceTables, o, d, mint, maxt, mode=None):
    """Nearest-hit: returns (t, u, v, slot) per lane; slot < 0 = miss.
    o, d: (N, 3); mint/maxt broadcastable to (N,). Not differentiable
    (callers recompute t/u/v in closed form against the chosen face)."""
    rays_packed, n = _pack_rays(o, d, mint, maxt)
    out = _run(tables, rays_packed, any_hit=False, mode=mode or _mode())
    return out[0, :n], out[1, :n], out[2, :n], out[3, :n].astype(jnp.int32)


def occluded(tables: TraceTables, o, d, mint, maxt, mode=None):
    """Any-hit shadow query ignoring primary-invisible light faces
    (step-through deviation documented in the module docstring)."""
    rays_packed, n = _pack_rays(o, d, mint, maxt)
    out = _run(tables, rays_packed, any_hit=True, mode=mode or _mode())
    return out[0, :n] > 0.0
