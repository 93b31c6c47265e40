"""Fused Pallas trace kernel: two-level cluster BVH with MXU leaf tests.

This is the TPU Embree replacement (Accel::rayIntersect, reference
accel.cpp:63-110) designed round the hardware instead of round a per-ray
walk. Four ideas:

1. **Two-level structure.** Triangles are grouped into SAH-built clusters
   of up to 128 (one BVH leaf = one cluster). A 1024-lane ray block walks
   the *tiny* cluster tree with one shared scalar cursor (escape links,
   no stacks); each visited leaf is tested densely: all 1024 rays x all
   128 cluster triangles at once. The serialized part of the walk shrinks
   from O(tree) to O(clusters) while the dense part vectorizes perfectly.

2. **Moller-Trumbore as a matmul.** For a ray (o, d) and triangle
   (p0, e1, e2), every MT quantity is *linear* in the 10-vector ray
   feature f = [1, o, d, m=o x d] by the triple-product identities
     det   = d . (e2 x e1)
     t*det = (o - p0) . n            (n = e1 x e2)
     u*det = e2 . m + (p0 x e2) . d
     v*det = -e1 . m + (e1 x p0) . d
   so ONE (48, 512) x (48, 1024) matmul per visit evaluates all four
   quantities for the whole (rays x triangles) block on the MXU: the four
   quantities share the same feature vector, so they live in four
   128-column blocks of a single weight matrix. The per-triangle
   coefficient rows are precomputed on the host into the cluster block.

3. **Split-bf16 3-pass precision.** The MXU's native input type is bf16;
   full-f32 (HIGHEST) emulation costs 6 passes and was measured to
   dominate the per-visit cost (benchmarks/visit_lab.py: 4.9us -> 1.8us
   per visit at DEFAULT). The weights are stored split hi/lo
   (W = W_hi + W_lo, each bf16) and the features likewise, with the three
   significant products W_hi*f_hi + W_hi*f_lo + W_lo*f_hi folded into the
   one matmul's contraction dim (48 = 3x16). Relative error ~2^-18 of the
   term magnitudes -- f32-dot class -- and the winning face's (t, u, v)
   are re-derived in exact f32 afterwards either way.

4. **In-kernel winner attributes.** The per-lane nearest hit's full
   shading row (3 vertices, 3 vertex normals, 3 uvs, face/light/material
   meta) is fetched inside the kernel with a one-hot matmul against the
   cluster's f32 attribute rows -- since round 5 ONCE PER IMPROVING
   CLUSTER AT WALK END (_fetch_winners; the drain carries only t/cid/k)
   -- so the post-trace XLA shading prep needs *no gathers at all*. The
   winner's *cluster id* is also returned (out row 33): it is the next
   bounce's packet-coherence sort key (integrate/path_mis.py), replacing
   per-trace Morton key construction.

5. **Per-octant ordered walk** (round 5): 8 near-child-first preorder
   linearizations of the collapsed cluster tree, picked per block by
   majority ray octant, tighten tbest early; with the octant-major
   wavefront sort key, pruned visits dropped 58.4 -> 41.3 per block on
   hero bounce rays (p50 19.5 = the measured perfect-prune bound; the
   p90 tail genuinely needs ~86 distinct winner clusters).

Cluster blocks live in **HBM** and are DMA'd per visited leaf with double
buffering (walk phase collects visited leaves into an SMEM list, drain
phase overlaps copy i+1 with test i). VMEM only holds the node table and
the double buffers, so scene size is bounded by HBM, not VMEM -- the
reference's Embree serves any size at full speed (accel.cpp:25-61) and so
does this: no table-size budget, no fallback cliff.

Occlusion (`occluded`) is the any-hit variant; it uses a dedicated weight
table in which primary-invisible light faces are zeroed at pack time, so
they can never block -- a single-pass analog of the reference's iterative
re-cast past invisible lights (integrator.cpp:259-278): occluders hidden
within trace_bias behind a skipped light differ (epsilon-level deviation,
same as integrate/megakernel.py). It needs no shade DMA and no winner
fetch at all.

On CPU backends `mode="shim"` runs a brute-force pure-JAX reference with
identical semantics (chunked over clusters) so sharding tests exercise the
same wavefront structure without hardware.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

BLOCK = int(_os.environ.get("KAZEN_TRACE_BLOCK", "1024"))  # rays per packet walk
K = int(_os.environ.get("KAZEN_TRACE_K", "128"))  # triangles per cluster (BVH leaf size)
# Nodes slab-tested per vector batch in the windowed walk. Must stay <= 32:
# the per-window any-lane-hit bits pack into ONE int32 bitmask (bit 31 is
# fine -- logical shifts -- but bit 32+ silently vanishes and drops whole
# subtrees; a WINDOW=64 experiment "won" by skipping geometry).
WINDOW = min(int(_os.environ.get("KAZEN_TRACE_WINDOW", "32")), 32)
W_ROWS = 48  # weight rows per cluster: [W_hi; W_hi; W_lo] of (16, 512)
W_COLS = 4 * K  # four quantity column blocks [det | t | u | v]
SH_ROWS = 32  # f32 shade rows per cluster (see layout below)
NODE_F = 64  # 2 node records per 128-float row
BIG = 3.0e38
# Drained leaf-list capacity per walk round (SMEM). With the round-5
# octant-ordered walk the visit count is insensitive to MAXV
# (2/8/16/24 -> 39.9/39.9/41.3/42.6 visits/block on hero bounce rays,
# benchmarks/kernel_ablate.py); 16 remains fastest overall. Env override
# is read at import time (subprocess sweeps).
MAXV = int(_os.environ.get("KAZEN_TRACE_MAXV", "16"))
_DET_EPS = 1e-8

# geo_shade row layout -------------------------------------------------------
# rows 0:24  shade24 [p0 p1 p2 n0 n1 n2 uv0 uv1 uv2][tri]
_S_FACE = 24  # face id (f32; exact below 2^24 faces)
_S_LIGHT = 25  # light id (-1 none)
_S_LPV = 26  # light primary visibility (0/1)
_S_MAT = 27  # material id
_S_HASN = 28  # mesh has vertex normals (0/1)
_S_HASUV = 29  # mesh has uvs (0/1)

# fused-output row layout ---------------------------------------------------
OUT_ROWS = 40
# 0 t, 1 u, 2 v, 3 face, 4:28 shade24, 28 light, 29 lpv, 30 mat,
# 31 has_n, 32 has_uv, 33 winner cluster id,
# 34 block visit count, 35 block walk steps (free diagnostics; rest pad)

_HIGH = jax.lax.Precision.HIGHEST


class ClusterTables(NamedTuple):
    nodes: jnp.ndarray  # (Rn, 128) f32, VMEM-resident in-kernel
    # nearest-hit MT weights, (C, 48, 512) bf16, HBM; DMA'd per leaf visit
    geo_w: jnp.ndarray
    # occlusion MT weights: same, with non-blocking (primary-invisible
    # light) triangle columns zeroed -- they can never block
    geo_w_occl: jnp.ndarray
    # winner shading attributes, (C, 32, 128) f32, HBM
    geo_shade: jnp.ndarray
    # cluster AABBs in cluster order, (Cpad, 6) f32 [min3 max3]; padding
    # rows carry an empty (inverted) box. Metadata: the real cluster count
    # is (min.x <= max.x).sum().
    leaf_bounds: jnp.ndarray
    # compact per-node scalar records (NO, Nn, 16) f32
    # [bmin3, bmax3, skip, prim_count, leaf_row, 0...]: the SMEM-walk
    # kernel DMAs this once and reads node fields as *scalars* -- SMEM
    # scalar reads are single-cycle, where extracting node fields from a
    # VMEM vector row costs a vector->scalar transfer per field (the
    # dominant per-step cost of the VMEM walk kernel).
    #
    # NO = 8 per-direction-octant linearizations of the *collapsed*
    # cluster tree (round 5): each is a preorder DFS in which the child
    # nearer along that octant's direction signs is emitted first, so a
    # ray block walking "its" table sees clusters approximately
    # front-to-back and tbest prunes early (DFS build order pruned almost
    # nothing: 58.4 pruned vs 76.3 unpruned visits/block on hero bounce
    # rays, benchmarks/kernel_ablate.py). The kernel picks the table by
    # majority octant of the block's live rays. NO = 1 (build order only)
    # when 8 tables would exceed the SMEM budget.
    node_scalars: jnp.ndarray
    # the same records packed 8 nodes per 128-float row ((NO*Nn)/8, 128):
    # SMEM scratch pads the minor dimension to 128 lanes on this jaxlib,
    # so the walk's SMEM copy uses the dense packing (field i of node n =
    # row n>>3, col ((n&7)<<4)+i) while the windowed vector slab test
    # reads the (NO*Nn, 16) layout from VMEM.
    node_packed: jnp.ndarray


def _split_bf16(w: np.ndarray):
    """f32 -> (hi, lo) bf16 split with hi + lo ~= w to ~2^-16 relative."""
    hi = w.astype(np.dtype("bfloat16"))
    lo = (w - hi.astype(np.float32)).astype(np.dtype("bfloat16"))
    return hi, lo


def _pack_w3(wdet, wt, wu, wv):
    """Four (16, K) f32 quantity blocks -> (48, 4K) bf16 [hi; hi; lo]."""
    w = np.concatenate([wdet, wt, wu, wv], axis=1)  # (16, 4K)
    hi, lo = _split_bf16(w)
    return np.concatenate([hi, hi, lo], axis=0)  # (48, 4K)


def pack_cluster_tables(
    V,
    F,
    face_shade,  # (Nf, 24) f32 [p0 p1 p2 n0 n1 n2 uv0 uv1 uv2]
    face_light,  # (Nf,) int light id per face, -1 none
    face_lpv,  # (Nf,) 0/1 light primary visibility per face
    face_material,  # (Nf,) int material id per face
    face_has_n,  # (Nf,) 0/1
    face_has_uv,  # (Nf,) 0/1
):
    """Host-side (numpy) packing of the two-level tables. Never declines:
    cluster blocks live in HBM (no VMEM budget); only the node table is
    VMEM-resident and stays tiny (2 nodes/row over ceil(Nf/K) leaves)."""
    from .bvh import build_bvh

    V = np.asarray(V, np.float32)
    F = np.asarray(F, np.int32)
    if len(F) >= (1 << 24):
        raise ValueError("face ids beyond f32-exact range")
    bvh = build_bvh(V, F, leaf_size=K)
    pcnt = np.asarray(bvh.prim_count)
    poff = np.asarray(bvh.prim_offset)
    pfaces = np.asarray(bvh.prim_faces)
    nskip = np.asarray(bvh.skip)
    mn_all = len(pcnt)

    # ---- collapse subtrees into K-packed clusters ------------------------
    # SAH leaves average ~0.7*K triangles; every visit pays the full
    # (K, BLOCK) MXU/VPU test regardless of fill, so sparse clusters waste
    # test throughput and DMAs. Greedy DFS: the shallowest subtree holding
    # <= K faces becomes ONE cluster (its root turned into a leaf; the
    # escape-link walk then never descends inside, no restructuring
    # needed). Mean fill goes ~0.7K -> ~0.9K and cluster count drops ~30%.
    pref = np.concatenate([[0], np.cumsum(pcnt)])

    def faces_in(i):
        j = int(nskip[i])
        segs = [
            pfaces[poff[l] : poff[l] + pcnt[l]]
            for l in range(i, j)
            if pcnt[l] > 0
        ]
        return np.concatenate(segs) if segs else np.zeros(0, np.int32)

    cluster_root = []
    i = 0
    while i < mn_all:
        j = int(nskip[i])
        nprims = int(pref[j] - pref[i])  # prims in subtree [i, skip_i)
        if 0 < nprims <= K:
            cluster_root.append(i)
            i = j
        else:
            i += 1
    leaf_nodes = np.asarray(cluster_root, np.int64)
    C = len(leaf_nodes)

    # ---- cluster geometry blocks -----------------------------------------
    geo_w = np.zeros((C, W_ROWS, W_COLS), np.dtype("bfloat16"))
    geo_w_occl = np.zeros((C, W_ROWS, W_COLS), np.dtype("bfloat16"))
    geo_shade = np.zeros((C, SH_ROWS, K), np.float32)
    geo_shade[:, _S_FACE, :] = -1.0
    geo_shade[:, _S_LIGHT, :] = -1.0
    fs = np.asarray(face_shade, np.float32)
    fl = np.asarray(face_light, np.float32)
    fpv = np.asarray(face_lpv, np.float32)
    fm = np.asarray(face_material, np.float32)
    fhn = np.asarray(face_has_n, np.float32)
    fhuv = np.asarray(face_has_uv, np.float32)
    cluster_sizes = np.zeros(C, np.int64)
    for ci, nidx in enumerate(leaf_nodes):
        fidx = faces_in(int(nidx))
        c = len(fidx)
        cluster_sizes[ci] = c
        p0 = V[F[fidx, 0]]
        e1 = V[F[fidx, 1]] - p0
        e2 = V[F[fidx, 2]] - p0
        n = np.cross(e1, e2)
        wdet = np.zeros((16, K), np.float32)
        wt = np.zeros((16, K), np.float32)
        wu = np.zeros((16, K), np.float32)
        wv = np.zeros((16, K), np.float32)
        # Wdet: det = d . (e2 x e1) = -d . n
        wdet[4:7, :c] = -n.T
        # Wt: t*det = (o - p0) . n
        wt[0, :c] = -np.einsum("ij,ij->i", p0, n)
        wt[1:4, :c] = n.T
        # Wu: u*det = e2 . m + (p0 x e2) . d
        wu[4:7, :c] = np.cross(p0, e2).T
        wu[7:10, :c] = e2.T
        # Wv: v*det = -e1 . m + (e1 x p0) . d
        wv[4:7, :c] = np.cross(e1, p0).T
        wv[7:10, :c] = -e1.T
        geo_w[ci] = _pack_w3(wdet, wt, wu, wv)
        # occlusion weights: zero columns for faces that cannot block
        # (primary-invisible lights, integrator.cpp:259-278 step-through)
        blockm = np.ones(K, np.float32)
        blockm[:c] = np.where((fl[fidx] >= 0.0) & (fpv[fidx] == 0.0), 0.0, 1.0)
        geo_w_occl[ci] = _pack_w3(
            wdet * blockm, wt * blockm, wu * blockm, wv * blockm
        )
        geo_shade[ci, 0:24, :c] = fs[fidx].T
        geo_shade[ci, _S_FACE, :c] = fidx.astype(np.float32)
        geo_shade[ci, _S_LIGHT, :c] = fl[fidx]
        geo_shade[ci, _S_LPV, :c] = fpv[fidx]
        geo_shade[ci, _S_MAT, :c] = fm[fidx]
        geo_shade[ci, _S_HASN, :c] = fhn[fidx]
        geo_shade[ci, _S_HASUV, :c] = fhuv[fidx]

    # ---- compact collapsed tree ------------------------------------------
    # Only internal nodes above cluster roots plus the cluster roots
    # themselves are reachable by the escape walk; rebuild that tree
    # explicitly (M = 2C-1 nodes) so the walk tables carry no dead
    # interior rows. Children in the original skip-linked layout: for a
    # live internal node i, left = i+1 and right = skip[left].
    is_croot = np.zeros(mn_all, bool)
    is_croot[leaf_nodes] = True
    bmin_all = np.asarray(bvh.bounds_min)
    bmax_all = np.asarray(bvh.bounds_max)
    croot_cluster = np.full(mn_all, -1, np.int64)
    croot_cluster[leaf_nodes] = np.arange(C)

    # compact preorder (original build order), children, subtree sizes
    cid_of = np.full(mn_all, -1, np.int64)
    corig, cleft, cright = [], [], []
    stack = [0]
    while stack:
        i = stack.pop()
        cid_of[i] = len(corig)
        corig.append(i)
        cleft.append(-1)
        cright.append(-1)
        if not is_croot[i]:
            a = i + 1
            b = int(nskip[a])
            me = cid_of[i]
            stack.append(b)
            stack.append(a)
            cleft[me] = a  # original ids; remapped below
            cright[me] = b
    M = len(corig)
    corig = np.asarray(corig)
    cleft = np.asarray(cleft)
    cright = np.asarray(cright)
    csize = np.ones(M, np.int64)
    for m in range(M - 1, -1, -1):  # children appear after parents in preorder
        if cleft[m] >= 0:
            csize[m] += csize[cid_of[cleft[m]]] + csize[cid_of[cright[m]]]
    ccenter = (bmin_all[corig] + bmax_all[corig]) * 0.5

    npad = (-M) % WINDOW if M >= WINDOW else WINDOW - M
    Nn = M + npad
    n_orders = 8 if 8 * Nn <= SMEM_MAX_NODES else 1
    nsc = np.zeros((n_orders, Nn, 16), np.float32)
    order0 = None
    for o in range(n_orders):
        sgn = (1.0 if o & 4 else -1.0, 1.0 if o & 2 else -1.0,
               1.0 if o & 1 else -1.0)
        # preorder DFS, near child first for this octant: the split axis is
        # the axis of largest child-center separation; along it, a
        # positive-direction ray reaches the smaller-center child first
        emit = np.empty(M, np.int64)  # emitted order -> compact id
        pos = 0
        stack = [0]
        while stack:
            m = stack.pop()
            emit[pos] = m
            pos += 1
            if cleft[m] >= 0:
                a = cid_of[cleft[m]]
                b = cid_of[cright[m]]
                sep = ccenter[a] - ccenter[b]
                ax = int(np.argmax(np.abs(sep)))
                near_is_a = (sep[ax] * sgn[ax]) < 0.0
                first, second = (a, b) if near_is_a else (b, a)
                stack.append(second)
                stack.append(first)
        npos = np.empty(M, np.int64)  # compact id -> emitted position
        npos[emit] = np.arange(M)
        eo = corig[emit]
        nsc[o, :M, 0:3] = bmin_all[eo]
        nsc[o, :M, 3:6] = bmax_all[eo]
        nsc[o, :M, 6] = (np.arange(M) + csize[emit]).astype(np.float32)
        nsc[o, :M, 7] = np.where(
            is_croot[eo], cluster_sizes[croot_cluster[eo]], 0
        ).astype(np.float32)
        nsc[o, :M, 8] = np.maximum(croot_cluster[eo], 0).astype(np.float32)
        if npad:
            nsc[o, M:, 0:3] = BIG
            nsc[o, M:, 3:6] = -BIG
            nsc[o, M:, 6] = float(Nn)
        if o == 0:
            order0 = eo
    assert n_orders == 1 or np.all(
        nsc[0, :M, 6] >= np.arange(M) + 1
    ), "skip links must advance"

    # VMEM-fallback node table (2 packed records per 128-f32 row), octant-0
    # compact ordering
    mpad2 = (-M) % 2
    node = np.zeros((M + mpad2, NODE_F), np.float32)
    node[:M, :16] = nsc[0, :M]
    if mpad2:
        node[M:, 0:3] = BIG
        node[M:, 3:6] = -BIG
        node[M:, 6] = float(M + mpad2)
    del order0

    cpad = (-C) % 128
    leaf_bounds = np.full((C + cpad, 6), BIG, np.float32)
    leaf_bounds[:, 3:6] = -BIG
    leaf_bounds[:C, 0:3] = bmin_all[leaf_nodes]
    leaf_bounds[:C, 3:6] = bmax_all[leaf_nodes]

    nsc_flat = nsc.reshape(-1, 16)
    rpad = (-nsc_flat.shape[0]) % 8
    if rpad:
        nsc_flat = np.concatenate(
            [nsc_flat, np.zeros((rpad, 16), np.float32)], 0
        )
    node_packed = nsc_flat.reshape(-1, 128)
    return ClusterTables(
        nodes=jnp.asarray(node.reshape(-1, 128)),
        geo_w=jnp.asarray(geo_w),
        geo_w_occl=jnp.asarray(geo_w_occl),
        geo_shade=jnp.asarray(geo_shade),
        leaf_bounds=jnp.asarray(leaf_bounds),
        node_scalars=jnp.asarray(nsc),
        node_packed=jnp.asarray(node_packed),
    )


# ---- shared in-kernel pieces ------------------------------------------------


def _ray_features(rays_ref):
    """Unpack a (8, BLOCK) ray block and build the 16-row MT feature
    matrix [1, o, d, m = o x d] (see module docstring idea 2)."""
    o = (rays_ref[0, :], rays_ref[1, :], rays_ref[2, :])
    d = (rays_ref[3, :], rays_ref[4, :], rays_ref[5, :])
    mint = rays_ref[6, :]
    maxt = rays_ref[7, :]
    m = (
        o[1] * d[2] - o[2] * d[1],
        o[2] * d[0] - o[0] * d[2],
        o[0] * d[1] - o[1] * d[0],
    )
    zero = jnp.zeros_like(o[0])
    feat = jnp.stack(
        [jnp.ones_like(zero), o[0], o[1], o[2], d[0], d[1], d[2],
         m[0], m[1], m[2], zero, zero, zero, zero, zero, zero],
        axis=0,
    )  # (16, BLOCK)
    return o, d, mint, maxt, feat, zero


def _write_feat3(feat, f3_ref):
    """Split the f32 feature matrix hi/lo and lay out the 3-pass stack
    [f_hi; f_lo; f_hi] (pairs with the [W_hi; W_hi; W_lo] weight rows)."""
    f_hi = feat.astype(jnp.bfloat16)
    f_lo = (feat - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    f3_ref[0:16, :] = f_hi
    f3_ref[16:32, :] = f_lo
    f3_ref[32:48, :] = f_hi


def _mt_dot(wblk, f3):
    """The fused four-quantity MT matmul: (48, 512) x (48, BLOCK) bf16."""
    return jax.lax.dot_general(
        wblk,
        f3,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (4K, BLOCK)


def _mt_signed(wblk, f3, mint, maxt):
    """(ok, st, sd) over (K, BLOCK): sign-folded MT tests on the MXU.

    One (48, 512) x (48, BLOCK) bf16 matmul yields all four quantities
    (3-pass split precision, module docstring idea 3); the VPU runs the
    sign-folded acceptance chain: hit iff sd > eps and
    min(su, sv, sd-su-sv, st-mint*sd, maxt*sd-st) >= 0."""
    prod = _mt_dot(wblk, f3)
    det = prod[0 * K : 1 * K]
    tn = prod[1 * K : 2 * K]
    un = prod[2 * K : 3 * K]
    vn = prod[3 * K : 4 * K]
    s = jnp.where(det < 0.0, -1.0, 1.0)
    sd = det * s
    su = un * s
    sv = vn * s
    st = tn * s
    q = jnp.minimum(
        jnp.minimum(su, sv),
        jnp.minimum(
            sd - su - sv,
            jnp.minimum(st - mint[None, :] * sd, maxt[None, :] * sd - st),
        ),
    )
    ok = (sd > _DET_EPS) & (q >= 0.0)
    return ok, st, sd


WIN_CAP = 512  # SMEM improving-cluster list capacity per block


def _nearest_leaf(wblk, f3, cid, mint, maxt, aux_ref, wlist_ref, wcnt_ref):
    """Test one cluster block against the ray block; keep per-lane best t
    (aux row 0), winner cluster id (aux row 1) and winner triangle index
    within its cluster (aux row 2).

    Round 5: the winner's 32 attribute rows are NOT fetched here -- the
    drain loop carries only (t, cid, k) and appends improving cluster ids
    to an SMEM list; the fetch (shade DMA + one-hot matmul) happens ONCE
    per improving cluster at walk end (_fetch_winners). That removes the
    per-visit shade DMA and the redundant fetches for clusters later
    beaten by a nearer one."""
    import os

    ablate = os.environ.get("KAZEN_TRACE_ABLATE")
    tbest = aux_ref[0, :]
    if ablate == "notest":
        # attribution: DMA + loop only; no prune evolution
        aux_ref[1, :] = jnp.minimum(
            aux_ref[1, :], jnp.max(wblk[0:1, :].astype(jnp.float32))
        )
        return
    if ablate == "nochain":
        # attribution: DMA + dot + a cheap consume; no prune evolution
        prod = _mt_dot(wblk, f3)
        aux_ref[1, :] = jnp.minimum(aux_ref[1, :], prod[0])
        return
    ok, st, sd = _mt_signed(wblk, f3, mint, maxt)
    tt = jnp.where(ok, st * pl.reciprocal(sd, approx=True), BIG)
    leaf_min = jnp.min(tt, axis=0)
    improved = (leaf_min < tbest) & (leaf_min < BIG)

    if ablate == "nofetch":
        # attribution experiments only (benchmarks/): skip the winner
        # tracking, keep the prune state. Compile-time captured; use a
        # fresh process per setting.
        aux_ref[0, :] = jnp.where(improved, leaf_min, tbest)
        return

    @pl.when(jnp.any(improved))
    def _():
        kwin = jnp.argmin(tt, axis=0).astype(jnp.float32)
        aux_ref[0, :] = jnp.where(improved, leaf_min, tbest)
        aux_ref[1, :] = jnp.where(
            improved, cid.astype(jnp.float32), aux_ref[1, :]
        )
        aux_ref[2, :] = jnp.where(improved, kwin, aux_ref[2, :])
        wc = wcnt_ref[0]
        wlist_ref[jnp.minimum(wc, WIN_CAP - 1)] = cid
        wcnt_ref[0] = wc + 1


def _fetch_winners(
    geo_sh_ref, sbuf_ref, sem_ref, wlist_ref, wcnt_ref, iota_k, aux_ref,
    shade_ref,
):
    """Walk-end winner-attribute fetch: one shade DMA + one-hot matmul per
    improving cluster (SMEM list, no syncs), then a sync-per-iteration
    cleanup loop that is a no-op unless the list overflowed WIN_CAP.
    aux rows: 1 = winner cluster id (-1 miss), 2 = winner k, 3 = fetched
    flag (pre-set for miss lanes)."""
    aux_ref[3, :] = jnp.where(aux_ref[1, :] < 0.0, 1.0, 0.0)
    cnt = jnp.minimum(wcnt_ref[0], WIN_CAP)
    kb = aux_ref[2, :].astype(jnp.int32)

    NSL = 4  # shade prefetch depth (end fetch is DMA-latency-bound)

    def get_dma(i, slot):
        return pltpu.make_async_copy(
            geo_sh_ref.at[wlist_ref[i]],
            sbuf_ref.at[pl.ds(slot * SH_ROWS, SH_ROWS), :],
            sem_ref.at[MAXV + slot],
        )

    def prime(i, z):
        get_dma(i, i).start()
        return z

    jax.lax.fori_loop(0, jnp.minimum(cnt, NSL), prime, jnp.int32(0))

    def body(i, z):
        slot = jax.lax.rem(i, NSL)
        get_dma(i, slot).wait()
        cid_f = wlist_ref[i].astype(jnp.float32)
        sel = (aux_ref[1, :] == cid_f) & (aux_ref[3, :] == 0.0)
        sblk = sbuf_ref[pl.ds(slot * SH_ROWS, SH_ROWS), :]
        onehot = jnp.where(
            (iota_k == kb[None, :]) & sel[None, :], 1.0, 0.0
        )
        fetched = jax.lax.dot_general(
            sblk,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HIGH,
        )  # (32, BLOCK)
        shade_ref[:, :] = jnp.where(sel[None, :], fetched, shade_ref[:, :])
        aux_ref[3, :] = jnp.where(sel, 1.0, aux_ref[3, :])

        # refill this slot only after its buffer was consumed (an
        # issue-before-wait variant silently clobbered the slot)
        @pl.when(i + NSL < cnt)
        def _():
            get_dma(i + NSL, slot).start()

        return z

    jax.lax.fori_loop(0, cnt, body, jnp.int32(0))

    # overflow cleanup (list wrapped): fetch remaining lanes one distinct
    # winner cluster at a time. Skipped entirely in the common case.
    @pl.when(wcnt_ref[0] > WIN_CAP)
    def _():
        def cond(rem):
            return rem > 0

        def cbody(rem):
            unf = aux_ref[3, :] == 0.0
            target = jnp.max(jnp.where(unf, aux_ref[1, :], -1.0))
            cid_i = target.astype(jnp.int32)
            dma = pltpu.make_async_copy(
                geo_sh_ref.at[cid_i],
                sbuf_ref.at[pl.ds(0, SH_ROWS), :],
                sem_ref.at[MAXV],
            )
            dma.start()
            dma.wait()
            sel = unf & (aux_ref[1, :] == target)
            onehot = jnp.where(
                (iota_k == kb[None, :]) & sel[None, :], 1.0, 0.0
            )
            fetched = jax.lax.dot_general(
                sbuf_ref[pl.ds(0, SH_ROWS), :],
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_HIGH,
            )
            shade_ref[:, :] = jnp.where(
                sel[None, :], fetched, shade_ref[:, :]
            )
            aux_ref[3, :] = jnp.where(sel, 1.0, aux_ref[3, :])
            return jnp.sum(
                jnp.where(aux_ref[3, :] == 0.0, 1, 0), dtype=jnp.int32
            )

        rem0 = jnp.sum(
            jnp.where(aux_ref[3, :] == 0.0, 1, 0), dtype=jnp.int32
        )
        jax.lax.while_loop(cond, cbody, rem0)


def _write_nearest_out(out_ref, shade, cluster_row, o, d, zero):
    """Exact (t, u, v) recompute for the winning face (the in-loop tests
    ran split-bf16; the winner is re-derived at full f32 like
    mesh.cpp:55-92), then the fused 40-row output write."""
    p0 = (shade[0], shade[1], shade[2])
    e1 = (shade[3] - p0[0], shade[4] - p0[1], shade[5] - p0[2])
    e2 = (shade[6] - p0[0], shade[7] - p0[1], shade[8] - p0[2])
    pvx = d[1] * e2[2] - d[2] * e2[1]
    pvy = d[2] * e2[0] - d[0] * e2[2]
    pvz = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
    okd = jnp.abs(det) > _DET_EPS
    inv_det = 1.0 / jnp.where(okd, det, 1.0)
    tvx = o[0] - p0[0]
    tvy = o[1] - p0[1]
    tvz = o[2] - p0[2]
    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1[2] - tvz * e1[1]
    qvy = tvz * e1[0] - tvx * e1[2]
    qvz = tvx * e1[1] - tvy * e1[0]
    vv = (d[0] * qvx + d[1] * qvy + d[2] * qvz) * inv_det
    tt = (e2[0] * qvx + e2[1] * qvy + e2[2] * qvz) * inv_det
    face = shade[_S_FACE]
    valid = face >= 0.0
    out_ref[0, :] = jnp.where(valid, tt, BIG)
    out_ref[1, :] = jnp.where(valid, uu, 0.0)
    out_ref[2, :] = jnp.where(valid, vv, 0.0)
    out_ref[3, :] = face
    # rows 4:28 shade24; 28:33 meta (light, lpv, mat, has_n, has_uv)
    for r in range(24):
        out_ref[4 + r, :] = shade[r]
    out_ref[28, :] = shade[_S_LIGHT]
    out_ref[29, :] = shade[_S_LPV]
    out_ref[30, :] = shade[_S_MAT]
    out_ref[31, :] = shade[_S_HASN]
    out_ref[32, :] = shade[_S_HASUV]
    out_ref[33, :] = jnp.where(valid, cluster_row, 0.0)
    for r in range(34, OUT_ROWS):
        out_ref[r, :] = zero


# Rows set to 1.0 in the miss sentinel: p1.x, p2.y and the three vertex
# normal z components -- a benign unit triangle with +z normals, so the
# post-trace shade prep (frames, normalize, MT recompute) stays finite on
# missed lanes. Reverse-mode AD turns NaNs in masked-off where-branches
# into NaN cotangents (round-3 lesson), so degenerate all-zero geometry on
# miss lanes is not an option.
_MISS_ONE_ROWS = (3, 7, 11, 14, 17)


def _init_shade(shade_ref):
    """Miss sentinel rows (face/light = -1, benign unit triangle)."""
    row_ids = jax.lax.broadcasted_iota(
        jnp.int32, (SH_ROWS, shade_ref.shape[1]), 0
    )
    neg = (row_ids == _S_FACE) | (row_ids == _S_LIGHT)
    one = jnp.zeros_like(row_ids, jnp.bool_)
    for r in _MISS_ONE_ROWS:
        one = one | (row_ids == r)
    shade_ref[:, :] = jnp.where(neg, -1.0, jnp.where(one, 1.0, 0.0))


def _make_kernel(any_hit: bool, smem_nodes: bool = False,
                 nn_stride: int = 0, n_orders: int = 1):
    # Mosaic (jax 0.9) constraint, found by bisection: vector values carried
    # through lax.while_loop/fori_loop abort the compiler when the loop body
    # mixes 2D (sublane x lane) math -- 2D carries crash outright and 1D
    # carries crash once the body broadcasts them against 2D. All per-lane
    # loop state therefore lives in VMEM scratch refs (tbest/blocked in
    # aux_ref, the winner's 32 shade rows in shade_ref) and every loop
    # carries scalars only.
    #
    # With ``smem_nodes`` the node table is the compact (Nn, 16) scalar
    # array, DMA'd HBM->SMEM once (grid step 0; scratch persists across
    # the sequential grid). Node fields are then single-cycle SMEM scalar
    # reads and the slab test is scalar-vs-(1024,)-vector math, vs the
    # VMEM variant's per-field vector->scalar extracts (~10 per node step,
    # the dominant walk cost).
    def kernel(rays_ref, nodes_ref, *rest):
        if smem_nodes:
            rest_nodes, rest = rest[:1], rest[1:]
        if any_hit:
            geo_w_ref = rest[0]
            out_ref, wbuf_ref, f3_ref, sem_ref, list_ref = rest[1:6]
            tail_refs = rest[6:]
            sblk_ref = None
        else:
            geo_w_ref, geo_sh_ref = rest[0:2]
            (out_ref, wbuf_ref, sbuf_ref, f3_ref, sem_ref,
             list_ref) = rest[2:8]
            tail_refs = rest[8:]
        if smem_nodes:
            nflat_ref = rest_nodes[0]
            ns_smem, ns_vmem = tail_refs[0:2]
            tail_refs = tail_refs[2:]

            @pl.when(pl.program_id(0) == 0)
            def _():
                # packed records -> SMEM (scalar consume reads); flat
                # records -> VMEM (the windowed walk slab-tests WINDOW
                # consecutive node rows as one vector batch)
                ndma = pltpu.make_async_copy(
                    nodes_ref, ns_smem, sem_ref.at[MAXV + 4]
                )
                ndma.start()
                ndma.wait()
                vdma = pltpu.make_async_copy(
                    nflat_ref, ns_vmem, sem_ref.at[MAXV + 4]
                )
                vdma.start()
                vdma.wait()

            def nsf(n2, i):
                """Scalar field i of node record n2 from the packed SMEM
                rows (8 records per 128-float row)."""
                return ns_smem[
                    jax.lax.shift_right_logical(n2, 3),
                    jax.lax.shift_left(jnp.bitwise_and(n2, 7), 4) + i,
                ]

        if any_hit:
            shade_ref, aux_ref = tail_refs
        else:
            shade_ref, aux_ref, wlist_ref, wcnt_ref = tail_refs
        o, d, mint, maxt, feat, zero = _ray_features(rays_ref)
        _write_feat3(feat, f3_ref)
        inv = tuple(1.0 / jnp.where(jnp.abs(c) < 1e-20, 1e-20, c) for c in d)
        n_nodes = nn_stride if smem_nodes else nodes_ref.shape[0] * 2

        # pick the per-octant node ordering by majority octant of the
        # block's live rays (ties break to the higher octant id). One
        # vector->scalar sync per block; the octant-ordered near-first walk
        # it buys prunes ~2-3x better than build order.
        force_oct = _os.environ.get("KAZEN_TRACE_FORCE_OCT")
        if smem_nodes and n_orders > 1 and force_oct is not None:
            # debug: force a fixed ordering table (compile-time captured)
            o_base = jnp.int32(int(force_oct) * nn_stride)
        elif smem_nodes and n_orders > 1:
            live = maxt >= 0.0
            octv = (
                jnp.where(d[0] > 0.0, 4.0, 0.0)
                + jnp.where(d[1] > 0.0, 2.0, 0.0)
                + jnp.where(d[2] > 0.0, 1.0, 0.0)
            )
            rowi = jax.lax.broadcasted_iota(
                jnp.int32, (8, BLOCK), 0
            ).astype(jnp.float32)
            votes = jnp.where(
                (rowi == octv[None, :]) & live[None, :], 1.0, 0.0
            )
            cnt = jnp.sum(votes, axis=1, keepdims=True)  # (8, 1)
            octi = jax.lax.broadcasted_iota(
                jnp.int32, (8, 1), 0
            ).astype(jnp.float32)
            o_sel = jnp.bitwise_and(
                jnp.max(cnt * 8.0 + octi).astype(jnp.int32), 7
            )
            o_base = o_sel * jnp.int32(nn_stride)
        else:
            o_base = jnp.int32(0)

        def node_vals(cursor):
            if smem_nodes:
                def nv(i):
                    return nsf(o_base + cursor, i)

                return nv
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

        def get_dma_w(i, slot):
            cid = list_ref[i]
            return pltpu.make_async_copy(
                geo_w_ref.at[cid],
                wbuf_ref.at[pl.ds(slot * W_ROWS, W_ROWS), :],
                sem_ref.at[slot],
            )

        def collect_scalar(cursor, steps):
            """One-node-per-step walk (VMEM node table variant): each step
            pays a vector->scalar any() sync (~0.9us measured) -- only
            used when the node table exceeds scalar memory."""
            tmax = aux_ref[0, :]

            def cond(s):
                c, cnt, _ = s
                return (c < n_nodes) & (cnt < MAXV)

            def body(s):
                c, cnt, stp = s
                nv = node_vals(c)
                hit_box = slab(nv, tmax)
                any_box = jnp.any(hit_box)
                is_leaf = nv(7) > 0.0
                take = any_box & is_leaf

                @pl.when(take)
                def _():
                    list_ref[cnt] = nv(8).astype(jnp.int32)

                nxt = jnp.where(
                    any_box & jnp.logical_not(is_leaf),
                    c + 1,
                    nv(6).astype(jnp.int32),
                )
                return nxt, cnt + take.astype(jnp.int32), stp + 1

            return jax.lax.while_loop(
                cond, body, (cursor, jnp.int32(0), steps)
            )

        def collect_windowed(cursor, steps):
            """Windowed walk: slab-test WINDOW consecutive nodes as ONE
            (WINDOW, BLOCK) vector batch, pack the per-node any-lane hits
            into a single scalar bitmask (one vector->scalar sync per
            window instead of per node -- the per-step sync was measured
            at ~0.9us, ~60% of the whole kernel), then consume the window
            with pure scalar-core SMEM reads. The walk order and prune
            semantics are identical to the scalar walk: the per-lane tmax
            is re-read once per collect round either way."""
            tmax = aux_ref[0, :][None, :]
            o_b = tuple(c[None, :] for c in o)
            inv_b = tuple(c[None, :] for c in inv)
            mint_b = mint[None, :]
            # exact integer bit weights (exp2 on f32 is approximated by
            # the VPU and loses bit 15)
            pow2 = jax.lax.shift_left(
                jnp.int32(1),
                jax.lax.broadcasted_iota(jnp.int32, (WINDOW, 1), 0),
            )
            n_rows = nn_stride

            def ocond(s):
                c, cnt, _ = s
                return (c < n_nodes) & (cnt < MAXV)

            def obody(s):
                c, cnt, stp = s
                w0 = jnp.minimum(c, jnp.int32(n_rows - WINDOW))
                rows = ns_vmem[pl.ds(o_base + w0, WINDOW), :]  # (W, 16)
                tx0 = (rows[:, 0:1] - o_b[0]) * inv_b[0]
                tx1 = (rows[:, 3:4] - o_b[0]) * inv_b[0]
                ty0 = (rows[:, 1:2] - o_b[1]) * inv_b[1]
                ty1 = (rows[:, 4:5] - o_b[1]) * inv_b[1]
                tz0 = (rows[:, 2:3] - o_b[2]) * inv_b[2]
                tz1 = (rows[:, 5:6] - o_b[2]) * inv_b[2]
                tnear = jnp.maximum(
                    jnp.maximum(
                        jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)
                    ),
                    jnp.minimum(tz0, tz1),
                )
                tfar = jnp.minimum(
                    jnp.minimum(
                        jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)
                    ),
                    jnp.maximum(tz0, tz1),
                )
                hitf = jnp.where(
                    (tnear <= tfar) & (tfar >= mint_b) & (tnear <= tmax),
                    1.0,
                    0.0,
                )  # (W, BLOCK)
                m = jnp.max(hitf, axis=1, keepdims=True)  # (W, 1)
                mask = jnp.sum(
                    jnp.where(m > 0.5, pow2, 0), dtype=jnp.int32
                )  # one vector->scalar sync per window

                def icond(t):
                    c2, cnt2, _ = t
                    return (
                        (c2 < w0 + WINDOW) & (c2 < n_nodes) & (cnt2 < MAXV)
                    )

                def ibody(t):
                    c2, cnt2, stp2 = t
                    any_box = (
                        jax.lax.shift_right_logical(mask, c2 - w0) & 1
                    ) == 1
                    is_leaf = nsf(o_base + c2, 7) > 0.0
                    take = any_box & is_leaf

                    @pl.when(take)
                    def _():
                        list_ref[cnt2] = nsf(o_base + c2, 8).astype(jnp.int32)

                    nxt = jnp.where(
                        any_box & jnp.logical_not(is_leaf),
                        c2 + 1,
                        nsf(o_base + c2, 6).astype(jnp.int32),
                    )
                    return nxt, cnt2 + take.astype(jnp.int32), stp2 + 1

                return jax.lax.while_loop(icond, ibody, (c, cnt, stp))

            return jax.lax.while_loop(
                ocond, obody, (cursor, jnp.int32(0), steps)
            )

        collect = collect_windowed if smem_nodes else collect_scalar

        iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, BLOCK), 0)

        def drain_loop(cnt, leaf_fn):
            """Double-buffered DMA over the collected leaf list: copy i+1
            while testing i (a round-batched MAXV-deep issue variant was
            measured slower: 51.3 vs 45.7 ms on hero bounce rays)."""
            if _os.environ.get("KAZEN_TRACE_ABLATE") == "nodma":
                # attribution: walk + test on stale buffers, no DMA at all
                def drain_nodma(i, z):
                    leaf_fn(wbuf_ref[pl.ds(0, W_ROWS), :], list_ref[i])
                    return z

                jax.lax.fori_loop(0, cnt, drain_nodma, jnp.int32(0))
                return

            @pl.when(cnt > 0)
            def _():
                get_dma_w(0, 0).start()

            def drain(i, z):
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < cnt)
                def _():
                    get_dma_w(i + 1, jax.lax.rem(i + 1, 2)).start()

                get_dma_w(i, slot).wait()
                wblk = wbuf_ref[pl.ds(slot * W_ROWS, W_ROWS), :]
                leaf_fn(wblk, list_ref[i])
                return z

            jax.lax.fori_loop(0, cnt, drain, jnp.int32(0))

        if any_hit:
            # aux row 0: per-lane walk tmax (-1 once blocked); row 1: blocked
            aux_ref[0, :] = maxt
            aux_ref[1, :] = zero

            def leaf_fn(wblk, cid):
                ok, _, _ = _mt_signed(wblk, f3_ref[...], mint, maxt)
                hit = jnp.any(ok, axis=0)
                blocked = (aux_ref[1, :] > 0.0) | hit
                aux_ref[1, :] = jnp.where(blocked, 1.0, 0.0)
                aux_ref[0, :] = jnp.where(blocked, -1.0, maxt)

            def outer_body(state):
                cursor, _, vis, stp = state
                cursor, cnt, stp = collect(cursor, stp)
                drain_loop(cnt, leaf_fn)
                return (
                    cursor, jnp.all(aux_ref[1, :] > 0.0), vis + cnt, stp
                )

            def outer_cond(state):
                cursor, all_blocked, _, _ = state
                return (cursor < n_nodes) & jnp.logical_not(all_blocked)

            _, _, vis, stp = jax.lax.while_loop(
                outer_cond, outer_body,
                (jnp.int32(0), False, jnp.int32(0), jnp.int32(0)),
            )
            out_ref[0, :] = aux_ref[1, :]
            for r in range(1, out_ref.shape[0]):
                out_ref[r, :] = zero
        else:
            # aux row 0: per-lane best t (doubles as the walk prune tmax);
            # row 1: winner cluster id (-1 none); row 2: winner k in
            # cluster; row 3: fetched flag (walk-end fetch). shade_ref is
            # filled by _fetch_winners after the walk.
            aux_ref[0, :] = jnp.minimum(maxt, BIG)
            aux_ref[1, :] = zero - 1.0
            aux_ref[2, :] = zero
            wcnt_ref[0] = jnp.int32(0)
            _init_shade(shade_ref)

            def leaf_fn(wblk, cid):
                _nearest_leaf(
                    wblk, f3_ref[...], cid, mint, maxt, aux_ref,
                    wlist_ref, wcnt_ref,
                )

            def outer_body(state):
                cursor, vis, stp = state
                cursor, cnt, stp = collect(cursor, stp)
                drain_loop(cnt, leaf_fn)
                return cursor, vis + cnt, stp

            _, vis, stp = jax.lax.while_loop(
                lambda s: s[0] < n_nodes, outer_body,
                (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            )
            _fetch_winners(
                geo_sh_ref, sbuf_ref, sem_ref, wlist_ref, wcnt_ref,
                iota_k, aux_ref, shade_ref,
            )
            _write_nearest_out(
                out_ref, shade_ref[:, :], aux_ref[1, :], o, d, zero
            )
            # free per-block diagnostics in the padding rows
            out_ref[34, :] = zero + vis.astype(jnp.float32)
            out_ref[35, :] = zero + stp.astype(jnp.float32)
            out_ref[36, :] = zero + wcnt_ref[0].astype(jnp.float32)

    return kernel


# SMEM walk: max node-scalar rows kept resident (16 f32 each). 12288 rows
# = 768KB, leaving real headroom under the ~1MB scalar memory for the
# MAXV list/semaphores (advisor r3: 16384 rows was exactly 1MB and could
# fail Mosaic SMEM allocation near the cap). 12k nodes covers ~1.5M tris.
SMEM_MAX_NODES = 12288


def _kernel_choice(tables: ClusterTables) -> str:
    """'walk_smem' (scalar node reads; fastest measured on every ray class)
    when the node table fits scalar memory, else the VMEM-table walk -- no
    size cliff either way. KAZEN_TRACE_KERNEL=walk/walk_smem overrides
    for comparison; the choice is captured at first trace and baked into
    the compiled program (changing the env var later does not re-dispatch
    already-jitted callers). (A frustum-cull + sorted-drain kernel was
    built and measured in round 3 -- 24ms coherent / 324ms bounce vs the
    walk's 28/186ms on the hero scene -- and removed: see benchmarks/
    trace_stats.py and git history for the design and numbers.)"""
    import os

    env = os.environ.get("KAZEN_TRACE_KERNEL")
    if env in ("walk", "walk_smem"):
        return env
    if tables.node_scalars.shape[0] * tables.node_scalars.shape[1] <= SMEM_MAX_NODES:
        return "walk_smem"
    return "walk"


@functools.partial(
    jax.jit, static_argnames=("any_hit", "mode", "smem_nodes")
)
def _run(
    tables: ClusterTables,
    rays_packed,
    any_hit=False,
    mode="tpu",
    smem_nodes=False,
):
    """rays_packed: (8, N) = [o3, d3, mint, maxt], N a BLOCK multiple.
    Returns (OUT_ROWS, N) fused rows, or (1, N) [blocked] for any_hit."""
    n = rays_packed.shape[1]
    if mode == "shim":
        return _run_shim(tables, rays_packed, any_hit)
    out_rows = 1 if any_hit else OUT_ROWS
    n_orders, nn_stride = tables.node_scalars.shape[:2]
    kernel = _make_kernel(
        any_hit, smem_nodes=smem_nodes,
        nn_stride=nn_stride, n_orders=n_orders,
    )
    if smem_nodes:
        node_args = (
            tables.node_packed,
            tables.node_scalars.reshape(-1, 16),
        )
        node_specs = [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ]
        extra_scratch = [
            pltpu.SMEM(tuple(tables.node_packed.shape), jnp.float32),
            pltpu.VMEM((n_orders * nn_stride, 16), jnp.float32),
        ]
    else:
        node_args = (tables.nodes,)
        node_specs = [
            pl.BlockSpec(
                tables.nodes.shape, lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        extra_scratch = []
    if any_hit:
        geo_args = (tables.geo_w_occl,)
        geo_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        buf_scratch = [
            pltpu.VMEM((2 * W_ROWS, W_COLS), jnp.bfloat16),  # W double buf
        ]
    else:
        geo_args = (tables.geo_w, tables.geo_shade)
        geo_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        buf_scratch = [
            pltpu.VMEM((2 * W_ROWS, W_COLS), jnp.bfloat16),  # W double buf
            pltpu.VMEM((4 * SH_ROWS, K), jnp.float32),  # shade fetch slots
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((8, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        + node_specs
        + geo_specs,
        out_specs=pl.BlockSpec(
            (max(out_rows, 8), BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((max(out_rows, 8), n), jnp.float32),
        scratch_shapes=buf_scratch
        + [
            pltpu.VMEM((W_ROWS, BLOCK), jnp.bfloat16),  # f3 feature stack
            pltpu.SemaphoreType.DMA((MAXV + 5,)),
            pltpu.SMEM((MAXV,), jnp.int32),
        ]
        + extra_scratch
        + [
            pltpu.VMEM((SH_ROWS, BLOCK), jnp.float32),
            pltpu.VMEM((8, BLOCK), jnp.float32),
        ]
        + (
            []
            if any_hit
            else [
                pltpu.SMEM((WIN_CAP,), jnp.int32),  # improving-cluster list
                pltpu.SMEM((1,), jnp.int32),  # list count
            ]
        ),
        interpret=(mode == "interpret"),
    )(rays_packed, *node_args, *geo_args)
    return out[:out_rows]


def _miss_shade():
    """The (32,) shade column a missed lane carries (face/light = -1,
    benign unit triangle -- see _MISS_ONE_ROWS)."""
    col = jnp.zeros(SH_ROWS, jnp.float32)
    col = col.at[_S_FACE].set(-1.0).at[_S_LIGHT].set(-1.0)
    for r in _MISS_ONE_ROWS:
        col = col.at[r].set(1.0)
    return col


def _run_shim(tables, rays_packed, any_hit):
    """Pure-JAX brute-force reference with kernel-identical semantics
    (chunked over clusters; no traversal -- order only affects exact ties).
    Tests run in exact f32 from the winner-attribute vertices (the same
    triangles the kernel tests in split-bf16). CPU-backend stand-in so
    sharding/integration tests run without TPU."""
    o = rays_packed[0:3].T
    d = rays_packed[3:6].T
    mint = rays_packed[6]
    maxt = rays_packed[7]
    n = o.shape[0]
    C = tables.geo_shade.shape[0]

    from .intersect import moller_trumbore

    def cluster_tests(sh_c):
        p0 = sh_c[0:3].T  # (K, 3)
        p1 = sh_c[3:6].T
        p2 = sh_c[6:9].T
        real = sh_c[_S_FACE] >= 0.0  # (K,)
        tt, uu, vv, okd = moller_trumbore(
            o[:, None, :], d[:, None, :],
            p0[None, :, :], p1[None, :, :], p2[None, :, :],
        )
        ok = (
            okd
            & real[None, :]
            & (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt >= mint[:, None])
            & (tt <= maxt[:, None])
        )
        return ok, tt

    if any_hit:
        def body(c, blocked):
            sh_c = tables.geo_shade[c]
            ok, _ = cluster_tests(sh_c)
            inv_light = (sh_c[_S_LIGHT] >= 0.0) & (sh_c[_S_LPV] == 0.0)
            ok = ok & jnp.logical_not(inv_light)[None, :]
            return blocked | jnp.any(ok, axis=1)

        blocked = jax.lax.fori_loop(0, C, body, jnp.zeros(n, bool))
        return jnp.where(blocked, 1.0, 0.0)[None, :]

    def body(c, carry):
        tbest, cbest, kbest = carry
        sh_c = tables.geo_shade[c]
        ok, tt = cluster_tests(sh_c)
        tt = jnp.where(ok, tt, BIG)
        cmin = jnp.min(tt, axis=1)
        kmin = jnp.argmin(tt, axis=1)
        improved = (cmin < tbest) & (cmin < BIG)
        return (
            jnp.where(improved, cmin, tbest),
            jnp.where(improved, c, cbest),
            jnp.where(improved, kmin, kbest),
        )

    tbest, cbest, kbest = jax.lax.fori_loop(
        0,
        C,
        body,
        (jnp.minimum(maxt, BIG), jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32)),
    )
    shade = tables.geo_shade[cbest, :, kbest].T  # (32, N)
    no_hit = tbest >= jnp.minimum(maxt, BIG)
    shade = jnp.where(no_hit[None, :], _miss_shade()[:, None], shade)
    face = shade[_S_FACE]
    valid = face >= 0.0

    p0 = shade[0:3].T
    p1 = shade[3:6].T
    p2 = shade[6:9].T
    tt, uu, vv, _ = moller_trumbore(o, d, p0, p1, p2)
    out = jnp.zeros((OUT_ROWS, n), jnp.float32)
    out = out.at[0].set(jnp.where(valid, tt, BIG))
    out = out.at[1].set(jnp.where(valid, uu, 0.0))
    out = out.at[2].set(jnp.where(valid, vv, 0.0))
    out = out.at[3].set(jnp.where(valid, face, -1.0))
    out = out.at[4:28].set(shade[0:24])
    out = out.at[28].set(shade[_S_LIGHT])
    out = out.at[29].set(shade[_S_LPV])
    out = out.at[30].set(shade[_S_MAT])
    out = out.at[31].set(shade[_S_HASN])
    out = out.at[32].set(shade[_S_HASUV])
    out = out.at[33].set(
        jnp.where(valid, cbest.astype(jnp.float32), 0.0)
    )
    return out


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


def _dispatch(tables, rays_packed, any_hit, mode):
    choice = "shim" if mode == "shim" else _kernel_choice(tables)
    return _run(
        tables,
        rays_packed,
        any_hit=any_hit,
        mode=mode,
        smem_nodes=(choice == "walk_smem"),
    )


def trace(tables: ClusterTables, o, d, mint, maxt, mode=None):
    """Fused nearest-hit + shading-attribute fetch. Returns the raw
    (OUT_ROWS, N) row matrix; decode with shade/interaction.py:
    prepare_from_rows. Not differentiable (prepare_from_rows recomputes
    the differentiable quantities in closed form)."""
    rays_packed, n = _pack_rays(o, d, mint, maxt)
    out = _dispatch(tables, rays_packed, False, mode or _mode())
    return out[:, :n]


def occluded(tables: ClusterTables, o, d, mint, maxt, mode=None):
    """Any-hit shadow query ignoring primary-invisible light faces."""
    rays_packed, n = _pack_rays(o, d, mint, maxt)
    out = _dispatch(tables, rays_packed, True, mode or _mode())
    return out[0, :n] > 0.0
