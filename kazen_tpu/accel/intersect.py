"""Ray-triangle intersection stages.

``intersect_brute`` is the reference-semantics oracle: Möller-Trumbore
(mesh.cpp:55-92) over every triangle, fully vectorized (N rays x F faces).
It defines the u/v/t conventions the shading stages expect
(hit = (1-u-v)p0 + u p1 + v p2) and is used for small scenes and as the
ground truth the BVH traversal is tested against.

The production path is ``accel.bvh`` (flattened BVH + stackless traversal).
Both produce the same ``Hit`` record.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import math as km


class Rays(NamedTuple):
    o: jnp.ndarray  # (N, 3)
    d: jnp.ndarray  # (N, 3)
    mint: jnp.ndarray  # (N,)
    maxt: jnp.ndarray  # (N,)


class Hit(NamedTuple):
    valid: jnp.ndarray  # (N,) bool
    t: jnp.ndarray  # (N,)
    face: jnp.ndarray  # (N,) int32 global face id (undefined if !valid)
    u: jnp.ndarray  # (N,) barycentric u
    v: jnp.ndarray  # (N,) barycentric v


_DET_EPS = 1e-8
_BIG = jnp.float32(3.4e38)


def moller_trumbore(o, d, p0, p1, p2):
    """Batched Möller-Trumbore on matching shapes (..., 3).

    Returns (t, u, v, ok) where ok ignores the ray's [mint, maxt] interval.
    """
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = km.cross(d, e2)
    det = km.dot(e1, pvec)
    ok = jnp.abs(det) > _DET_EPS
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tvec = o - p0
    u = km.dot(tvec, pvec) * inv_det
    qvec = km.cross(tvec, e1)
    v = km.dot(d, qvec) * inv_det
    t = km.dot(e2, qvec) * inv_det
    ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, u, v, ok


def intersect_brute(scene, rays: Rays) -> Hit:
    """All-pairs nearest-hit intersection; O(N*F), oracle/testing path."""
    p0 = scene.V[scene.F[:, 0]]  # (F, 3)
    p1 = scene.V[scene.F[:, 1]]
    p2 = scene.V[scene.F[:, 2]]

    o = rays.o[:, None, :]  # (N, 1, 3)
    d = rays.d[:, None, :]
    t, u, v, ok = moller_trumbore(o, d, p0[None], p1[None], p2[None])  # (N, F)
    ok = ok & (t >= rays.mint[:, None]) & (t <= rays.maxt[:, None])
    t_masked = jnp.where(ok, t, _BIG)
    best = jnp.argmin(t_masked, axis=1)  # (N,)
    n_idx = jnp.arange(t.shape[0])
    valid = ok[n_idx, best]
    return Hit(
        valid=valid,
        t=t[n_idx, best],
        face=best.astype(jnp.int32),
        u=u[n_idx, best],
        v=v[n_idx, best],
    )
