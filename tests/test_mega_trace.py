"""Pallas packet trace kernels (accel/mega_trace.py) vs the XLA BVH walk.

Runs the kernel math through the _ArrayRef shim on the CPU test backend
(same code Mosaic compiles on TPU; see megakernel shim rationale). The
full wavefront must be bit-identical with and without the trace tables
attached: the kernel picks the same faces as accel/bvh.py:intersect_bvh
and (t, u, v) are recomputed in closed form either way.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from kazen_tpu.accel import mega_trace
from kazen_tpu.accel.bvh import build_bvh, intersect_bvh
from kazen_tpu.accel.intersect import Rays
from kazen_tpu.integrate import camera as camera_mod
from kazen_tpu.integrate.path_mis import li_wavefront
from kazen_tpu.integrate.render import sampler_spec
from kazen_tpu.samplers import streams
from kazen_tpu.scene import description as D
from kazen_tpu.scene.compiler import compile_scene

from scenes import cornell_box, sphere_mesh


def _sphere_scene():
    extra = (
        sphere_mesh(
            [0.0, 0.8, 0.3], 0.45, nu=12, nv=10,
            bsdf=D.KazenStandard(
                base_color=(0.6, 0.4, 0.8), metallic=0.3, roughness=0.3
            ),
        ),
        sphere_mesh([-0.55, 0.35, -0.2], 0.3, nu=8, nv=8, bsdf=D.Mirror()),
    )
    return cornell_box(width=20, height=20, extra_meshes=extra)


def _compile(desc, pallas):
    os.environ["KAZEN_PALLAS_TRACE"] = "1" if pallas else "0"
    try:
        return compile_scene(desc)
    finally:
        del os.environ["KAZEN_PALLAS_TRACE"]


def test_trace_matches_bvh_walk():
    arrays, static = _compile(_sphere_scene(), pallas=True)
    tt = arrays.trace_tables
    assert tt is not None
    rng = np.random.RandomState(0)
    n = 512
    o = np.array([[0.0, 1.0, -2.5]], np.float32) + 0.1 * rng.randn(n, 3).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(
        o=jnp.asarray(o), d=jnp.asarray(d),
        mint=jnp.full(n, 1e-4), maxt=jnp.full(n, 3.0e38),
    )
    t, u, v, slot = mega_trace.trace(tt, rays.o, rays.d, rays.mint, rays.maxt)
    hit_ref = intersect_bvh(arrays, rays)
    found = np.asarray(slot) >= 0
    np.testing.assert_array_equal(found, np.asarray(hit_ref.valid))
    # same nearest distance wherever both hit (face ids may differ on exact
    # t-ties between leaf layouts)
    tq = np.asarray(t)[found]
    tr = np.asarray(hit_ref.t)[found]
    np.testing.assert_allclose(tq, tr, rtol=1e-5, atol=1e-6)
    face = np.asarray(tt.slot_face)[np.maximum(np.asarray(slot), 0)]
    same_face = face == np.asarray(hit_ref.face)
    assert same_face[found].mean() > 0.99


def test_occluded_matches_stepthrough_semantics():
    arrays, static = _compile(_sphere_scene(), pallas=True)
    tt = arrays.trace_tables
    rng = np.random.RandomState(1)
    n = 256
    o = np.array([[0.0, 0.5, 0.0]], np.float32) + 0.3 * rng.randn(n, 3).astype(np.float32)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    blocked = mega_trace.occluded(
        tt, jnp.asarray(o), jnp.asarray(d), 1e-3, jnp.full(n, 1.5)
    )
    # reference semantics via nearest-hit: lights in this scene are
    # primary-invisible, so a light hit must not block
    rays = Rays(
        o=jnp.asarray(o), d=jnp.asarray(d),
        mint=jnp.full(n, 1e-3), maxt=jnp.full(n, 1.5),
    )
    hit = intersect_bvh(arrays, rays)
    mesh = np.asarray(arrays.face_mesh)[np.asarray(hit.face)]
    lid = np.asarray(arrays.mesh_light)[mesh]
    ref_blocked = np.asarray(hit.valid) & (lid < 0)
    got = np.asarray(blocked)
    # any-hit may also block where the only nearest hit was a light but a
    # non-light lies behind within maxt; both count as epsilon deviations.
    agree = (got == ref_blocked).mean()
    assert agree > 0.97, agree


def test_wavefront_identical_with_trace_tables():
    sc = _sphere_scene()
    li = {}
    for pallas in (False, True):
        arrays, static = _compile(sc, pallas)
        assert (arrays.trace_tables is not None) == pallas
        spec = sampler_spec(static)
        h = w = 20
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
        py = jnp.asarray(ys.reshape(-1).astype(np.uint32))
        stream = streams.init_stream(spec, px, py, 0)
        stream, jitter = streams.next_pixel_2d(spec, stream)
        ps = jnp.stack([px, py], -1).astype(jnp.float32) + jitter
        stream, ap = streams.next_2d(spec, stream)
        rays = camera_mod.sample_ray(arrays, static, ps, ap)
        _, li_out, nr = li_wavefront(arrays, static, spec, stream, rays)
        li[pallas] = np.asarray(li_out)
    rel = np.abs(li[False] - li[True]) / (np.abs(li[False]) + 1e-3)
    assert li[False].mean() > 0.01
    assert rel.max() < 1e-3, rel.max()


def test_pack_respects_vmem_budget():
    rng = np.random.RandomState(0)
    V = rng.rand(300000, 3).astype(np.float32)
    F = rng.randint(0, 300000, (400000, 3)).astype(np.int32)
    # 400k tris cannot fit the VMEM budget -> packer must decline
    assert mega_trace.pack_trace_tables(V[:10], F[:1] * 0 + np.arange(3)[None].astype(np.int32)) is not None
    big_rows = 2 * (400000 // 8)
    assert big_rows * 512 > mega_trace.TRACE_VMEM_BUDGET
