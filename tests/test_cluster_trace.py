"""Fused Pallas cluster trace (accel/cluster_trace.py) vs the XLA BVH walk.

On the CPU test backend the kernel semantics run through the pure-JAX shim
(`mode="shim"`; brute force over clusters, identical tests/fetch math); the
actual Mosaic kernel additionally runs in interpret mode on a small scene,
and against hardware in the tpu-marked subprocess test.
"""
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from kazen_tpu.accel import cluster_trace
from kazen_tpu.accel.bvh import build_bvh, intersect_bvh
from kazen_tpu.accel.intersect import Rays, intersect_brute
from kazen_tpu.integrate import camera as camera_mod
from kazen_tpu.integrate.path_mis import intersect_prepare, li_wavefront
from kazen_tpu.integrate.render import sampler_spec
from kazen_tpu.samplers import streams
from kazen_tpu.scene import description as D
from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.shade.interaction import prepare

from scenes import cornell_box, make_mesh, sphere_mesh


def _sphere_scene(visible_lights=False):
    extra = (
        sphere_mesh(
            [0.0, 0.8, 0.3], 0.45, nu=12, nv=10,
            bsdf=D.KazenStandard(
                base_color=(0.6, 0.4, 0.8), metallic=0.3, roughness=0.3
            ),
        ),
        sphere_mesh([-0.55, 0.35, -0.2], 0.3, nu=8, nv=8, bsdf=D.Mirror()),
    )
    lk = {"primary_visibility": True} if visible_lights else None
    return cornell_box(
        width=20, height=20, extra_meshes=extra, light_kwargs=lk
    )


def _compile(desc, pallas):
    os.environ["KAZEN_PALLAS_TRACE"] = "1" if pallas else "0"
    try:
        return compile_scene(desc)
    finally:
        del os.environ["KAZEN_PALLAS_TRACE"]


def _random_rays(n, seed=0):
    rng = np.random.RandomState(seed)
    o = np.array([[0.0, 1.0, -2.0]], np.float32) + 0.3 * rng.randn(n, 3).astype(
        np.float32
    )
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(
        o=jnp.asarray(o), d=jnp.asarray(d),
        mint=jnp.full(n, 1e-4, jnp.float32),
        maxt=jnp.full(n, 3.0e38, jnp.float32),
    )


def test_trace_matches_bvh_walk():
    arrays, static = _compile(_sphere_scene(), pallas=True)
    tt = arrays.trace_tables
    assert tt is not None
    rays = _random_rays(512)
    rows = cluster_trace.trace(tt, rays.o, rays.d, rays.mint, rays.maxt)
    hit_ref = intersect_bvh(arrays, rays)
    face = np.asarray(rows[3])
    found = face >= 0
    np.testing.assert_array_equal(found, np.asarray(hit_ref.valid))
    t = np.asarray(rows[0])[found]
    tr = np.asarray(hit_ref.t)[found]
    np.testing.assert_allclose(t, tr, rtol=1e-5, atol=1e-6)
    # face ids may differ only on exact t-ties between traversal orders
    same_face = face[found] == np.asarray(hit_ref.face)[found]
    assert same_face.mean() > 0.99


def test_prepare_from_rows_matches_gather_prepare():
    arrays, static = _compile(_sphere_scene(), pallas=True)
    rays = _random_rays(512, seed=3)
    hit_f, its_f = intersect_prepare(arrays, rays)
    nott = arrays._replace(trace_tables=None)
    hit_r = intersect_bvh(nott, rays)
    its_r = prepare(nott, rays, hit_r)
    both = np.asarray(hit_f.valid) & np.asarray(hit_r.valid)
    m = both & (np.asarray(hit_f.face) == np.asarray(hit_r.face))
    assert both.sum() > 50
    assert m.sum() / both.sum() > 0.99
    for name in ("p", "uv", "dpdu", "dpdv"):
        a = np.asarray(getattr(its_f, name))[m]
        b = np.asarray(getattr(its_r, name))[m]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(its_f.sh_frame.n)[m],
        np.asarray(its_r.sh_frame.n)[m],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(its_f.light)[m], np.asarray(its_r.light)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(its_f.material)[m], np.asarray(its_r.material)[m]
    )


def test_kernel_interpret_matches_shim():
    """The actual Mosaic kernel body (interpret mode) against the shim."""
    arrays, static = _compile(_sphere_scene(), pallas=True)
    tt = arrays.trace_tables
    rays = _random_rays(cluster_trace.BLOCK, seed=5)
    rows_k = cluster_trace.trace(
        tt, rays.o, rays.d, rays.mint, rays.maxt, mode="interpret"
    )
    rows_s = cluster_trace.trace(
        tt, rays.o, rays.d, rays.mint, rays.maxt, mode="shim"
    )
    rk, rs = np.asarray(rows_k), np.asarray(rows_s)
    same = rk[3] == rs[3]
    assert same.mean() > 0.99
    # rows 34/35 are kernel-side walk diagnostics (visit/step counters);
    # the shim has no walk, so compare the semantic rows only
    np.testing.assert_allclose(
        rk[:34, same], rs[:34, same], rtol=1e-4, atol=1e-5
    )
    occ_k = cluster_trace.occluded(
        tt, rays.o, rays.d, rays.mint, jnp.full(rays.o.shape[0], 1.5),
        mode="interpret",
    )
    occ_s = cluster_trace.occluded(
        tt, rays.o, rays.d, rays.mint, jnp.full(rays.o.shape[0], 1.5),
        mode="shim",
    )
    np.testing.assert_array_equal(np.asarray(occ_k), np.asarray(occ_s))


def test_occluded_invisible_lights_step_through():
    arrays, static = _compile(_sphere_scene(), pallas=True)
    tt = arrays.trace_tables
    rng = np.random.RandomState(1)
    n = 256
    o = np.array([[0.0, 0.5, 0.0]], np.float32) + 0.3 * rng.randn(n, 3).astype(
        np.float32
    )
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    blocked = cluster_trace.occluded(
        tt, jnp.asarray(o), jnp.asarray(d), 1e-3, jnp.full(n, 1.5)
    )
    rays = Rays(
        o=jnp.asarray(o), d=jnp.asarray(d),
        mint=jnp.full(n, 1e-3), maxt=jnp.full(n, 1.5),
    )
    hit = intersect_bvh(arrays, rays)
    mesh = np.asarray(arrays.face_mesh)[np.asarray(hit.face)]
    lid = np.asarray(arrays.mesh_light)[mesh]
    # lights in this scene are primary-invisible: a light nearest-hit must
    # not block (integrator.cpp:259-278); any-hit may still block when a
    # real occluder sits behind the light within maxt (the documented
    # epsilon deviation)
    ref_blocked = np.asarray(hit.valid) & (lid < 0)
    got = np.asarray(blocked)
    assert (got == ref_blocked).mean() > 0.97
    # lanes whose nearest hit is a non-light MUST block exactly
    hard = np.asarray(hit.valid) & (lid < 0)
    np.testing.assert_array_equal(got[hard], np.full(hard.sum(), True))


def test_occluded_visible_lights_block():
    """With primaryVisibility=true lights there is no step-through: every
    nearest hit blocks, and the any-hit pass must agree exactly."""
    arrays, static = _compile(_sphere_scene(visible_lights=True), pallas=True)
    tt = arrays.trace_tables
    assert bool(np.asarray(arrays.light_primary_vis).all())
    rng = np.random.RandomState(2)
    n = 512
    o = np.array([[0.0, 1.0, 0.0]], np.float32) + 0.3 * rng.randn(n, 3).astype(
        np.float32
    )
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    for maxt in (1.0, 3.0):
        blocked = cluster_trace.occluded(
            tt, jnp.asarray(o), jnp.asarray(d), 1e-3, jnp.full(n, maxt)
        )
        hit = intersect_bvh(
            arrays,
            Rays(
                o=jnp.asarray(o), d=jnp.asarray(d),
                mint=jnp.full(n, 1e-3), maxt=jnp.full(n, maxt),
            ),
        )
        np.testing.assert_array_equal(
            np.asarray(blocked), np.asarray(hit.valid)
        )


def test_wavefront_image_parity_with_trace_tables():
    """Full wavefront with/without tables; also covers the visible-light
    occlusion image impact (lights set primaryVisibility=true)."""
    for visible in (False, True):
        sc = _sphere_scene(visible_lights=visible)
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
        assert rel.max() < 1e-3, (visible, rel.max())


def test_pack_big_scene_no_size_cliff():
    """200k triangles pack (HBM-resident blocks; no VMEM budget to decline)
    and trace correctly -- the Embree any-size contract (accel.cpp:25-61)."""
    rng = np.random.RandomState(0)
    nv, nf = 60000, 200000
    V = rng.rand(nv, 3).astype(np.float32) * 4.0
    base = rng.randint(0, nv, nf)
    F = np.stack(
        [base, (base + 1) % nv, (base + 7) % nv], axis=1
    ).astype(np.int32)
    face_shade = np.concatenate(
        [V[F[:, 0]], V[F[:, 1]], V[F[:, 2]], np.zeros((nf, 15), np.float32)],
        axis=1,
    ).astype(np.float32)
    tables = cluster_trace.pack_cluster_tables(
        V, F,
        face_shade,
        np.full(nf, -1, np.int32),
        np.zeros(nf, bool),
        np.zeros(nf, np.int32),
        np.zeros(nf, bool),
        np.zeros(nf, bool),
    )
    assert tables is not None
    assert tables.geo_shade.shape[0] >= nf // cluster_trace.K
    n = 64
    o = rng.rand(n, 3).astype(np.float32) * 4.0
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rows = cluster_trace.trace(
        tables, jnp.asarray(o), jnp.asarray(d),
        jnp.full(n, 1e-4), jnp.full(n, 3.0e38),
    )
    # brute-force oracle over all 200k faces
    from types import SimpleNamespace

    hit = intersect_brute(
        SimpleNamespace(V=jnp.asarray(V), F=jnp.asarray(F)),
        Rays(
            o=jnp.asarray(o), d=jnp.asarray(d),
            mint=jnp.full(n, 1e-4), maxt=jnp.full(n, 3.0e38),
        ),
    )
    found = np.asarray(rows[3]) >= 0
    np.testing.assert_array_equal(found, np.asarray(hit.valid))
    np.testing.assert_allclose(
        np.asarray(rows[0])[found], np.asarray(hit.t)[found],
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
@pytest.mark.tpu
def test_kernel_on_tpu_matches_shim():
    """Mosaic-lowered kernel on real hardware vs the shim. Skipped unless a
    TPU is reachable (the suite itself pins JAX_PLATFORMS=cpu, so this runs
    in a subprocess with the default platform)."""
    code = r"""
import sys, os
sys.path.insert(0, %r); sys.path.insert(0, %r)
os.environ["KAZEN_PALLAS_TRACE"] = "1"
import jax, numpy as np, jax.numpy as jnp
if jax.default_backend() == "cpu":
    print("NO_TPU"); sys.exit(0)
jax.config.update("jax_compilation_cache_dir", os.path.join(%r, ".jax_cache"))
from scenes import cornell_box, sphere_mesh
from kazen_tpu.scene import description as D
from kazen_tpu.scene.compiler import compile_scene
from kazen_tpu.accel import cluster_trace
extra = (sphere_mesh([0.0, 0.8, 0.3], 0.45, nu=12, nv=10),)
arrays, static = compile_scene(cornell_box(extra_meshes=extra))
tt = arrays.trace_tables
rng = np.random.RandomState(0)
n = 2048
o = np.array([[0.0, 1.0, -2.0]], np.float32) + 0.3 * rng.randn(n, 3).astype(np.float32)
d = rng.randn(n, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
o, d = jnp.asarray(o), jnp.asarray(d)
mint, maxt = jnp.full(n, 1e-4), jnp.full(n, 3.0e38)
rk = np.asarray(cluster_trace.trace(tt, o, d, mint, maxt, mode="tpu"))
rs = np.asarray(cluster_trace.trace(tt, o, d, mint, maxt, mode="shim"))
same = rk[3] == rs[3]
assert same.mean() > 0.99, same.mean()
np.testing.assert_allclose(rk[:34, same], rs[:34, same], rtol=1e-4, atol=1e-4)
ok = np.asarray(cluster_trace.occluded(tt, o, d, mint, jnp.full(n, 1.5), mode="tpu"))
os_ = np.asarray(cluster_trace.occluded(tt, o, d, mint, jnp.full(n, 1.5), mode="shim"))
assert (ok == os_).mean() > 0.999
print("TPU_OK")
""" % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.path.dirname(os.path.abspath(__file__)),
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, "-c", code], env=env,
        capture_output=True, text=True, timeout=900,
    )
    out = res.stdout + res.stderr
    if "NO_TPU" in out:
        pytest.skip("no TPU backend reachable")
    assert res.returncode == 0, out
    assert "TPU_OK" in out
