"""BVH build + traversal vs brute-force oracle on random scenes."""
import numpy as np
import jax.numpy as jnp

from kazen_tpu.accel import bvh as bvh_mod
from kazen_tpu.accel.intersect import Rays, intersect_brute


class _FakeScene:
    def __init__(self, V, F, bvh):
        self.V = jnp.asarray(V)
        self.F = jnp.asarray(F)
        self.bvh = bvh


def random_soup(n_tris, seed=0, spread=2.0):
    r = np.random.default_rng(seed)
    base = r.uniform(-spread, spread, size=(n_tris, 1, 3))
    tris = base + r.uniform(-0.4, 0.4, size=(n_tris, 3, 3))
    V = tris.reshape(-1, 3).astype(np.float32)
    F = np.arange(3 * n_tris, dtype=np.int32).reshape(-1, 3)
    return V, F


def random_rays(n, seed=1):
    r = np.random.default_rng(seed)
    o = r.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(
        o=jnp.asarray(o),
        d=jnp.asarray(d),
        mint=jnp.full(n, 1e-4, jnp.float32),
        maxt=jnp.full(n, 3.0e38, jnp.float32),
    )


def _check(n_tris, n_rays, seed):
    V, F = random_soup(n_tris, seed)
    bvh = bvh_mod.build_bvh(V, F)
    scene = _FakeScene(V, F, bvh)
    rays = random_rays(n_rays, seed + 7)
    got = bvh_mod.intersect_bvh(scene, rays)
    want = intersect_brute(scene, rays)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    mask = np.asarray(want.valid)
    np.testing.assert_allclose(
        np.asarray(got.t)[mask], np.asarray(want.t)[mask], rtol=1e-5
    )
    # same face unless coplanar tie: check t agreement implies geometric hit
    same_face = np.asarray(got.face)[mask] == np.asarray(want.face)[mask]
    assert same_face.mean() > 0.99


def test_bvh_matches_brute_small():
    _check(n_tris=25, n_rays=512, seed=0)


def test_bvh_matches_brute_medium():
    _check(n_tris=500, n_rays=512, seed=3)


def test_bvh_structure():
    V, F = random_soup(200, 5)
    b = bvh_mod.build_bvh(V, F)
    skip = np.asarray(b.skip)
    pcnt = np.asarray(b.prim_count)
    n_nodes = len(skip)
    # every face appears exactly once across leaves
    faces = np.asarray(b.prim_faces)
    assert sorted(faces.tolist()) == list(range(200))
    # escape links are monotonically forward and within bounds
    assert (skip > np.arange(n_nodes)).all()
    assert (skip <= n_nodes).all()
    # leaf sizes within bound
    assert pcnt.max() <= bvh_mod.LEAF_SIZE


def test_cornell_render_with_bvh_matches_brute():
    import scenes
    from kazen_tpu.scene.compiler import compile_scene
    from kazen_tpu.integrate.render import render

    scene = scenes.cornell_box(width=16, height=16, spp=2, max_depth=4)
    a0, s0 = compile_scene(scene, use_bvh=False)
    a1, s1 = compile_scene(scene, use_bvh=True)
    img0 = np.asarray(render(a0, s0, spp=2))
    img1 = np.asarray(render(a1, s1, spp=2))
    np.testing.assert_allclose(img0, img1, atol=1e-5)


def test_native_builder_matches_semantics():
    """C++ builder produces a valid escape-link BVH whose traversal matches
    brute force (structure may differ from the numpy builder; results must
    not)."""
    from kazen_tpu.accel import native

    assert native.available(), "g++ toolchain expected in this image"
    V, F = random_soup(400, 11)
    b = bvh_mod.build_bvh(V, F, backend="native")
    skip = np.asarray(b.skip)
    assert (skip > np.arange(len(skip))).all() and (skip <= len(skip)).all()
    assert sorted(np.asarray(b.prim_faces).tolist()) == list(range(400))
    scene = _FakeScene(V, F, b)
    rays = random_rays(1024, 13)
    got = bvh_mod.intersect_bvh(scene, rays)
    want = intersect_brute(scene, rays)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    m = np.asarray(want.valid)
    np.testing.assert_allclose(
        np.asarray(got.t)[m], np.asarray(want.t)[m], rtol=1e-5
    )


def test_native_builder_speed_on_large_mesh():
    """Native build must handle 100k tris quickly (the numpy recursion is
    the fallback, not the default, for large scenes)."""
    import time
    from kazen_tpu.accel import native

    if not native.available():
        return
    V, F = random_soup(100_000, 17, spread=10.0)
    t0 = time.time()
    b = bvh_mod.build_bvh(V, F, backend="native")
    dt = time.time() - t0
    assert dt < 10.0, f"native build took {dt:.1f}s"
    assert len(np.asarray(b.prim_faces)) == 100_000
