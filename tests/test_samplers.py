"""Sampler stream tests: bit-exact vs a scalar oracle + distribution checks."""
import numpy as np
import jax
import jax.numpy as jnp

from kazen_tpu.core import rng
from kazen_tpu.samplers import streams
import oracle_rng as oracle


class OracleStratified:
    """Scalar transliteration of sampler.cpp:81-156."""

    def __init__(self, sample_count=16, seed=1):
        self.seed = seed
        r = 4
        while r * r < sample_count:
            r += 1
        self.res = r
        self.n = r * r
        self.pcg = oracle.PCG32()

    def generate_sample(self, px, py, idx, dim=0):
        self.px, self.py, self.idx, self.dim = px, py, idx, dim
        self.pcg.seed(oracle.hash_pixel_seed(px, py, self.seed))
        self.pcg.advance(idx * 65536 + dim)

    def next1d(self):
        h = oracle.hash_pixel_dim_seed(self.px, self.py, self.dim, self.seed)
        stratum = oracle.permute(self.idx, self.n, h & 0xFFFFFFFF)
        self.dim += 1
        return (stratum + self.pcg.next_float()) / self.n

    def next2d(self):
        h = oracle.hash_pixel_dim_seed(self.px, self.py, self.dim, self.seed)
        stratum = oracle.permute(self.idx, self.n, h & 0xFFFFFFFF)
        self.dim += 2
        x, y = stratum % self.res, stratum // self.res
        dx, dy = self.pcg.next_float(), self.pcg.next_float()
        return ((x + dx) / self.res, (y + dy) / self.res)


class OracleCorrelated:
    """Scalar transliteration of sampler.cpp:176-269."""

    def __init__(self, sample_count=16, seed=1):
        self.seed = seed
        ry = int(sample_count**0.5)
        rx = (sample_count + ry - 1) // ry
        self.rx, self.ry = rx, ry
        self.n = rx * ry
        self.pcg = oracle.PCG32()

    def generate_sample(self, px, py, idx, dim=0):
        self.px, self.py, self.idx, self.dim = px, py, idx, dim
        self.pcg.seed(oracle.hash_pixel_seed(px, py, self.seed))
        self.pcg.advance(idx * 65536 + dim)

    def next1d(self):
        h = oracle.hash_pixel_dim_seed(self.px, self.py, self.dim, self.seed)
        p = oracle.permute(self.idx, self.n, (h * 0x45FBE943) & 0xFFFFFFFF)
        self.dim += 1
        return (p + self.pcg.next_float()) / self.n

    def next2d(self):
        h = oracle.hash_pixel_dim_seed(self.px, self.py, self.dim, self.seed)
        s = oracle.permute(self.idx, self.n, (h * 0x51633E2D) & 0xFFFFFFFF)
        y, x = s // self.rx, s % self.rx
        sx = oracle.permute(x, self.rx, (h * 0x68BC21EB) & 0xFFFFFFFF)
        sy = oracle.permute(y, self.ry, (h * 0x02E5BE93) & 0xFFFFFFFF)
        jx, jy = self.pcg.next_float(), self.pcg.next_float()
        self.dim += 2
        return (
            (x + (sy + jx) / self.ry) / self.rx,
            (y + (sx + jy) / self.rx) / self.ry,
        )


def draw_sequence(spec, px, py, idx):
    """Draw 1d,2d,1d,2d from a jitted stream."""

    def f(px, py):
        st = streams.init_stream(spec, px, py, idx)
        st, a = streams.next_1d(spec, st)
        st, b = streams.next_2d(spec, st)
        st, c = streams.next_1d(spec, st)
        st, d = streams.next_2d(spec, st)
        return a, b, c, d

    return jax.jit(f)(jnp.uint32(px), jnp.uint32(py))


def test_hash_dyn_matches_static():
    px = np.arange(16, dtype=np.uint32)
    py = (px * 7 + 3).astype(np.uint32)
    for dim in (0, 5, 99):
        a = rng.hash_pixel_dim_seed(px, py, dim, 12345)
        b = rng.hash_pixel_dim_seed_dyn(px, py, np.full(16, dim, np.uint32), 12345)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_independent_matches_oracle():
    spec = streams.SamplerSpec(kind="independent", sample_count=16, seed=1)
    a, b, c, d = draw_sequence(spec, 10, 20, 3)
    ref = oracle.PCG32()
    ref.seed(oracle.hash_pixel_seed(10, 20, 1))
    ref.advance(3 * 65536)
    want = [ref.next_float() for _ in range(6)]
    got = [float(a), float(b[0]), float(b[1]), float(c), float(d[0]), float(d[1])]
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_stratified_matches_oracle():
    spec = streams.SamplerSpec(kind="stratified", sample_count=16, seed=1)
    for (px, py, idx) in [(0, 0, 0), (13, 57, 7), (100, 3, 15)]:
        a, b, c, d = draw_sequence(spec, px, py, idx)
        o = OracleStratified(16, 1)
        o.generate_sample(px, py, idx)
        w1 = o.next1d()
        w2 = o.next2d()
        w3 = o.next1d()
        w4 = o.next2d()
        np.testing.assert_allclose(float(a), w1, atol=1e-7)
        np.testing.assert_allclose([float(b[0]), float(b[1])], w2, atol=1e-7)
        np.testing.assert_allclose(float(c), w3, atol=1e-7)
        np.testing.assert_allclose([float(d[0]), float(d[1])], w4, atol=1e-7)


def test_correlated_matches_oracle():
    spec = streams.SamplerSpec(kind="correlated", sample_count=16, seed=1)
    for (px, py, idx) in [(0, 0, 0), (13, 57, 7), (9, 31, 15)]:
        a, b, c, d = draw_sequence(spec, px, py, idx)
        o = OracleCorrelated(16, 1)
        o.generate_sample(px, py, idx)
        w1 = o.next1d()
        w2 = o.next2d()
        w3 = o.next1d()
        w4 = o.next2d()
        np.testing.assert_allclose(float(a), w1, atol=1e-7)
        np.testing.assert_allclose([float(b[0]), float(b[1])], w2, atol=1e-7)
        np.testing.assert_allclose(float(c), w3, atol=1e-7)
        np.testing.assert_allclose([float(d[0]), float(d[1])], w4, atol=1e-7)


def test_stratified_covers_strata():
    """Over all sampleIndexes of one pixel, 2D draws hit each cell once."""
    spec = streams.SamplerSpec(kind="stratified", sample_count=16, seed=1)
    n = spec.effective_sample_count
    res = spec.resolution[0]
    cells = set()
    px = jnp.full((1,), 5, jnp.uint32)
    py = jnp.full((1,), 9, jnp.uint32)
    for idx in range(n):
        st = streams.init_stream(spec, px, py, idx)
        _, u = streams.next_2d(spec, st)
        cx = int(np.asarray(u)[0, 0] * res)
        cy = int(np.asarray(u)[0, 1] * res)
        cells.add((cx, cy))
    assert len(cells) == n


def test_streams_uniform_mean():
    """All samplers produce roughly uniform [0,1) marginals."""
    for kind in ("independent", "stratified", "correlated"):
        spec = streams.SamplerSpec(kind=kind, sample_count=16, seed=1)
        px, py = np.meshgrid(np.arange(32, dtype=np.uint32), np.arange(32, dtype=np.uint32))
        px, py = px.ravel(), py.ravel()
        vals = []
        for idx in range(4):
            st = streams.init_stream(spec, px, py, idx)
            st, u = streams.next_2d(spec, st)
            vals.append(np.asarray(u))
        v = np.concatenate(vals, axis=0)
        assert abs(v.mean() - 0.5) < 0.01, kind
        assert (v >= 0).all() and (v < 1).all(), kind


def test_pmj02bn_stream():
    from kazen_tpu.samplers.tables import make_pmj02bn_spec

    spec = make_pmj02bn_spec(16, seed=1)
    n = spec.effective_sample_count
    assert n == 16
    px, py = np.meshgrid(
        np.arange(16, dtype=np.uint32), np.arange(16, dtype=np.uint32)
    )
    px, py = px.ravel(), py.ravel()
    # pixel jitter table: per-pixel samples must be stratified within pixel
    vals = []
    for idx in range(n):
        st = streams.init_stream(spec, px, py, idx)
        st, u = streams.next_pixel_2d(spec, st)
        vals.append(np.asarray(u))
    v = np.stack(vals, 1)  # (pix, n, 2)
    assert (v >= 0).all() and (v < 1).all()
    # stratification: per pixel, 16 samples hit all 16 cells of a 4x4 grid
    cells = (v * 4).astype(int)
    ids = cells[..., 0] * 4 + cells[..., 1]
    for p in range(0, 256, 37):
        assert len(set(ids[p].tolist())) == 16
    # 1d and 2d draws in range, roughly uniform
    st = streams.init_stream(spec, px, py, 3)
    st, a = streams.next_1d(spec, st)
    st, b = streams.next_2d(spec, st)
    a, b = np.asarray(a), np.asarray(b)
    assert (a >= 0).all() and (a < 1).all()
    assert (b >= 0).all() and (b < 1).all()
    assert abs(a.mean() - 0.5) < 0.05 and abs(b.mean() - 0.5) < 0.05


def test_pmj02bn_render():
    import scenes
    from kazen_tpu.scene.compiler import compile_scene
    from kazen_tpu.integrate.render import render

    scene = scenes.cornell_box(width=12, height=12, spp=4, sampler="pmj02bn")
    arrays, static = compile_scene(scene)
    img = np.asarray(render(arrays, static, spp=4))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
