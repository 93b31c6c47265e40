"""Bit-exactness tests for the JAX uint32-pair RNG stack vs a scalar oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from kazen_tpu.core import rng, u64
import oracle_rng as oracle

RNG = np.random.default_rng(7)


def rand_u64(n):
    return [int(x) for x in RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)]


def pairs_from_ints(vals):
    hi = np.array([v >> 32 for v in vals], dtype=np.uint32)
    lo = np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    return (jnp.asarray(hi), jnp.asarray(lo))


def ints_from_pair(pair):
    hi = np.asarray(pair[0]).astype(np.uint64)
    lo = np.asarray(pair[1]).astype(np.uint64)
    return (hi << np.uint64(32)) | lo


def test_u64_mul_add():
    xs, ys = rand_u64(256), rand_u64(256)
    xp, yp = pairs_from_ints(xs), pairs_from_ints(ys)
    got_mul = ints_from_pair(jax.jit(u64.mul)(xp, yp))
    got_add = ints_from_pair(jax.jit(u64.add)(xp, yp))
    want_mul = np.array([(x * y) & oracle.M64 for x, y in zip(xs, ys)], dtype=np.uint64)
    want_add = np.array([(x + y) & oracle.M64 for x, y in zip(xs, ys)], dtype=np.uint64)
    np.testing.assert_array_equal(got_mul, want_mul)
    np.testing.assert_array_equal(got_add, want_add)


def test_u64_shifts():
    xs = rand_u64(32)
    xp = pairs_from_ints(xs)
    for n in (0, 1, 5, 18, 27, 31, 32, 33, 47, 59, 63):
        np.testing.assert_array_equal(
            ints_from_pair(u64.shr(xp, n)),
            np.array([(x >> n) & oracle.M64 for x in xs], dtype=np.uint64),
        )
        np.testing.assert_array_equal(
            ints_from_pair(u64.shl(xp, n)),
            np.array([(x << n) & oracle.M64 for x in xs], dtype=np.uint64),
        )


def test_mix_bits():
    xs = rand_u64(64)
    got = ints_from_pair(jax.jit(rng.mix_bits)(pairs_from_ints(xs)))
    want = np.array([oracle.mix_bits(x) for x in xs], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_hash_pixel_seed():
    pts = RNG.integers(0, 4096, size=(64, 2))
    px = pts[:, 0].astype(np.uint32)
    py = pts[:, 1].astype(np.uint32)
    for seed in (0, 1, 12345, (1 << 64) - 17):
        got = ints_from_pair(rng.hash_pixel_seed(px, py, seed))
        want = np.array(
            [oracle.hash_pixel_seed(int(x), int(y), seed) for x, y in pts],
            dtype=np.uint64,
        )
        np.testing.assert_array_equal(got, want)


def test_hash_pixel_dim_seed():
    pts = RNG.integers(0, 4096, size=(32, 2))
    px = pts[:, 0].astype(np.uint32)
    py = pts[:, 1].astype(np.uint32)
    for seed in (1, 98765):
        for dim in (0, 3, 77):
            got = ints_from_pair(rng.hash_pixel_dim_seed(px, py, dim, seed))
            want = np.array(
                [oracle.hash_pixel_dim_seed(int(x), int(y), dim, seed) for x, y in pts],
                dtype=np.uint64,
            )
            np.testing.assert_array_equal(got, want)


def test_pcg_stream_matches_oracle():
    px, py, seed, sample_idx = 13, 57, 1, 9
    st = rng.sampler_state(jnp.uint32(px), jnp.uint32(py), seed, sample_idx)

    def draw_n(st, n=20):
        outs = []
        for _ in range(n):
            st, v = rng.pcg_next_uint(st)
            outs.append(v)
        return jnp.stack(outs)

    got = np.asarray(jax.jit(draw_n)(st))
    ref = oracle.PCG32()
    ref.seed(oracle.hash_pixel_seed(px, py, seed))
    ref.advance(sample_idx * 65536)
    want = np.array([ref.next_uint() for _ in range(20)], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_pcg_next_float():
    def draw_n(st, n=10):
        outs = []
        for _ in range(n):
            st, v = rng.pcg_next_float(st)
            outs.append(v)
        return jnp.stack(outs)

    st = rng.pcg_seed(u64.from_int(42))
    got = np.asarray(jax.jit(draw_n)(st))
    ref = oracle.PCG32()
    ref.seed(42)
    want = np.array([ref.next_float() for _ in range(10)], dtype=np.float32)
    np.testing.assert_array_equal(got, want)
    assert (got >= 0).all() and (got < 1).all()


def test_pcg_advance_matches_oracle():
    h = 777
    for k in (0, 1, 5, 65536, 65536 * 3 + 4):
        st = rng.pcg_seed(u64.from_int(h))
        st = rng.pcg_advance_static(st, k)
        _, got = rng.pcg_next_uint(st)
        ref = oracle.PCG32()
        ref.seed(h)
        ref.advance(k)
        assert int(got) == ref.next_uint()


def test_permute_bit_exact_and_is_permutation():
    for l in (1, 2, 7, 16, 100, 1024):
        p = int(RNG.integers(0, 1 << 32))
        idx = np.arange(l, dtype=np.uint32)
        got = np.asarray(rng.permute(idx, l, np.uint32(p)))
        want = np.array([oracle.permute(i, l, p) for i in range(l)], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)
        assert sorted(got.tolist()) == list(range(l))


def test_tea32():
    vs = RNG.integers(0, 1 << 32, size=(32, 2))
    got = ints_from_pair(
        rng.sample_tea32(vs[:, 0].astype(np.uint32), vs[:, 1].astype(np.uint32))
    )
    want = np.array(
        [oracle.sample_tea32(int(v0), int(v1)) for v0, v1 in vs], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)
