"""Per-lane deterministic sample streams for the wavefront integrator.

The reference Sampler interface (sampler.h:44-107) is stateful-per-thread; in
the wavefront every lane carries a tiny ``StreamState`` (pcg32 state + the
current dimension index) and draws are pure functions. Streams are keyed by
(pixel, sampleIndex, dimension, seed) exactly as the reference
(sampler.cpp: generateSample = seed(Hash(p, seed)) + advance(idx*65536+dim)),
so any chip can regenerate any pixel's stream and images are identical across
shardings.

Four sampler kinds, matching sampler.cpp registrations:
  independent (sampler.cpp:18-71), stratified (:81-156),
  correlated (:176-269), pmj02bn (:273-390, with regenerated tables -- the
  reference repo's table data files are missing; see samplers/tables.py).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..core import rng

_U32 = jnp.uint32

ONE_MINUS_EPSILON = float.fromhex("0x1.fffffep-1")


@dataclass(frozen=True)
class SamplerSpec:
    """Static sampler configuration (hashable; closed over by jit)."""

    kind: str = "independent"
    sample_count: int = 1
    seed: int = 1
    # device tables for pmj02bn (populated by samplers.tables.make_pmj02bn_spec)
    pmj_tables: Optional[object] = field(default=None, compare=False)
    bluenoise: Optional[object] = field(default=None, compare=False)
    pmj_pixel_table: Optional[object] = field(default=None, compare=False)

    @property
    def resolution(self) -> Tuple[int, int]:
        if self.kind == "stratified":
            # round sample count up to a square (sampler.cpp:86-93)
            r = 4
            while r * r < self.sample_count:
                r += 1
            return (r, r)
        if self.kind == "correlated":
            # res[1] = floor(sqrt(N)); res[0] = ceil(N / res[1]) (:181-184)
            ry = int(self.sample_count**0.5)
            rx = (self.sample_count + ry - 1) // ry
            return (rx, ry)
        return (0, 0)

    @property
    def effective_sample_count(self) -> int:
        if self.kind == "stratified":
            r = self.resolution[0]
            return r * r
        if self.kind == "correlated":
            rx, ry = self.resolution
            return rx * ry
        if self.kind == "pmj02bn":
            return min(self.sample_count, 65536)
        return self.sample_count


class StreamState(NamedTuple):
    pcg: rng.PCGState  # ((hi, lo), (hi, lo)) uint32 lanes
    dim: jnp.ndarray  # uint32, current dimension index
    px: jnp.ndarray  # uint32 pixel x
    py: jnp.ndarray  # uint32 pixel y
    sample_index: jnp.ndarray  # uint32


def init_stream(spec: SamplerSpec, px, py, sample_index: int) -> StreamState:
    """generateSample(pixel, sampleIndex, dim=0) for a whole lane batch."""
    px = jnp.asarray(px, _U32)
    py = jnp.asarray(py, _U32)
    if spec.kind == "pmj02bn":
        # pmj02bn never touches pcg (sampler.cpp:352-357); dim starts at 2.
        st = rng.pcg_seed(rng.hash_pixel_seed(px, py, spec.seed))
        dim0 = 2
    else:
        st = rng.pcg_seed(rng.hash_pixel_seed(px, py, spec.seed))
        st = rng.pcg_advance_static(st, sample_index * 65536)
        dim0 = 0
    return StreamState(
        pcg=st,
        dim=jnp.full(px.shape, dim0, _U32),
        px=px,
        py=py,
        sample_index=jnp.full(px.shape, sample_index, _U32),
    )


def init_stream_jump(
    spec: SamplerSpec, px, py, sample_index, jump
) -> StreamState:
    """init_stream with a *traced* sample index: ``jump`` is the
    (A, S) u64 pair from rng.advance_constants(sample_index*65536), computed
    host-side per pass, so one compiled render pass serves all spp."""
    px = jnp.asarray(px, _U32)
    py = jnp.asarray(py, _U32)
    st = rng.pcg_seed(rng.hash_pixel_seed(px, py, spec.seed))
    if spec.kind == "pmj02bn":
        dim0 = 2
    else:
        a, s = jump
        st = rng.pcg_advance_jump(st, a, s)
        dim0 = 0
    return StreamState(
        pcg=st,
        dim=jnp.full(px.shape, dim0, _U32),
        px=px,
        py=py,
        sample_index=jnp.broadcast_to(
            jnp.asarray(sample_index, _U32), px.shape
        ),
    )


def _hash32_dim(spec: SamplerSpec, st: StreamState):
    """Low 32 bits of Hash(pixel, dimension, seed)."""
    h = rng.hash_pixel_dim_seed_dyn(st.px, st.py, st.dim, spec.seed)
    return h[1]


def next_1d(spec: SamplerSpec, st: StreamState) -> Tuple[StreamState, jnp.ndarray]:
    n = spec.effective_sample_count
    if spec.kind == "independent":
        pcg, u = rng.pcg_next_float(st.pcg)
        return st._replace(pcg=pcg), u
    if spec.kind == "stratified":
        h32 = _hash32_dim(spec, st)
        stratum = rng.permute(st.sample_index, n, h32)
        pcg, delta = rng.pcg_next_float(st.pcg)
        u = (stratum.astype(jnp.float32) + delta) / n
        return st._replace(pcg=pcg, dim=st.dim + _U32(1)), u
    if spec.kind == "correlated":
        h32 = _hash32_dim(spec, st)
        p = rng.permute(st.sample_index, n, h32 * _U32(0x45FBE943))
        pcg, j = rng.pcg_next_float(st.pcg)
        u = (p.astype(jnp.float32) + j) / n
        return st._replace(pcg=pcg, dim=st.dim + _U32(1)), u
    if spec.kind == "pmj02bn":
        h32 = _hash32_dim(spec, st)
        index = rng.permute(st.sample_index, n, h32)
        delta = _bluenoise_lookup(spec, st.dim, st.px, st.py)
        u = jnp.minimum((index.astype(jnp.float32) + delta) / n, ONE_MINUS_EPSILON)
        return st._replace(dim=st.dim + _U32(1)), u
    raise ValueError(f"unknown sampler kind {spec.kind}")


def next_2d(spec: SamplerSpec, st: StreamState) -> Tuple[StreamState, jnp.ndarray]:
    n = spec.effective_sample_count
    if spec.kind == "independent":
        pcg, u0 = rng.pcg_next_float(st.pcg)
        pcg, u1 = rng.pcg_next_float(pcg)
        return st._replace(pcg=pcg), jnp.stack([u0, u1], axis=-1)
    if spec.kind == "stratified":
        res = spec.resolution[0]
        h32 = _hash32_dim(spec, st)
        stratum = rng.permute(st.sample_index, n, h32)
        x = (stratum % res).astype(jnp.float32)
        y = (stratum // res).astype(jnp.float32)
        pcg, dx = rng.pcg_next_float(st.pcg)
        pcg, dy = rng.pcg_next_float(pcg)
        u = jnp.stack([(x + dx) / res, (y + dy) / res], axis=-1)
        return st._replace(pcg=pcg, dim=st.dim + _U32(2)), u
    if spec.kind == "correlated":
        rx, ry = spec.resolution
        h32 = _hash32_dim(spec, st)
        s = rng.permute(st.sample_index, n, h32 * _U32(0x51633E2D))
        y = s // rx
        x = s % rx
        sx = rng.permute(x, rx, h32 * _U32(0x68BC21EB)).astype(jnp.float32)
        sy = rng.permute(y, ry, h32 * _U32(0x02E5BE93)).astype(jnp.float32)
        pcg, jx = rng.pcg_next_float(st.pcg)
        pcg, jy = rng.pcg_next_float(pcg)
        xf = x.astype(jnp.float32)
        yf = y.astype(jnp.float32)
        u = jnp.stack(
            [(xf + (sy + jx) / ry) / rx, (yf + (sx + jy) / rx) / ry], axis=-1
        )
        return st._replace(pcg=pcg, dim=st.dim + _U32(2)), u
    if spec.kind == "pmj02bn":
        tables = spec.pmj_tables  # (5, 65536, 2) float32 in [0,1)
        n_sets = 5
        pmj_instance = st.dim // _U32(2)
        h32 = _hash32_dim(spec, st)
        permuted = rng.permute(st.sample_index, n, h32)
        index = jnp.where(pmj_instance >= n_sets, permuted, st.sample_index)
        set_idx = (pmj_instance % _U32(n_sets)).astype(jnp.int32)
        u = tables[set_idx, index.astype(jnp.int32)]
        bn0 = _bluenoise_lookup(spec, st.dim, st.px, st.py)
        bn1 = _bluenoise_lookup(spec, st.dim + _U32(1), st.px, st.py)
        u = u + jnp.stack([bn0, bn1], axis=-1)
        u = jnp.where(u >= 1.0, u - 1.0, u)
        u = jnp.minimum(u, ONE_MINUS_EPSILON)
        return st._replace(dim=st.dim + _U32(2)), u
    raise ValueError(f"unknown sampler kind {spec.kind}")


def next_pixel_2d(spec: SamplerSpec, st: StreamState) -> Tuple[StreamState, jnp.ndarray]:
    """nextPixel2D: the sub-pixel jitter draw (pmj02bn uses its pixel-tile
    table, sampler.cpp:373-377; all others alias next2D)."""
    if spec.kind == "pmj02bn":
        tile, tile_size = spec.pmj_pixel_table  # (T*T*N, 2), int
        n = spec.effective_sample_count
        px = (st.px % _U32(tile_size)).astype(jnp.int32)
        py = (st.py % _U32(tile_size)).astype(jnp.int32)
        offset = (px + py * tile_size) * n + st.sample_index.astype(jnp.int32)
        return st, tile[offset]
    return next_2d(spec, st)


def _bluenoise_lookup(spec: SamplerSpec, table_index, px, py):
    """getBlueNoise (bluenoise.h:17-23): table[(idx%48)][x%128][y%128]/65535."""
    bn = spec.bluenoise  # (48, 128, 128) float32
    ti = (table_index % _U32(48)).astype(jnp.int32)
    x = (px % _U32(128)).astype(jnp.int32)
    y = (py % _U32(128)).astype(jnp.int32)
    return bn[ti, x, y]
