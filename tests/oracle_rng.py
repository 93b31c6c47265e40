"""Scalar Python oracle for the deterministic RNG stack.

Independent re-implementation of the algorithms (MurmurHash64A, MixBits,
pcg32, Kensler permute, TEA) with plain Python ints, used to validate the
vectorized uint32-pair JAX port bit-for-bit.
"""
M64 = (1 << 64) - 1
M32 = (1 << 32) - 1
MURMUR_M = 0xC6A4A7935BD1E995
PCG32_MULT = 0x5851F42D4C957F2D


def murmur64a(data: bytes, seed: int = 0) -> int:
    h = (seed ^ (len(data) * MURMUR_M)) & M64
    nblocks = len(data) // 8
    for b in range(nblocks):
        k = int.from_bytes(data[b * 8 : b * 8 + 8], "little")
        k = (k * MURMUR_M) & M64
        k ^= k >> 47
        k = (k * MURMUR_M) & M64
        h ^= k
        h = (h * MURMUR_M) & M64
    tail = data[nblocks * 8 :]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * MURMUR_M) & M64
    h ^= h >> 47
    h = (h * MURMUR_M) & M64
    h ^= h >> 47
    return h


def hash_pixel_seed(px: int, py: int, seed: int) -> int:
    buf = (px & M32).to_bytes(4, "little") + (py & M32).to_bytes(4, "little") + (
        seed & M64
    ).to_bytes(8, "little")
    return murmur64a(buf)


def hash_pixel_dim_seed(px: int, py: int, dim: int, seed: int) -> int:
    buf = (
        (px & M32).to_bytes(4, "little")
        + (py & M32).to_bytes(4, "little")
        + (dim & M32).to_bytes(4, "little")
        + (seed & M64).to_bytes(8, "little")
    )
    return murmur64a(buf)


def mix_bits(v: int) -> int:
    v &= M64
    v ^= v >> 31
    v = (v * 0x7FB5D329728EA185) & M64
    v ^= v >> 27
    v = (v * 0x81DADEF4BC2DD44D) & M64
    v ^= v >> 33
    return v


class PCG32:
    def __init__(self):
        self.state = 0x853C49E6748FEA9B
        self.inc = 0xDA3E39CB94B95BDB

    def seed_full(self, initstate: int, initseq: int):
        self.state = 0
        self.inc = ((initseq << 1) | 1) & M64
        self.next_uint()
        self.state = (self.state + initstate) & M64
        self.next_uint()

    def seed(self, initseq: int):
        self.seed_full(mix_bits(initseq), initseq)

    def next_uint(self) -> int:
        old = self.state
        self.state = (old * PCG32_MULT + self.inc) & M64
        xorshifted = (((old >> 18) ^ old) >> 27) & M32
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & M32

    def next_float(self) -> float:
        import struct

        u = ((self.next_uint() >> 9) | 0x3F800000) & M32
        return struct.unpack("<f", struct.pack("<I", u))[0] - 1.0

    def advance(self, delta: int):
        delta &= M64
        cur_mult, cur_plus = PCG32_MULT, self.inc
        acc_mult, acc_plus = 1, 0
        while delta > 0:
            if delta & 1:
                acc_mult = (acc_mult * cur_mult) & M64
                acc_plus = (acc_plus * cur_mult + cur_plus) & M64
            cur_plus = ((cur_mult + 1) * cur_plus) & M64
            cur_mult = (cur_mult * cur_mult) & M64
            delta >>= 1
        self.state = (acc_mult * self.state + acc_plus) & M64


def permute(i: int, l: int, p: int) -> int:
    w = l - 1
    w |= w >> 1
    w |= w >> 2
    w |= w >> 4
    w |= w >> 8
    w |= w >> 16
    while True:
        i ^= p
        i = (i * 0xE170893D) & M32
        i ^= p >> 16
        i ^= (i & w) >> 4
        i ^= p >> 8
        i = (i * 0x0929EB3F) & M32
        i ^= p >> 23
        i ^= (i & w) >> 1
        i = (i * (1 | (p >> 27))) & M32
        i = (i * 0x6935FA69) & M32
        i ^= (i & w) >> 11
        i = (i * 0x74DCB303) & M32
        i ^= (i & w) >> 2
        i = (i * 0x9E501CC3) & M32
        i ^= (i & w) >> 2
        i = (i * 0xC860A3DF) & M32
        i &= w
        i ^= i >> 5
        if i < l:
            break
    return (i + p) % l


def sample_tea32(v0: int, v1: int, rounds: int = 4) -> int:
    s = 0
    for _ in range(rounds):
        s = (s + 0x9E3779B9) & M32
        v0 = (
            v0
            + ((((v1 << 4) & M32) + 0xA341316C) ^ ((v1 + s) & M32) ^ ((v1 >> 5) + 0xC8013EA4))
        ) & M32
        v1 = (
            v1
            + ((((v0 << 4) & M32) + 0xAD90777D) ^ ((v0 + s) & M32) ^ ((v0 >> 5) + 0x7E95761E))
        ) & M32
    return ((v1 << 32) | v0) & M64
