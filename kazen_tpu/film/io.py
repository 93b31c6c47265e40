"""Image output: PNG with sRGB tonemap (bitmap.cpp:38-64) and a minimal
self-contained EXR writer (scanline, float32, uncompressed) replacing the
reference's OIIO dependency (bitmap.cpp:23-36)."""
from __future__ import annotations

import struct

import numpy as np

from ..core import math as km


def save_png(path: str, img: np.ndarray) -> None:
    """Per-pixel sRGB tonemap + 8-bit PNG (bitmap.cpp:38-64)."""
    from PIL import Image
    import jax.numpy as jnp

    srgb = np.asarray(
        jnp.clip(km.to_srgb(jnp.clip(jnp.asarray(img), 0.0, 1.0)) * 255.0 + 0.5, 0, 255)
    ).astype(np.uint8)
    Image.fromarray(srgb, "RGB").save(path)


def save_exr(path: str, img: np.ndarray) -> None:
    """Minimal OpenEXR 2.0 writer: single part, scanline, float32, no
    compression, channels B,G,R (alphabetical, per spec)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]

    def attr(name, type_name, data):
        return (
            name.encode() + b"\0" + type_name.encode() + b"\0"
            + struct.pack("<i", len(data)) + data
        )

    def channel(name):
        # name, pixel type (2=float), pLinear+reserved, xSampling, ySampling
        return name.encode() + b"\0" + struct.pack("<iBBBBii", 2, 0, 0, 0, 0, 1, 1)

    chlist = channel("B") + channel("G") + channel("R") + b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b"".join(
        [
            attr("channels", "chlist", chlist),
            attr("compression", "compression", b"\0"),
            attr("dataWindow", "box2i", box),
            attr("displayWindow", "box2i", box),
            attr("lineOrder", "lineOrder", b"\0"),
            attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
            attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0)),
            attr("screenWindowWidth", "float", struct.pack("<f", 1.0)),
            b"\0",
        ]
    )
    magic = struct.pack("<ii", 20000630, 2)
    scan_size = 4 + 4 + 3 * w * 4  # y, byte count, BGR planes
    table_start = len(magic) + len(header)
    data_start = table_start + 8 * h
    offsets = b"".join(
        struct.pack("<Q", data_start + y * scan_size) for y in range(h)
    )
    with open(path, "wb") as f:
        f.write(magic)
        f.write(header)
        f.write(offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, 3 * w * 4))
            f.write(img[y, :, 2].tobytes())  # B
            f.write(img[y, :, 1].tobytes())  # G
            f.write(img[y, :, 0].tobytes())  # R


def load_exr(path: str) -> np.ndarray:
    """Reader for the same minimal subset (round-trip/testing)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<ii", data, 0)
    assert magic == 20000630
    pos = 8
    w = h = None
    while data[pos] != 0:
        name_end = data.index(b"\0", pos)
        name = data[pos:name_end].decode()
        pos = name_end + 1
        type_end = data.index(b"\0", pos)
        pos = type_end + 1
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        if name == "dataWindow":
            x0, y0, x1, y1 = struct.unpack_from("<iiii", data, pos)
            w, h = x1 - x0 + 1, y1 - y0 + 1
        pos += size
    pos += 1  # header terminator
    pos += 8 * h  # offset table
    out = np.zeros((h, w, 3), np.float32)
    for y in range(h):
        yy, nbytes = struct.unpack_from("<ii", data, pos)
        pos += 8
        plane = np.frombuffer(data, np.float32, 3 * w, pos).reshape(3, w)
        out[yy, :, 2] = plane[0]
        out[yy, :, 1] = plane[1]
        out[yy, :, 0] = plane[2]
        pos += nbytes
    return out
