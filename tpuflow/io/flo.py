"""Middlebury `.flo` optical-flow file codec.

Layout (observed at reference src/iio.cpp:2233-2255 and the writer
dispatch at src/iio.cpp:3664-3675): 4-byte float magic 202021.25 (the
bytes spell "PIEH"), int32 width, int32 height, then h*w*2 float32
samples interleaved (u, v) in row-major order.  The reference always
downcasts to float32 on write (src/tvl1flow_main.cpp:209-214).
"""

import struct

import numpy as np

FLO_MAGIC = 202021.25
FLO_TAG = struct.pack("<f", FLO_MAGIC)  # b'PIEH'


def read_flo(path):
    """Read a .flo file -> (u, v) float32 arrays of shape (H, W)."""
    with open(path, "rb") as f:
        tag = f.read(4)
        if tag != FLO_TAG:
            raise ValueError(f"{path}: bad .flo magic {tag!r} (want {FLO_TAG!r})")
        w, h = struct.unpack("<ii", f.read(8))
        if not (0 < w < 100000 and 0 < h < 100000):
            raise ValueError(f"{path}: implausible size {w}x{h}")
        data = np.frombuffer(f.read(w * h * 2 * 4), dtype="<f4")
    if data.size != w * h * 2:
        raise ValueError(f"{path}: truncated data")
    uv = data.reshape(h, w, 2)
    return uv[..., 0].copy(), uv[..., 1].copy()


def write_flo(path, u, v):
    """Write flow components u, v (H, W) as a float32 .flo file."""
    u = np.asarray(u, dtype="<f4")
    v = np.asarray(v, dtype="<f4")
    if u.shape != v.shape or u.ndim != 2:
        raise ValueError(f"u/v must be matching 2D arrays, got {u.shape} {v.shape}")
    h, w = u.shape
    uv = np.stack([u, v], axis=-1)
    with open(path, "wb") as f:
        f.write(FLO_TAG)
        f.write(struct.pack("<ii", w, h))
        f.write(uv.tobytes())
