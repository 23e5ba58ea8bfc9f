"""Host-side image IO.

Replaces the reference's 4k-line C `iio` reader (reference src/iio.cpp)
with thin wrappers over imageio/PIL plus a PGM/PPM codec.  IO is cold
path: the reference CLIs read images once per run (src/tvl1flow_main.cpp
:177-178), so no native code is warranted here.

Reading returns float64 numpy arrays to mirror
`iio_read_image_double` (reference src/iio.h:83); grayscale conversion
when a solver wants 1 channel matches iio's mean-of-channels fallback.
"""

import numpy as np


def read_image(path, gray=True, dtype=np.float64):
    """Read an image file -> (H, W) if gray else (H, W, C) float array."""
    import imageio.v3 as iio

    arr = np.asarray(iio.imread(path)).astype(dtype)
    if gray and arr.ndim == 3:
        # iio collapses to gray by averaging channels when a caller asks
        # for 1 channel (reference src/iio.cpp sample conversion)
        arr = arr.mean(axis=2)
    return arr


def write_image(path, arr):
    import imageio.v3 as iio

    arr = np.asarray(arr)
    if arr.dtype not in (np.uint8, np.uint16):
        arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
    iio.imwrite(path, arr)


def write_pgm(path, arr):
    """Write a (H, W) array as binary 8-bit PGM (P5)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())


def read_pgm(path, dtype=np.float64):
    """Read a binary 8-bit PGM (P5) -> (H, W) float array."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"P5"):
        raise ValueError(f"{path}: not a binary PGM")
    # parse header: magic, width, height, maxval (with comment support)
    fields = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h, offset=pos)
    return arr.reshape(h, w).astype(dtype)
