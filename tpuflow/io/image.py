"""Host-side image IO.

Replaces the reference's 4k-line C `iio` reader (reference src/iio.cpp)
with thin wrappers over imageio/PIL plus PGM/PPM and PFM codecs.  IO is cold
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

    if str(path).lower().endswith(".pfm"):
        arr = read_pfm(path, dtype=dtype)
    else:
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


def read_pfm(path, dtype=np.float64):
    """Read a PFM (portable float map) -> (H, W) or (H, W, 3) array.

    Layout per the reference's iio PFM path (src/iio.cpp pfm reader):
    'PF' (color) / 'Pf' (gray) header, width height, scale whose sign
    encodes endianness (negative = little-endian), then float32 rows
    stored BOTTOM-UP."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic not in (b"PF", b"Pf"):
            raise ValueError(f"{path}: not a PFM file")
        dims = f.readline().split()
        while dims and dims[0].startswith(b"#"):
            dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        endian = "<" if scale < 0 else ">"
        channels = 3 if magic == b"PF" else 1
        data = np.frombuffer(f.read(4 * w * h * channels),
                             dtype=endian + "f4")
    shape = (h, w, 3) if channels == 3 else (h, w)
    return data.reshape(shape)[::-1].astype(dtype)


def write_pfm(path, arr, scale=-1.0):
    """Write a (H, W) or (H, W, 3) float array as little-endian PFM."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 2:
        magic = b"Pf"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"PF"
    else:
        raise ValueError(f"PFM needs (H, W) or (H, W, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(magic + b"\n")
        f.write(f"{w} {h}\n".encode())
        f.write(f"{scale:g}\n".encode())
        f.write(arr[::-1].astype("<f4").tobytes())
