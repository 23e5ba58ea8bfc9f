"""Flow-file codecs: Middlebury .flo and JUV .uv.

The .uv writer was validated byte-identical against the reference
binary's own output (iio_save_image_as_juv dispatched by filename
suffix, reference src/iio.cpp:3665-3670): running
`/tmp/refbuild/tvl1flow a.png b.png out.uv` and our
`write_juv(read_juv(out.uv))` produce the same 512,255 bytes.  These
tests pin the byte layout so that property survives without needing
the binary at test time."""

import numpy as np

from tpuflow.io.flo import (read_flo, read_flow, read_juv, write_flo,
                            write_flow, write_juv)


def _flow(h=12, w=16, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((h, w)).astype(np.float32),
            rng.standard_normal((h, w)).astype(np.float32))


def test_flo_roundtrip(tmp_path):
    u, v = _flow()
    p = str(tmp_path / "f.flo")
    write_flo(p, u, v)
    ru, rv = read_flo(p)
    np.testing.assert_array_equal(ru, u)
    np.testing.assert_array_equal(rv, v)


def test_juv_roundtrip_and_layout(tmp_path):
    u, v = _flow()
    p = str(tmp_path / "f.uv")
    write_juv(p, u, v)
    raw = open(p, "rb").read()
    # reference layout (src/iio.cpp:2729-2751): 255-byte header = text
    # + NUL, space-padded; then planar u, then v, as little-endian f32
    h, w = u.shape
    text = f"#UV {{\n dimx {w} dimy {h}\n}}\n".encode() + b"\0"
    assert raw[: len(text)] == text
    assert raw[len(text):255] == b" " * (255 - len(text))
    assert len(raw) == 255 + 2 * h * w * 4
    np.testing.assert_array_equal(
        np.frombuffer(raw[255:255 + h * w * 4], "<f4").reshape(h, w), u)
    ru, rv = read_juv(p)
    np.testing.assert_array_equal(ru, u)
    np.testing.assert_array_equal(rv, v)


def test_write_flow_extension_dispatch(tmp_path):
    """Dispatch parity with iio_save_image_default
    (src/iio.cpp:3655-3675): .uv -> JUV, anything else -> .flo."""
    u, v = _flow()
    p_uv = str(tmp_path / "f.uv")
    p_flo = str(tmp_path / "f.flo")
    write_flow(p_uv, u, v)
    write_flow(p_flo, u, v)
    assert open(p_uv, "rb").read(4) == b"#UV "
    assert open(p_flo, "rb").read(4) == b"PIEH"
    for p in (p_uv, p_flo):
        ru, rv = read_flow(p)
        np.testing.assert_array_equal(ru, u)
        np.testing.assert_array_equal(rv, v)


REF_FIXTURE = "/root/reference/3rdparty/tvl1flow_3/uv.flo"


def test_reference_flo_fixture(tmp_path):
    """End-to-end codec parity against bytes the reference itself wrote.

    `3rdparty/tvl1flow_3/uv.flo` is the one reference-produced binary
    artifact in the upstream repo (256x256 Middlebury flow, PIEH magic,
    524,300 bytes = 12 + 256*256*2*4).  Reading it through `read_flo`
    and re-encoding through `write_flo` must reproduce the file
    byte-exactly."""
    import os

    import pytest

    if not os.path.exists(REF_FIXTURE):
        pytest.skip("reference checkout not mounted")
    raw = open(REF_FIXTURE, "rb").read()
    assert len(raw) == 524300
    assert raw[:4] == b"PIEH"
    u, v = read_flo(REF_FIXTURE)
    assert u.shape == v.shape == (256, 256)
    assert u.dtype == v.dtype == np.float32
    assert np.isfinite(u).all() and np.isfinite(v).all()
    # plausible dense-flow magnitudes, not constants
    mag = np.hypot(u, v)
    assert 0.0 < float(mag.mean()) < 50.0
    assert float(u.std()) > 0 and float(v.std()) > 0
    p = str(tmp_path / "reencode.flo")
    write_flo(p, u, v)
    assert open(p, "rb").read() == raw
