"""Encoder conformance: our lossless streams must decode bit-exactly, both
through our own decoder and through stock aomdec (the external oracle —
BASELINE bit-exactness config; reference analog: lossless_test.cc).
"""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder import encode_lossless_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")
HAVE_ORACLE = os.path.exists(AOMDEC)


def _content(kind, w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    if kind == "noise":
        return (rng.integers(0, 256, (h, w)).astype(np.uint8),
                rng.integers(0, 256, (ch, cw)).astype(np.uint8),
                rng.integers(0, 256, (ch, cw)).astype(np.uint8))
    if kind == "flat":
        return (np.full((h, w), 126, np.uint8),
                np.full((ch, cw), 128, np.uint8),
                np.full((ch, cw), 130, np.uint8))
    y = ((xx + 2 * yy) % 256).astype(np.uint8)
    u = ((xx[: h:2, : w:2]) % 256).astype(np.uint8)[:ch, :cw]
    v = ((yy[: h:2, : w:2]) % 256).astype(np.uint8)[:ch, :cw]
    return y, u, v


@pytest.mark.parametrize("kind", ["flat", "diag", "noise"])
@pytest.mark.parametrize("dims", [(64, 64), (352, 288), (100, 76), (35, 23)])
def test_lossless_roundtrip_own_decoder(tmp_path, kind, dims):
    w, h = dims
    frame = _content(kind, w, h)
    ivf = str(tmp_path / "o.ivf")
    encode_lossless_ivf(ivf, [frame], w, h)
    y, u, v = decode_ivf(ivf)[0]
    np.testing.assert_array_equal(y, frame[0])
    np.testing.assert_array_equal(u, frame[1])
    np.testing.assert_array_equal(v, frame[2])


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
@pytest.mark.parametrize("kind", ["diag", "noise"])
@pytest.mark.parametrize("dims", [(352, 288), (100, 76)])
def test_lossless_conformance_aomdec(tmp_path, kind, dims):
    w, h = dims
    frame = _content(kind, w, h)
    ivf = str(tmp_path / "o.ivf")
    out_y4m = str(tmp_path / "dec.y4m")
    encode_lossless_ivf(ivf, [frame], w, h)
    subprocess.run([AOMDEC, "-o", out_y4m, ivf], check=True,
                   capture_output=True)
    dec, dw, dh, _ = read_y4m(out_y4m)
    assert (dw, dh) == (w, h)
    np.testing.assert_array_equal(dec[0][0], frame[0])
    np.testing.assert_array_equal(dec[0][1], frame[1])
    np.testing.assert_array_equal(dec[0][2], frame[2])


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_lossless_multiframe_aomdec(tmp_path):
    w, h = 176, 144
    frames = [_content("diag", w, h, seed=s) for s in range(3)]
    ivf = str(tmp_path / "o.ivf")
    out_y4m = str(tmp_path / "dec.y4m")
    encode_lossless_ivf(ivf, frames, w, h)
    subprocess.run([AOMDEC, "-o", out_y4m, ivf], check=True,
                   capture_output=True)
    dec, _, _, _ = read_y4m(out_y4m)
    assert len(dec) == 3
    for got, want in zip(dec, frames):
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)
