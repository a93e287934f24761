"""Decoder conformance: losslessly decode streams produced by stock aomenc.

This validates the complete intra decode chain bit-exactly (headers, range
decoder, partition tree, mode syntax, coefficient contexts, intra
prediction incl. CfL / filter-intra / directional modes, WHT), mirroring the
reference's test_vector_test.cc strategy with aomenc as the stream source.
"""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

AOMENC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomenc")

pytestmark = pytest.mark.skipif(not os.path.exists(AOMENC),
                                reason="aomenc oracle not built")


def _content(kind, w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "gradient":
        y = ((xx * 255) // max(w - 1, 1)).astype(np.uint8)
        u = ((yy[::2, ::2] * 200) // max(h - 1, 1) + 28).astype(np.uint8)
        v = np.full(((h + 1) // 2, (w + 1) // 2), 128, np.uint8)
    elif kind == "noise":
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2)).astype(
            np.uint8)
        v = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2)).astype(
            np.uint8)
    elif kind == "blocks":
        y = rng.integers(0, 255, ((h + 15) // 16, (w + 15) // 16))
        y = np.kron(y, np.ones((16, 16)))[:h, :w]
        y = (y + rng.integers(-6, 7, (h, w))).clip(0, 255).astype(np.uint8)
        u = rng.integers(90, 170, ((h + 1) // 2, (w + 1) // 2)).astype(
            np.uint8)
        v = rng.integers(90, 170, ((h + 1) // 2, (w + 1) // 2)).astype(
            np.uint8)
    else:  # diag structures exercise directional modes
        y = ((xx + yy) % 256).astype(np.uint8)
        u = ((xx[::2, ::2] - yy[::2, ::2]) % 256).astype(np.uint8)
        v = ((2 * xx[::2, ::2] + yy[::2, ::2]) % 256).astype(np.uint8)
    return y, u, v


def _roundtrip(tmp_path, kind, w, h, speed):
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "out.ivf")
    frame = _content(kind, w, h)
    write_y4m(src, [frame], w, h)
    # 3 identical frames so aomenc uses the normal (non-still-picture) header
    write_y4m(src, [frame, frame, frame], w, h)
    subprocess.run(
        [AOMENC, "--enable-chroma-deltaq=0", "--aq-mode=0", "--lossless=1",
         f"--cpu-used={speed}", "--threads=1", "-o", ivf, src],
        check=True, capture_output=True)
    out = decode_ivf(ivf, max_frames=1)
    y, u, v = out[0]
    np.testing.assert_array_equal(y, frame[0])
    np.testing.assert_array_equal(u, frame[1])
    np.testing.assert_array_equal(v, frame[2])


@pytest.mark.parametrize("kind", ["gradient", "noise", "blocks", "diag"])
def test_lossless_decode_352x288(tmp_path, kind):
    _roundtrip(tmp_path, kind, 352, 288, speed=6)


@pytest.mark.parametrize("dims", [(64, 64), (128, 96), (176, 144)])
def test_lossless_decode_sizes(tmp_path, dims):
    _roundtrip(tmp_path, "blocks", dims[0], dims[1], speed=6)


@pytest.mark.parametrize("dims", [(100, 76), (350, 286), (33, 33)])
def test_lossless_decode_odd_sizes(tmp_path, dims):
    """Non-multiple-of-8 sizes exercise boundary availability logic."""
    _roundtrip(tmp_path, "diag", dims[0], dims[1], speed=6)


@pytest.mark.parametrize("speed", [0, 3])
def test_lossless_decode_slow_speeds(tmp_path, speed):
    """Slower speeds use richer partitions and intra modes."""
    _roundtrip(tmp_path, "blocks", 176, 144, speed)


def test_separate_tile_group_obus(tmp_path):
    """Frame header + multiple tile-group OBUs (obu.c read_one_tile_group;
    spec 5.11.1 tg_start/tg_end syntax)."""
    w, h = 256, 192
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "out.ivf")
    frame = _content("blocks", w, h, seed=4)
    write_y4m(src, [frame, frame], w, h)
    subprocess.run(
        [AOMENC, "--enable-chroma-deltaq=0", "--aq-mode=0", "--lossless=1",
         "--cpu-used=6", "--threads=1", "--tile-columns=1", "--tile-rows=1",
         "--num-tile-groups=3", "-o", ivf, src],
        check=True, capture_output=True)
    # prove the stream really carries separate tile group OBUs
    from aom_av1_lavish_tpu.bitstream import headers as H
    from aom_av1_lavish_tpu.bitstream import constants as c
    from aom_av1_lavish_tpu.bitstream.ivf import read_ivf
    payload = next(iter(read_ivf(ivf)))[0]
    types = [t for t, _ in H.split_obus(payload)]
    assert types.count(c.OBU_TILE_GROUP) >= 2, types
    out = decode_ivf(ivf, max_frames=1)
    np.testing.assert_array_equal(out[0][0], frame[0])
    np.testing.assert_array_equal(out[0][1], frame[1])
    np.testing.assert_array_equal(out[0][2], frame[2])
