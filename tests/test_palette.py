"""Palette (screen content) decode conformance vs stock aomenc/aomdec.

Mirrors the reference's screen-content coverage (av1/decoder/decodemv.c
read_palette_mode_info, detokenize.c decode_color_map_tokens) using aomenc
--tune-content=screen streams as the oracle source.
"""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.common import palette as PAL
from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

ROOT = os.path.join(os.path.dirname(__file__), "..")
AOMENC = os.path.join(ROOT, ".oracle", "build", "aomenc")
AOMDEC = os.path.join(ROOT, ".oracle", "build", "aomdec")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(AOMENC) and os.path.exists(AOMDEC)),
    reason="aom oracle not built")


def _screen_frames(w, h, n_frames, seed=3):
    """Text-like content with few distinct colors: palette's home turf."""
    rng = np.random.default_rng(seed)
    y_colors = np.array([16, 72, 128, 200, 235], np.uint8)
    uv_colors = np.array([64, 128, 192], np.uint8)
    frames = []
    cell = rng.integers(0, len(y_colors), (h // 4, w // 4))
    for i in range(n_frames):
        # flip a few cells per frame so inter frames still code intra blocks
        rr = rng.integers(0, h // 4, 8)
        cc = rng.integers(0, w // 4, 8)
        cell[rr, cc] = rng.integers(0, len(y_colors), 8)
        y = y_colors[np.kron(cell, np.ones((4, 4), int))[:h, :w]]
        ucell = cell[::2, ::2] % len(uv_colors)
        u = uv_colors[np.kron(ucell, np.ones((2, 2), int))[:h // 2, :w // 2]]
        v = uv_colors[np.kron((ucell + 1) % len(uv_colors),
                              np.ones((2, 2), int))[:h // 2, :w // 2]]
        frames.append((y, u, v))
    return frames


def _encode_screen(tmp_path, frames, w, h, extra):
    src = str(tmp_path / "s.y4m")
    ivf = str(tmp_path / "p.ivf")
    write_y4m(src, frames, w, h)
    subprocess.run(
        [AOMENC, "--codec=av1", "--ivf", "-o", ivf, "--cpu-used=5",
         "--end-usage=q", "--cq-level=20", "--passes=1", "--lag-in-frames=0",
         "--tune-content=screen", "--enable-intrabc=0", "--threads=1",
         "--tile-columns=0", "--tile-rows=0", "--aq-mode=0",
         "--enable-chroma-deltaq=0"] + extra + [src],
        check=True, capture_output=True)
    return ivf


def _assert_matches_aomdec(tmp_path, ivf):
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True, capture_output=True)
    PAL.STATS["maps"] = 0
    ours = decode_ivf(ivf)
    ref = read_y4m(out)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {pi}")
    assert PAL.STATS["maps"] > 0, "stream never used palette mode"


def test_palette_allintra(tmp_path):
    w, h = 128, 96
    frames = _screen_frames(w, h, 2)
    ivf = _encode_screen(tmp_path, frames, w, h,
                         ["--kf-max-dist=1", "--kf-min-dist=1"])
    _assert_matches_aomdec(tmp_path, ivf)


def test_palette_inter(tmp_path):
    w, h = 176, 144
    frames = _screen_frames(w, h, 5, seed=9)
    ivf = _encode_screen(tmp_path, frames, w, h, ["--kf-max-dist=9999"])
    _assert_matches_aomdec(tmp_path, ivf)


def test_palette_encode(tmp_path):
    """Our screen-content encoder emits palette blocks; streams decode in
    stock aomdec and match our own decoder exactly."""
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf

    w, h = 128, 96
    frames = _screen_frames(w, h, 1, seed=5)
    ivf = str(tmp_path / "ours.ivf")
    encode_lossy_ivf(ivf, frames, w, h, qindex=40, screen=True)

    # stock aomdec accepts the stream
    out = str(tmp_path / "dec.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]

    # our decoder agrees bit-exactly and saw palette blocks
    PAL.STATS["maps"] = 0
    ours = decode_ivf(ivf)
    assert len(ours) == len(ref) == 1
    for pi, (a, b) in enumerate(zip(ours[0], ref[0])):
        np.testing.assert_array_equal(a, b, err_msg=f"plane {pi}")
    assert PAL.STATS["maps"] > 0, "encoder never chose palette mode"

    # quality sanity on palette-friendly content
    y = ours[0][0].astype(np.float64)
    sy = frames[0][0].astype(np.float64)
    mse = ((y - sy) ** 2).mean()
    psnr = 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)
    assert psnr > 30, psnr
