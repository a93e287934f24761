"""RTC path: variance-based partitioning + non-RD pickmode
(var_based_part.c / nonrd_pickmode.c analogs)."""

import os
import subprocess
import time

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder.inter import encode_lowdelay_ivf
from aom_av1_lavish_tpu.encoder.nonrd import encode_realtime_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")


def _clip(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    big = np.kron(rng.integers(20, 235, (64, 80)).astype(np.uint8),
                  np.ones((8, 8), np.uint8))
    frames = []
    for i in range(n):
        y = big[2 * i:2 * i + h, 3 * i:3 * i + w].copy()
        # a moving textured square forces splits in its SBs
        y[40:72, 40 + 4 * i:72 + 4 * i] = rng.integers(0, 256, (32, 32))
        u = np.full((h // 2, w // 2), 118, np.uint8)
        frames.append((y, u, u.copy()))
    return frames


@pytest.mark.skipif(not os.path.exists(AOMDEC),
                    reason="aomdec oracle not built")
def test_realtime_conformance_and_speed(tmp_path):
    w, h = 192, 144
    frames = _clip(w, h, 4)
    rt = str(tmp_path / "rt.ivf")
    ld = str(tmp_path / "ld.ivf")

    t0 = time.perf_counter()
    encode_realtime_ivf(rt, frames, w, h, qindex=90)
    t_rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    encode_lowdelay_ivf(ld, frames, w, h, qindex=90)
    t_ld = time.perf_counter() - t0

    # conformance vs stock aomdec
    out = str(tmp_path / "rt.y4m")
    subprocess.run([AOMDEC, "-o", out, rt], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(rt)
    assert len(ours) == len(ref) == len(frames)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {pi}")

    # non-RD must be much faster than the RD low-delay path
    assert t_rt < 0.7 * t_ld, (t_rt, t_ld)

    # quality floor on P frames
    y = ours[-1][0].astype(np.float64)
    sy = frames[-1][0].astype(np.float64)
    mse = ((y - sy) ** 2).mean()
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 26, psnr


@pytest.mark.skipif(not os.path.exists(AOMDEC),
                    reason="oracle not built")
def test_cyclic_refresh_aq(tmp_path):
    """aq_mode=3 (aq_cyclicrefresh.c analog): rotating per-SB q boost
    signaled via inter delta-q; stock aomdec decodes identically."""
    import subprocess
    from aom_av1_lavish_tpu.utils.y4m import read_y4m
    rng = np.random.default_rng(0)
    W, H, N = 176, 144, 5
    yy, xx = np.mgrid[0:H + 16, 0:W + 16]
    base = (120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
            + rng.normal(0, 3, yy.shape)).clip(0, 255).astype(np.uint8)
    frames = [(np.ascontiguousarray(base[i:i + H, 2 * i:2 * i + W]),
               rng.integers(100, 150, (H // 2, W // 2)).astype(np.uint8),
               rng.integers(100, 150, (H // 2, W // 2)).astype(np.uint8))
              for i in range(N)]
    ivf = str(tmp_path / "rt.ivf")
    out = str(tmp_path / "d.y4m")
    encode_realtime_ivf(ivf, frames, W, H, 100, aq_mode=3)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    refs = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    assert len(ours) == len(refs) == N
    for a, b in zip(ours, refs):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


def test_temporal_denoiser():
    """encoder/denoiser.py: noisy static content must cost fewer bits
    with the RT denoiser at equal q, and the stream stays decodable
    (av1_temporal_denoiser.c analog)."""
    import tempfile
    from aom_av1_lavish_tpu.encoder.denoiser import (denoise_frame,
                                                     estimate_noise_level)
    rng = np.random.default_rng(5)
    W, H, N = 176, 144, 4
    yy, xx = np.mgrid[0:H, 0:W]
    clean = (120 + 60 * np.sin(yy / 11.0) * np.cos(xx / 13.0))
    frames = [((clean + rng.normal(0, 6, (H, W))).clip(0, 255)
               .astype(np.uint8),
               np.full((H // 2, W // 2), 120, np.uint8),
               np.full((H // 2, W // 2), 130, np.uint8))
              for _ in range(N)]
    lvl, sigma = estimate_noise_level(frames[1][0], frames[0][0])
    assert lvl > 0 and sigma > 1.0
    d = denoise_frame(frames[1], frames[0], lvl)
    assert not np.array_equal(d[0], frames[1][0])
    with tempfile.TemporaryDirectory() as td:
        p1 = os.path.join(td, "n.ivf")
        p2 = os.path.join(td, "d.ivf")
        encode_realtime_ivf(p1, frames, W, H, 100)
        encode_realtime_ivf(p2, frames, W, H, 100, denoise=True)
        assert os.path.getsize(p2) < os.path.getsize(p1)
        assert len(decode_ivf(p2)) == N
