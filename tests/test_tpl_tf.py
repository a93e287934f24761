"""TPL dependency model + ALTREF temporal filter."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder.gop import encode_gop_ivf
from aom_av1_lavish_tpu.encoder.temporal_filter import temporal_filter
from aom_av1_lavish_tpu.encoder.tpl import tpl_gf_group, tpl_q_offset
from aom_av1_lavish_tpu.utils.y4m import read_y4m

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")
HAVE_ORACLE = os.path.exists(AOMDEC)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else 99.0


def _noisy_seq(n=5, w=128, h=96, sigma=8, motion=0):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    clean = [(128 + 80 * np.sin((xx + motion * i) / 19.0)
              * np.cos(yy / 13.0)).clip(0, 255) for i in range(n)]
    frames = [((c + rng.normal(0, sigma, (h, w))).clip(0, 255)
               .astype(np.uint8),
               np.full((h // 2, w // 2), 110, np.uint8),
               np.full((h // 2, w // 2), 140, np.uint8))
              for c in clean]
    return clean, frames


@pytest.mark.parametrize("motion", [0, 3])
def test_temporal_filter_denoises(motion):
    """MC-aligned multi-frame average must beat the raw noisy frame
    against the clean source, for static and moving content."""
    clean, frames = _noisy_seq(motion=motion)
    f = temporal_filter(frames, 2, 120)
    raw = _psnr(frames[2][0], clean[2])
    flt = _psnr(f[0], clean[2])
    assert flt > raw + 2.0


def test_tpl_importance_favors_arf():
    """In a group that references the ARF throughout, the ARF must
    accumulate the most dependency and earn a q boost."""
    _, frames = _noisy_seq(n=6, sigma=2, motion=2)
    importance, maps = tpl_gf_group(frames, 5)
    assert importance[5] == max(importance)
    assert importance[5] > 1.0
    assert tpl_q_offset(importance[5], 140) < 0
    assert all(m.shape == maps[0].shape for m in maps)
    assert np.all(maps[5] <= 1.0) and np.all(maps[5] >= 0.5)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_tf_tpl_gop_conformance(tmp_path):
    _, frames = _noisy_seq(n=8, sigma=5, motion=2)
    w, h = 128, 96
    ivf = str(tmp_path / "g.ivf")
    out = str(tmp_path / "g.y4m")
    encode_gop_ivf(ivf, frames, w, h, qindex=140, gf_length=8,
                   enable_tf=True, enable_tpl=True)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    assert len(ours) == len(ref)
    for o, r in zip(ours, ref):
        for a, b in zip(o, r):
            np.testing.assert_array_equal(a, b)
