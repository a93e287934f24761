"""ML helpers (models/): NN inference engine + learned partition
pruning speed feature (ml.c / partition_strategy.c analogs)."""

import os
import subprocess
import time

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf
from aom_av1_lavish_tpu.models.nn import NNConfig, nn_predict, nn_softmax
from aom_av1_lavish_tpu.models.partition_prune import (block_features,
                                                       prob_split)
from aom_av1_lavish_tpu.utils.y4m import read_y4m

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")


def test_nn_engine():
    w1 = np.array([[1.0, -1.0], [0.5, 2.0]], np.float32)
    b1 = np.array([0.0, 1.0], np.float32)
    w2 = np.array([[1.0], [1.0]], np.float32)
    b2 = np.array([-0.5], np.float32)
    cfg = NNConfig(layers=((w1, b1), (w2, b2)))
    out = nn_predict(cfg, [1.0, 2.0])
    # hidden = relu([1*1+2*0.5, -1+4+1]) = [2, 4]; out = 6 - 0.5
    assert np.allclose(out, [[5.5]])
    sm = nn_softmax([[0.0, 0.0, np.log(2.0)]])
    assert np.allclose(sm, [[0.25, 0.25, 0.5]])
    # batched eval equals per-row eval
    feats = np.random.default_rng(0).normal(size=(5, 2))
    batch = nn_predict(cfg, feats)
    rows = np.concatenate([nn_predict(cfg, f) for f in feats])
    assert np.allclose(batch, rows)


def test_prune_model_sane():
    rng = np.random.default_rng(0)
    flat = np.full((64, 64), 128, np.uint8)
    noisy = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    half = flat.copy()
    half[:32, :32] = noisy[:32, :32]
    p_flat = prob_split(block_features(flat, 0, 0, 64, 60))
    p_mixed = prob_split(block_features(half, 0, 0, 64, 60))
    assert p_flat < 0.5
    assert p_mixed > p_flat


@pytest.mark.skipif(not os.path.exists(AOMDEC),
                    reason="aomdec oracle not built")
def test_speed1_faster_and_conformant(tmp_path):
    rng = np.random.default_rng(4)
    w, h = 192, 128
    y = np.kron(rng.integers(0, 255, (h // 32, w // 32)),
                np.ones((32, 32))).astype(np.uint8)
    y[:, w // 2:] = rng.integers(0, 256, (h, w // 2))
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    frames = [(y, u, v)]

    def run(speed, path):
        t0 = time.perf_counter()
        encode_lossy_ivf(path, frames, w, h, qindex=70, speed=speed)
        return time.perf_counter() - t0

    p0 = str(tmp_path / "s0.ivf")
    p1 = str(tmp_path / "s1.ivf")
    t0 = run(0, p0)
    t1 = run(1, p1)
    assert t1 < t0, (t0, t1)

    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, p1], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(p1)
    for pi, (a, b) in enumerate(zip(ours[0], ref[0])):
        np.testing.assert_array_equal(a, b, err_msg=f"plane {pi}")

    def psnr(path):
        dec = decode_ivf(path)[0][0].astype(np.float64)
        mse = ((dec - y.astype(np.float64)) ** 2).mean()
        return 10 * np.log10(255 ** 2 / mse)

    assert psnr(p1) > psnr(p0) - 0.6, (psnr(p0), psnr(p1))


@pytest.mark.skipif(not os.path.exists(AOMDEC),
                    reason="aomdec oracle not built")
def test_perceptual_tunes(tmp_path):
    """tune=butteraugli/vmaf: trial-encode rdmult scaling improves the
    perceptual metric at comparable rate (tune_butteraugli.c flow)."""
    from aom_av1_lavish_tpu.dsp.butteraugli import butteraugli_score
    from aom_av1_lavish_tpu.utils.y4m import read_y4m

    rng = np.random.default_rng(8)
    w, h = 192, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = (110 + 60 * np.sin(xx / 19.0)).astype(np.uint8)     # smooth
    y[:, w // 2:] = rng.integers(0, 256, (h, w // 2))       # textured
    u = np.full((h // 2, w // 2), 120, np.uint8)
    frames = [(y, u, u.copy())]

    scores = {}
    sizes = {}
    for tune in ("psnr", "butteraugli", "vmaf"):
        path = str(tmp_path / f"{tune}.ivf")
        encode_lossy_ivf(path, frames, w, h, qindex=120, tune=tune)
        out = str(tmp_path / f"{tune}.y4m")
        subprocess.run([AOMDEC, "-o", out, path], check=True,
                       capture_output=True)
        rec = read_y4m(out)[0][0][0]
        scores[tune] = butteraugli_score(y, rec)
        sizes[tune] = os.path.getsize(path)

    # perceptual tunes shift bits toward visible areas
    assert scores["butteraugli"] < scores["psnr"], scores
    # and stay in a sane rate envelope
    assert sizes["butteraugli"] < 2.0 * sizes["psnr"]
    assert sizes["vmaf"] < 2.0 * sizes["psnr"]
