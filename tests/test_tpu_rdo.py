"""Device-RDO all-intra encoder: prediction exactness, conformance,
quality parity with the host search."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import constants as c
from aom_av1_lavish_tpu.common import intra as I

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")
HAVE_ORACLE = os.path.exists(AOMDEC)


def _frames(w, h, n=1, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        base = rng.integers(0, 255, (h // 16 + 1, w // 16 + 1))
        y = np.kron(base, np.ones((16, 16)))[:h, :w]
        y = (y + rng.integers(-8, 9, (h, w))).clip(0, 255).astype(np.uint8)
        u = rng.integers(90, 170, ((h + 1) // 2, (w + 1) // 2)) \
            .astype(np.uint8)
        v = rng.integers(90, 170, ((h + 1) // 2, (w + 1) // 2)) \
            .astype(np.uint8)
        out.append((y, u, v))
    return out


def test_mode_matrix_matches_host_predictors():
    """Every linear trial mode's edge-matrix product must reproduce the
    host (normative, filter-free) predictor bit-exactly."""
    from aom_av1_lavish_tpu.ops import rdo_intra as R
    rng = np.random.default_rng(1)
    for (bw, bh) in ((8, 8), (16, 16), (16, 8), (32, 16)):
        reach = bw + bh + 1
        above = rng.integers(0, 256, reach).astype(np.int32)
        left = rng.integers(0, 256, reach).astype(np.int32)
        tl = int(rng.integers(0, 256))
        e = np.concatenate([[tl], above, left]).astype(np.float64)
        G_lin = R.mode_matrix(bw, bh)
        modes = [m for m in R.trial_mode_list() if m[0] != c.DC_PRED]
        for mi, (m, d) in enumerate(modes):
            acc = e @ G_lin[mi]
            pred = np.floor((acc + 256) / 512).astype(np.int32) \
                .reshape(bh, bw)
            if m == c.SMOOTH_PRED:
                ref = I._smooth(bw, bh, above, left, np.int32)
            elif m == c.SMOOTH_V_PRED:
                ref = I._smooth_v(bw, bh, above, left, np.int32)
            elif m == c.SMOOTH_H_PRED:
                ref = I._smooth_h(bw, bh, above, left, np.int32)
            else:
                ang = I.MODE_TO_ANGLE[m] + d * I.ANGLE_STEP
                if ang == 90:
                    ref = np.broadcast_to(above[:bw], (bh, bw))
                elif ang == 180:
                    ref = np.broadcast_to(left[:bh, None], (bh, bw))
                elif ang < 90:
                    ref = I._dr_z1(bw, bh, above, 0, I.get_dx(ang),
                                   np.int32)
                elif ang > 180:
                    ref = I._dr_z3(bw, bh, left, 0, I.get_dy(ang),
                                   np.int32)
                else:
                    ad = np.concatenate([[left[0], tl], above])
                    ld = np.concatenate([[above[0], tl], left])
                    ref = I._dr_z2(bw, bh, ad, ld, 2, 0, 0,
                                   I.get_dx(ang), I.get_dy(ang), np.int32)
            assert np.array_equal(pred, ref), (bw, bh, m, d)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
@pytest.mark.parametrize("dims,q", [((176, 144), 80), ((150, 98), 40),
                                    ((64, 64), 140)])
def test_tpu_rdo_conformance_aomdec(tmp_path, dims, q):
    from aom_av1_lavish_tpu.encoder.tpu_rdo import encode_tpu_rdo_ivf
    w, h = dims
    frames = _frames(w, h)
    path = str(tmp_path / "a.ivf")
    encode_tpu_rdo_ivf(path, frames, w, h, qindex=q)
    out = str(tmp_path / "a.yuv")
    r = subprocess.run([AOMDEC, "--rawvideo", "-o", out, path],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    data = np.fromfile(out, np.uint8)
    y = data[:w * h].reshape(h, w)
    # decoded output must match our own decoder's recon bit-exactly
    from aom_av1_lavish_tpu.decoder.decoder import decode_ivf
    ours = decode_ivf(path)
    assert np.array_equal(y, np.asarray(ours[0][0])[:h, :w])


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_tpu_rdo_quality_parity(tmp_path):
    """Device decisions (source-edge trials) must land within 0.5 dB /
    8% size of the host recon-edge search at the same qindex."""
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf
    from aom_av1_lavish_tpu.encoder.tpu_rdo import encode_tpu_rdo_ivf
    w, h = 176, 144
    frames = _frames(w, h, n=2)
    pd = str(tmp_path / "d.ivf")
    ph = str(tmp_path / "h.ivf")
    encode_tpu_rdo_ivf(pd, frames, w, h, qindex=80)
    encode_lossy_ivf(ph, frames, w, h, qindex=80)

    def psnr(path):
        out = path + ".yuv"
        subprocess.run([AOMDEC, "--rawvideo", "-o", out, path],
                       capture_output=True, check=True)
        data = np.fromfile(out, np.uint8)
        fs = w * h * 3 // 2
        mse = 0.0
        for i, f in enumerate(frames):
            y = data[i * fs:i * fs + w * h].reshape(h, w)
            mse += np.mean((y.astype(np.float64) - f[0]) ** 2)
        return 10 * np.log10(255.0 ** 2 / (mse / len(frames)))

    p_dev, p_host = psnr(pd), psnr(ph)
    s_dev, s_host = os.path.getsize(pd), os.path.getsize(ph)
    assert p_dev > p_host - 0.5, (p_dev, p_host)
    assert s_dev < s_host * 1.08, (s_dev, s_host)


def test_tpu_rdo_min8_and_speed(tmp_path):
    """min_bsize=8 DP + speed=1 pruning still produce decodable
    streams (self-decoder check only; aomdec covered above)."""
    from aom_av1_lavish_tpu.decoder.decoder import decode_ivf
    from aom_av1_lavish_tpu.encoder.tpu_rdo import encode_tpu_rdo_ivf
    w, h = 96, 80
    frames = _frames(w, h)
    path = str(tmp_path / "m8.ivf")
    encode_tpu_rdo_ivf(path, frames, w, h, qindex=60,
                       block_size=c.BLOCK_8X8, speed=1)
    outs = decode_ivf(path)
    assert len(outs) == 1
