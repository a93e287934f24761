"""Quantizer-matrix (QM) conformance.

Decode: aomenc --enable-qm=1 streams must decode bit-exactly
(av1/common/quant_common.c av1_qm_init / get_dqv weighting).
Encode: our QM streams must decode identically in stock aomdec.
"""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

ROOT = os.path.join(os.path.dirname(__file__), "..")
AOMENC = os.path.join(ROOT, ".oracle", "build", "aomenc")
AOMDEC = os.path.join(ROOT, ".oracle", "build", "aomdec")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(AOMENC) and os.path.exists(AOMDEC)),
    reason="aom oracle not built")


def _frames(w, h, n, seed=2):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = (128 + 70 * np.sin((xx + 5 * i) / 13.0) * np.cos(yy / 11.0)
             + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        u = ((xx[::2, ::2] + i) % 200 + 20).astype(np.uint8)
        v = ((yy[::2, ::2] * 2 + i) % 200 + 20).astype(np.uint8)
        frames.append((y, u, v))
    return frames


@pytest.mark.parametrize("extra", [
    ["--kf-max-dist=1", "--kf-min-dist=1"],          # all intra
    ["--kf-max-dist=9999"],                          # inter
])
def test_qm_decode(tmp_path, extra):
    w, h = 176, 144
    frames = _frames(w, h, 3)
    src = str(tmp_path / "s.y4m")
    ivf = str(tmp_path / "q.ivf")
    write_y4m(src, frames, w, h)
    subprocess.run(
        [AOMENC, "--codec=av1", "--ivf", "-o", ivf, "--cpu-used=5",
         "--end-usage=q", "--cq-level=30", "--passes=1", "--lag-in-frames=0",
         "--enable-qm=1", "--qm-min=4", "--qm-max=9", "--threads=1",
         "--aq-mode=0", "--enable-chroma-deltaq=0"] + extra + [src],
        check=True, capture_output=True)
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(out)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {pi}")


def test_qm_encode(tmp_path):
    """Our encoder with QM enabled: stock aomdec and our decoder agree."""
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf

    w, h = 128, 96
    frames = _frames(w, h, 1, seed=7)
    ivf = str(tmp_path / "ours.ivf")
    encode_lossy_ivf(ivf, frames, w, h, qindex=60, qm=(5, 7, 7))
    out = str(tmp_path / "dec.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    for pi, (a, b) in enumerate(zip(ours[0], ref[0])):
        np.testing.assert_array_equal(a, b, err_msg=f"plane {pi}")
    y = ours[0][0].astype(np.float64)
    mse = ((y - frames[0][0].astype(np.float64)) ** 2).mean()
    assert mse < 200, mse
