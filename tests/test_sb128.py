"""128x128 superblock decode conformance (chunked residual order,
spec 5.11.34; sb128 LR unit-size syntax)."""

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


def _frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        y = (120 + 70 * np.sin((xx + 3 * i) / 9.0) * np.cos(yy / 7.0)
             + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
        u = rng.integers(90, 170, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, u.copy()))
    return out


def _check(tmp_path, extra, n=3):
    w, h = 256, 192
    frames = _frames(w, h, n)
    src = str(tmp_path / "s.y4m")
    ivf = str(tmp_path / "o.ivf")
    write_y4m(src, frames, w, h)
    subprocess.run(
        [AOMENC, "--codec=av1", "--ivf", "-o", ivf, "--sb-size=128",
         "--end-usage=q", "--cq-level=30", "--passes=1",
         "--lag-in-frames=0", "--threads=1", "--aq-mode=0",
         "--enable-chroma-deltaq=0"] + extra + [src],
        check=True, capture_output=True)
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    assert len(ours) == len(ref) == n
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {pi}")


def test_sb128_whole_sb_blocks(tmp_path):
    """128x128 coding blocks: chunked, plane-interleaved residuals."""
    _check(tmp_path, ["--cpu-used=3", "--min-partition-size=128",
                      "--kf-max-dist=1", "--kf-min-dist=1",
                      "--enable-restoration=0"], n=1)


def test_sb128_intra(tmp_path):
    _check(tmp_path, ["--cpu-used=3", "--kf-max-dist=1",
                      "--kf-min-dist=1", "--enable-restoration=0"], n=2)


def test_sb128_inter(tmp_path):
    _check(tmp_path, ["--cpu-used=3", "--kf-max-dist=9999",
                      "--enable-restoration=0"])


def test_sb128_restoration(tmp_path):
    """sb128 LR unit-size shift syntax (spec 5.9.20)."""
    _check(tmp_path, ["--cpu-used=3", "--enable-restoration=1",
                      "--kf-max-dist=9999"])


def test_sb128_encode(tmp_path):
    """Our encoder with 128x128 superblocks (always-split policy):
    conformant vs stock aomdec, including restoration."""
    from aom_av1_lavish_tpu.bitstream import headers as H
    from aom_av1_lavish_tpu.bitstream.ivf import read_ivf
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf

    w, h = 192, 160   # partial 128-SBs on both axes
    frames = _frames(w, h, 1, seed=7)
    ivf = str(tmp_path / "e128.ivf")
    encode_lossy_ivf(ivf, frames, w, h, qindex=60, sb128=True,
                     enable_restoration=1)
    payload = next(iter(read_ivf(ivf)))[0]
    for t, p in H.split_obus(payload):
        if t == 1:
            assert H.parse_sequence_header(p).use_128x128_superblock == 1
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    for pi, (a, b) in enumerate(zip(ours[0], ref[0])):
        np.testing.assert_array_equal(a, b, err_msg=f"plane {pi}")
