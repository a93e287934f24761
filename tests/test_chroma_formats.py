"""4:4:4 / 4:2:2 / monochrome decode conformance (profiles 1/2,
spec 6.4.2 color_config) vs stock aomenc/aomdec."""

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


def _frames(w, h, sub, n, seed=0):
    rng = np.random.default_rng(seed)
    sx = 2 if sub in ("420", "422") else 1
    sy = 2 if sub == "420" else 1
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = (90 + 80 * np.sin((xx + 3 * i) / 11.0) * np.cos(yy / 7.0)
             + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
        u = ((xx[::sy, ::sx] * 2 + i * 4) % 200 + 20).astype(np.uint8)
        v = ((yy[::sy, ::sx] + xx[::sy, ::sx]) % 200 + 20).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _check(tmp_path, sub, profile, extra, n=3):
    w, h = 160, 128
    frames = _frames(w, h, sub, n)
    src = str(tmp_path / "s.y4m")
    ivf = str(tmp_path / "o.ivf")
    write_y4m(src, frames, w, h, subsampling=sub)
    subprocess.run(
        [AOMENC, f"--profile={profile}", "--codec=av1", "--ivf", "-o",
         ivf, "--cpu-used=5", "--end-usage=q", "--cq-level=24",
         "--passes=1", "--lag-in-frames=0", "--threads=1", "--aq-mode=0",
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
            if b is None or (hasattr(a, "__len__") and a is None):
                continue
            if a is None:
                continue
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {pi}")


def test_444_allintra(tmp_path):
    _check(tmp_path, "444", 1, ["--kf-max-dist=1", "--kf-min-dist=1"])


def test_444_inter(tmp_path):
    _check(tmp_path, "444", 1, ["--kf-max-dist=9999"])


def test_422_allintra(tmp_path):
    _check(tmp_path, "422", 2, ["--kf-max-dist=1", "--kf-min-dist=1"])


def test_422_inter(tmp_path):
    _check(tmp_path, "422", 2, ["--kf-max-dist=9999"])


def test_monochrome(tmp_path):
    w, h = 160, 128
    frames = _frames(w, h, "420", 3, seed=5)
    src = str(tmp_path / "s.y4m")
    ivf = str(tmp_path / "m.ivf")
    write_y4m(src, frames, w, h)
    subprocess.run(
        [AOMENC, "--monochrome", "--codec=av1", "--ivf", "-o", ivf,
         "--cpu-used=5", "--end-usage=q", "--cq-level=24", "--passes=1",
         "--lag-in-frames=0", "--threads=1", "--aq-mode=0",
         "--enable-chroma-deltaq=0", src],
        check=True, capture_output=True)
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    assert len(ours) == len(ref) == 3
    for i, (o, r) in enumerate(zip(ours, ref)):
        np.testing.assert_array_equal(o[0], r[0], err_msg=f"frame {i}")


def test_444_encode(tmp_path):
    """Our encoder at 4:4:4 (profile 1): conformant vs stock aomdec."""
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf
    w, h = 96, 64
    rng = np.random.default_rng(4)
    y = np.kron(rng.integers(0, 255, (h // 16, w // 16)),
                np.ones((16, 16))).astype(np.uint8)
    u = np.kron(rng.integers(60, 200, (h // 8, w // 8)),
                np.ones((8, 8))).astype(np.uint8)
    frames = [(y, u, (255 - u))]
    ivf = str(tmp_path / "e444.ivf")
    encode_lossy_ivf(ivf, frames, w, h, qindex=60, subsampling="444")
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    assert ours[0][1].shape == (h, w)
    for pi, (a, b) in enumerate(zip(ours[0], ref[0])):
        np.testing.assert_array_equal(a, b, err_msg=f"plane {pi}")


def test_422_encode(tmp_path):
    """Our encoder at 4:2:2 (profile 2): conformant vs stock aomdec."""
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf
    w, h = 96, 64
    rng = np.random.default_rng(5)
    y = np.kron(rng.integers(0, 255, (h // 16, w // 16)),
                np.ones((16, 16))).astype(np.uint8)
    u = np.kron(rng.integers(60, 200, (h // 8, w // 16)),
                np.ones((8, 8))).astype(np.uint8)
    frames = [(y, u, (255 - u))]
    ivf = str(tmp_path / "e422.ivf")
    encode_lossy_ivf(ivf, frames, w, h, qindex=60, subsampling="422")
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    assert ours[0][1].shape == (h, w // 2)
    for pi, (a, b) in enumerate(zip(ours[0], ref[0])):
        np.testing.assert_array_equal(a, b, err_msg=f"plane {pi}")
