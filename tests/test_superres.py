"""Superres decode conformance vs stock aomenc/aomdec.

Covers the normative horizontal upscaler (resize.c:1290
av1_upscale_normative_rows), scaled-reference motion compensation
(convolve.c:395 av1_convolve_2d_scale_c, decodeframe.c:546
dec_calc_subpel_params), frame_size_with_refs, and the LR boundary-line
upscale (restoration.c save_deblock_boundary_lines).  Odd denominators
produce odd coded widths, exercising the mi-aligned last-tile source
rule (resize.c:1307).
"""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m

ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build")
AOMENC = os.path.join(ORACLE, "aomenc")
AOMDEC = os.path.join(ORACLE, "aomdec")

pytestmark = pytest.mark.skipif(not os.path.exists(AOMENC),
                                reason="aomenc oracle not built")

W, H = 128, 96


def _motion_y4m(path, n, bd=8):
    rng = np.random.default_rng(31)
    maxv = (1 << bd) - 1
    dt = "<u2" if bd > 8 else np.uint8
    tex = rng.integers(0, maxv + 1, (H + 32, W * 2)).astype(dt)
    texu = rng.integers(0, maxv + 1, ((H + 32) // 2, W)).astype(dt)
    texv = rng.integers(0, maxv + 1, ((H + 32) // 2, W)).astype(dt)
    tag = "C420p10" if bd == 10 else "C420jpeg"
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F30:1 Ip A0:0 {tag}\n".encode())
        for i in range(n):
            f.write(b"FRAME\n")
            f.write(np.ascontiguousarray(tex[i:i + H, i * 3:i * 3 + W])
                    .tobytes())
            f.write(np.ascontiguousarray(
                texu[i // 2:i // 2 + H // 2, i:i + W // 2]).tobytes())
            f.write(np.ascontiguousarray(
                texv[i // 2:i // 2 + H // 2, i:i + W // 2]).tobytes())


def _check(tmp_path, ivf, n, bd=8):
    raw = str(tmp_path / "ref.raw")
    subprocess.run([AOMDEC, ivf, "-o", raw, "--rawvideo"], check=True,
                   capture_output=True)
    data = open(raw, "rb").read()
    nb = 2 if bd > 8 else 1
    dt = "<u2" if bd > 8 else np.uint8
    fsz = (W * H + 2 * (W // 2) * (H // 2)) * nb
    ours = decode_ivf(ivf)
    assert len(ours) == n
    for i, f in enumerate(ours):
        off = i * fsz
        for pi, (ph, pw) in enumerate(((H, W), (H // 2, W // 2),
                                       (H // 2, W // 2))):
            sz = ph * pw * nb
            r = np.frombuffer(data[off:off + sz], dt).reshape(ph, pw)
            off += sz
            np.testing.assert_array_equal(f[pi], r,
                                          err_msg=f"frame {i} plane {pi}")


@pytest.mark.parametrize("denom,bd,extra", [
    (16, 8, []),                       # half-width, even coded width
    (13, 8, []),                       # odd coded width (79)
    (15, 10, ["--bit-depth=10", "--profile=0"]),
])
def test_superres_inter_decode(tmp_path, denom, bd, extra):
    n = 6
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "out.ivf")
    _motion_y4m(src, n, bd)
    subprocess.run(
        [AOMENC, src, "-o", ivf, "--cpu-used=6", "--end-usage=q",
         "--cq-level=36", "--passes=1", "--lag-in-frames=0",
         "--superres-mode=1", f"--superres-denominator={denom}"] + extra,
        check=True, capture_output=True)
    _check(tmp_path, ivf, n, bd)


def test_superres_random_mode(tmp_path):
    n = 8
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "out.ivf")
    _motion_y4m(src, n)
    subprocess.run(
        [AOMENC, src, "-o", ivf, "--cpu-used=6", "--end-usage=q",
         "--cq-level=36", "--passes=1", "--lag-in-frames=0",
         "--superres-mode=2"], check=True, capture_output=True)
    _check(tmp_path, ivf, n)


@pytest.mark.parametrize("denom", [9, 12, 16])
def test_superres_encode_conformance(tmp_path, denom):
    """encode_superres_ivf: coded at w*8/denom, upscale signaled;
    stock aomdec and our decoder agree pixel-exactly
    (av1_superres_post_encode analog, superres_scale.c:399)."""
    from aom_av1_lavish_tpu.encoder.lossy import encode_superres_ivf
    w, h = 176, 144
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx // 4 + yy // 4) * 8 % 256
         + rng.integers(-10, 11, (h, w))).clip(0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = rng.integers(100, 160, (h // 2, w // 2)).astype(np.uint8)
    ivf = str(tmp_path / "s.ivf")
    out = str(tmp_path / "d.y4m")
    encode_superres_ivf(ivf, [(y, u, v)], w, h, qindex=60, denom=denom)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0][0]
    ours = decode_ivf(ivf)[0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)
    assert _mse(ours[0], y) < 220  # quality sanity through down/up cycle


def _mse(a, b):
    return float(np.mean((a.astype(float) - b.astype(float)) ** 2))
