"""IntraBC (screen content) decode conformance vs stock aomenc/aomdec.

Mirrors the reference's intraBC coverage (av1/decoder/decodemv.c:692
read_intrabc_info, mvref_common.h:277 av1_is_dv_valid) using aomenc
--tune-content=screen --enable-intrabc=1 streams as the oracle source.
"""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decoder as DEC
from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

ROOT = os.path.join(os.path.dirname(__file__), "..")
AOMENC = os.path.join(ROOT, ".oracle", "build", "aomenc")
AOMDEC = os.path.join(ROOT, ".oracle", "build", "aomdec")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(AOMENC) and os.path.exists(AOMDEC)),
    reason="aom oracle not built")


def _repeating_frames(w, h, n_frames, seed=11):
    """Tiled repeating glyph-like content: intraBC's home turf."""
    rng = np.random.default_rng(seed)
    # a small bank of 16x16 "glyphs" repeated across the frame
    glyphs = rng.integers(0, 255, (6, 16, 16)).astype(np.uint8)
    gy = rng.integers(0, 6, (h // 16, w // 16))
    frames = []
    for i in range(n_frames):
        y = np.block([[glyphs[gy[r, cc]] for cc in range(w // 16)]
                      for r in range(h // 16)])
        u = np.full((h // 2, w // 2), 120 + 3 * i, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y[:h, :w], u, v))
    return frames


def test_intrabc_allintra(tmp_path):
    w, h = 192, 128
    frames = _repeating_frames(w, h, 2)
    src = str(tmp_path / "s.y4m")
    ivf = str(tmp_path / "i.ivf")
    write_y4m(src, frames, w, h)
    subprocess.run(
        [AOMENC, "--codec=av1", "--ivf", "-o", ivf, "--cpu-used=5",
         "--end-usage=q", "--cq-level=16", "--passes=1", "--lag-in-frames=0",
         "--tune-content=screen", "--enable-intrabc=1", "--threads=1",
         "--kf-max-dist=1", "--kf-min-dist=1", "--aq-mode=0",
         "--enable-chroma-deltaq=0", src],
        check=True, capture_output=True)
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True, capture_output=True)
    DEC.INTRABC_STATS["blocks"] = 0
    ours = decode_ivf(ivf)
    ref = read_y4m(out)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {pi}")
    assert DEC.INTRABC_STATS["blocks"] > 0, "stream never used intraBC"


def test_intrabc_encode(tmp_path):
    """Our intraBC encoder (hash-DV search): streams decode in stock
    aomdec and match our decoder; intraBC blocks actually used."""
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf

    w, h = 192, 128
    frames = _repeating_frames(w, h, 1, seed=13)
    ivf = str(tmp_path / "ours.ivf")
    encode_lossy_ivf(ivf, frames, w, h, qindex=40, screen=True,
                     intrabc=True)
    out = str(tmp_path / "dec.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    DEC.INTRABC_STATS["blocks"] = 0
    ours = decode_ivf(ivf)
    assert len(ours) == len(ref) == 1
    for pi, (a, b) in enumerate(zip(ours[0], ref[0])):
        np.testing.assert_array_equal(a, b, err_msg=f"plane {pi}")
    assert DEC.INTRABC_STATS["blocks"] > 0, "encoder never chose intraBC"

    # quality sanity on copy-friendly content
    y = ours[0][0].astype(np.float64)
    sy = frames[0][0].astype(np.float64)
    mse = ((y - sy) ** 2).mean()
    psnr = 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)
    assert psnr > 30, psnr
