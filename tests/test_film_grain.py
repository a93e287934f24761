"""Film grain synthesis conformance: our decode (grain applied at
output) must match stock aomdec byte-exactly on aomenc
--film-grain-test streams (grain_synthesis.c oracle)."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build")
AOMENC = os.path.join(ORACLE, "aomenc")
AOMDEC = os.path.join(ORACLE, "aomdec")

pytestmark = pytest.mark.skipif(not os.path.exists(AOMENC),
                                reason="aomenc oracle not built")


def _clip(w, h, n=4, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w + 4 * n]
    base = (120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 23.0)
            + rng.normal(0, 4, yy.shape)).clip(0, 255).astype(np.uint8)
    frames = []
    for i in range(n):
        y = np.ascontiguousarray(base[:, 4 * i:4 * i + w])
        u = ((yy[::2, ::2][:, :w // 2] * 3 + 90) % 160 + 40).astype(
            np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        frames.append((y, u, v))
    return frames


def _grain_roundtrip(tmp_path, vec, w=128, h=96, extra=()):
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "out.ivf")
    ref = str(tmp_path / "ref.y4m")
    frames = _clip(w, h)
    write_y4m(src, frames, w, h)
    subprocess.run(
        [AOMENC, "--threads=1", "--cpu-used=6", "--end-usage=q",
         "--cq-level=30", f"--film-grain-test={vec}", "--kf-max-dist=2",
         *extra, "-o", ivf, src],
        check=True, capture_output=True)
    subprocess.run([AOMDEC, ivf, "-o", ref], check=True,
                   capture_output=True)
    golden = read_y4m(ref)[0]
    ours = decode_ivf(ivf)
    assert len(ours) == len(golden) == len(frames)
    for i, ((y, u, v), (gy, gu, gv)) in enumerate(zip(ours, golden)):
        np.testing.assert_array_equal(y, gy, err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(u, gu, err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(v, gv, err_msg=f"frame {i} cr")


@pytest.mark.parametrize("vec", [1, 2, 9])
def test_film_grain_vectors(tmp_path, vec):
    """Test vectors span luma-only, chroma, overlap on/off, lags."""
    _grain_roundtrip(tmp_path, vec)


def test_film_grain_odd_size(tmp_path):
    _grain_roundtrip(tmp_path, 1, w=130, h=98)


def test_grain_encode_conformance(tmp_path):
    """Encoder-side noise model: fitted grain params signal in the frame
    header; stock aomdec output (with grain) matches our decoder."""
    import subprocess
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf
    from aom_av1_lavish_tpu.dsp.noise_model import fit_grain_params

    rng = np.random.default_rng(9)
    w, h = 128, 96
    base = np.kron(rng.integers(40, 210, (h // 16, w // 16)),
                   np.ones((16, 16)))
    y = np.clip(base + rng.normal(0, 4.0, (h, w)), 0,
                255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    frames = [(y, u, v), (y, u, v)]

    assert fit_grain_params(y) is not None

    ivf = str(tmp_path / "g.ivf")
    encode_lossy_ivf(ivf, frames, w, h, qindex=60, grain=True)
    out = str(tmp_path / "g.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    assert len(ours) == len(ref) == 2
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {pi}")
    # grain actually applied: decoded frame differs from a no-grain encode
    ivf2 = str(tmp_path / "n.ivf")
    encode_lossy_ivf(ivf2, frames, w, h, qindex=60, grain=False)
    plain = decode_ivf(ivf2)
    assert not np.array_equal(ours[0][0], plain[0][0])
