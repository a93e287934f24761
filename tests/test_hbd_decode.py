"""High-bitdepth (10/12-bit) decoder conformance vs stock aomenc/aomdec.

Mirrors the reference's high-bitdepth coverage (av1_highbd_* kernel
variants throughout aom_dsp/, test/av1_inv_txfm2d_test.cc HBD cases):
streams produced by the stock encoder at 10- and 12-bit must decode
bit-exactly, including inter frames with CDEF and loop restoration.
"""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import write_y4m

ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build")
AOMENC = os.path.join(ORACLE, "aomenc")
AOMDEC = os.path.join(ORACLE, "aomdec")

pytestmark = pytest.mark.skipif(not os.path.exists(AOMENC),
                                reason="aomenc oracle not built")


def _hbd_frames(w, h, n, bd, seed=0):
    rng = np.random.default_rng(seed)
    maxv = (1 << bd) - 1
    base = (np.linspace(0, maxv, h)[:, None]
            + np.linspace(0, maxv // 3, w)[None, :])
    frames = []
    for i in range(n):
        y = np.clip(np.roll(base, i * 3, axis=1)
                    + rng.integers(-maxv // 32, maxv // 32, (h, w)),
                    0, maxv).astype(np.uint16)
        u = np.clip(maxv // 2 + rng.integers(-maxv // 24, maxv // 24,
                                             (h // 2, w // 2)),
                    0, maxv).astype(np.uint16)
        v = np.clip(maxv // 2 - 40 + rng.integers(-maxv // 24, maxv // 24,
                                                  (h // 2, w // 2)),
                    0, maxv).astype(np.uint16)
        frames.append((y, u, v))
    return frames


def _decode_ref_raw(ivf, w, h, n, tmp_path):
    raw = str(tmp_path / "ref.raw")
    subprocess.run([AOMDEC, ivf, "-o", raw, "--rawvideo"], check=True,
                   capture_output=True)
    data = open(raw, "rb").read()
    fsz = (w * h + 2 * (w // 2) * (h // 2)) * 2
    out = []
    for i in range(n):
        off = i * fsz
        y = np.frombuffer(data[off:off + w * h * 2], "<u2").reshape(h, w)
        off += w * h * 2
        csz = (w // 2) * (h // 2) * 2
        u = np.frombuffer(data[off:off + csz], "<u2").reshape(h // 2, w // 2)
        off += csz
        v = np.frombuffer(data[off:off + csz], "<u2").reshape(h // 2, w // 2)
        out.append((y, u, v))
    return out


@pytest.mark.parametrize("bd,profile,nframes", [(10, 0, 6), (12, 2, 3)])
def test_hbd_inter_decode_bit_exact(tmp_path, bd, profile, nframes):
    w, h = 112, 80
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "out.ivf")
    frames = _hbd_frames(w, h, nframes, bd, seed=bd)
    write_y4m(src, frames, w, h, bit_depth=bd)
    subprocess.run(
        [AOMENC, src, "-o", ivf, f"--bit-depth={bd}",
         f"--profile={profile}", "--cpu-used=6", "--end-usage=q",
         "--cq-level=40", "--passes=1", "--lag-in-frames=0",
         "--threads=1"], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = _decode_ref_raw(ivf, w, h, len(ours), tmp_path)
    assert len(ours) == nframes
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi in range(3):
            assert o[pi].dtype == np.uint16
            np.testing.assert_array_equal(o[pi], r[pi],
                                          err_msg=f"frame {i} plane {pi}")


def test_hbd_allintra_decode_bit_exact(tmp_path):
    w, h, bd = 64, 48, 10
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "out.ivf")
    frames = _hbd_frames(w, h, 3, bd, seed=7)
    write_y4m(src, frames, w, h, bit_depth=bd)
    subprocess.run(
        [AOMENC, src, "-o", ivf, "--bit-depth=10", "--profile=0",
         "--cpu-used=6", "--end-usage=q", "--cq-level=30",
         "--kf-max-dist=1", "--passes=1", "--lag-in-frames=0"],
        check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = _decode_ref_raw(ivf, w, h, len(ours), tmp_path)
    for o, r in zip(ours, ref):
        for pi in range(3):
            np.testing.assert_array_equal(o[pi], r[pi])
