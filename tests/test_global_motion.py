"""Encoder-side global motion: estimation, header coding, GLOBALMV warp.

Reference analog: av1/encoder/global_motion_facade.c +
av1/encoder/bitstream.c write_global_motion_params; validated by
decoding in stock aomdec.
"""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import constants as c
from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder.global_motion import estimate_global_motion
from aom_av1_lavish_tpu.encoder.inter import encode_lowdelay_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")
HAVE_ORACLE = os.path.exists(AOMDEC)


def _pan_frames(w, h, n, dy=2, dx=-3, seed=0):
    """Textured scene panning (dy, dx) per frame."""
    rng = np.random.default_rng(seed)
    big = np.kron(rng.integers(10, 245, (128, 160)).astype(np.uint8),
                  np.ones((8, 8), np.uint8))
    big = (big.astype(np.int32)
           + rng.integers(-4, 5, big.shape)).clip(0, 255).astype(np.uint8)
    bigu = np.kron(rng.integers(60, 200, (64, 80)).astype(np.uint8),
                   np.ones((8, 8), np.uint8))
    y0, x0 = 200, 220
    frames = []
    for i in range(n):
        oy, ox = y0 + dy * i, x0 + dx * i
        y = big[oy:oy + h, ox:ox + w]
        u = bigu[(oy // 2):(oy // 2) + h // 2,
                 (ox // 2):(ox // 2) + w // 2]
        v = bigu[(oy // 2) + 5:(oy // 2) + 5 + h // 2,
                 (ox // 2) + 3:(ox // 2) + 3 + w // 2]
        frames.append((y, u, v))
    return frames


def test_gm_estimation_translation():
    frames = _pan_frames(352, 288, 2, dy=4, dx=-6)
    gm = estimate_global_motion(frames[1][0], frames[0][0])
    assert gm[0] != c.IDENTITY
    # translation recovered at 1/64-pel precision
    assert abs(gm[1][0] / 65536 - 4) <= 0.5
    assert abs(gm[1][1] / 65536 + 6) <= 0.5


def test_gm_header_roundtrip():
    """gm params written by the encoder parse back identically."""
    from aom_av1_lavish_tpu.bitstream import headers as H
    from aom_av1_lavish_tpu.bitstream.bits import BitWriter, BitReader
    cases = [
        (c.TRANSLATION, (3 << 14, -(5 << 14), 65536, 0, 0, 65536), 0),
        (c.ROTZOOM, (2 << 10, -(7 << 10), 65536 + 1024, -512,
                     512, 65536 + 1024), 0),
        (c.AFFINE, (1 << 10, 2 << 10, 65536 + 2048, 100 * 2, -64 * 2,
                    65536 - 1024), 0),
    ]
    for case in cases:
        fh = H.FrameHeader(frame_type=c.INTER_FRAME,
                           allow_high_precision_mv=0)
        fh.gm_params = (case,) + ((c.IDENTITY,
                                   (0, 0, 65536, 0, 0, 65536), 0),) * 6
        w = BitWriter()
        H._write_global_motion(fh, w)
        w.byte_align()
        fh2 = H.FrameHeader(frame_type=c.INTER_FRAME,
                            allow_high_precision_mv=0)
        H._parse_global_motion(fh2, BitReader(w.data()), None)
        assert fh2.gm_params[0][0] == case[0]
        assert tuple(fh2.gm_params[0][1]) == tuple(case[1])


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_gm_encode_conformance(tmp_path):
    w, h = 192, 128
    frames = _pan_frames(w, h, 4, dy=3, dx=-5, seed=1)
    ivf_gm = str(tmp_path / "gm.ivf")
    ivf_no = str(tmp_path / "no.ivf")
    encode_lowdelay_ivf(ivf_gm, frames, w, h, qindex=80, gm=True)
    encode_lowdelay_ivf(ivf_no, frames, w, h, qindex=80, gm=False)

    out = str(tmp_path / "gm.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf_gm], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf_gm)
    assert len(ours) == len(ref) == len(frames)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {pi}")
    # global motion must not cost more than the params' header bits:
    # with trial-time MV-ref propagation, NEARESTMV chains rival
    # GLOBALMV on pure pans, so parity (not strict win) is the bar
    assert os.path.getsize(ivf_gm) <= os.path.getsize(ivf_no) + 64, \
        (os.path.getsize(ivf_gm), os.path.getsize(ivf_no))
