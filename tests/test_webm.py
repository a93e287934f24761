"""WebM container mux/demux (common/webmenc.cc / webmdec.cc analog)."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream.ivf import read_ivf
from aom_av1_lavish_tpu.decoder import decode_frame_obus
from aom_av1_lavish_tpu.encoder import (encode_lossless_ivf,
                                        make_sequence_header)
from aom_av1_lavish_tpu.utils import webm as WEBM
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

ROOT = os.path.join(os.path.dirname(__file__), "..")
AOMENC = os.path.join(ROOT, ".oracle", "build", "aomenc")
AOMDEC = os.path.join(ROOT, ".oracle", "build", "aomdec")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(AOMENC) and os.path.exists(AOMDEC)),
    reason="aom oracle not built")


def _frames(w, h, n=2, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        base = rng.integers(0, 255, (h // 16, w // 16))
        y = np.kron(base, np.ones((16, 16))).astype(np.uint8)
        u = rng.integers(90, 170, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(90, 170, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


def _decode_tus(tus):
    sh = None
    state = {"slots": [None] * 8}
    frames = []
    for tu in tus:
        fr, sh = decode_frame_obus(tu, sh, state)
        frames.extend(fr)
    return frames


def test_webm_mux_aomdec_accepts(tmp_path):
    w, h = 128, 96
    frames = _frames(w, h)
    ivf = str(tmp_path / "a.ivf")
    encode_lossless_ivf(ivf, frames, w, h)
    tus = [p for p, _ in read_ivf(ivf)]
    wb = str(tmp_path / "a.webm")
    WEBM.write_webm(wb, tus, make_sequence_header(w, h))
    out = str(tmp_path / "a.y4m")
    subprocess.run([AOMDEC, "-o", out, wb], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    assert len(ref) == len(frames)
    for g, f in zip(ref, frames):
        for a, b in zip(g, f):
            np.testing.assert_array_equal(a, b)
    # our own demuxer round-trips too
    got = _decode_tus(WEBM.read_webm(wb))
    assert len(got) == len(frames)
    for g, f in zip(got, frames):
        for a, b in zip(g, f):
            np.testing.assert_array_equal(a, b)


def test_webm_demux_aomenc_output(tmp_path):
    w, h = 176, 144
    frames = _frames(w, h, n=3, seed=6)
    src = str(tmp_path / "s.y4m")
    write_y4m(src, frames, w, h)
    wb = str(tmp_path / "e.webm")
    subprocess.run(
        [AOMENC, "--enable-chroma-deltaq=0", "--aq-mode=0", "--lossless=1",
         "--codec=av1", "--webm", "-o", wb, "--cpu-used=6", "--threads=1",
         "--passes=1", "--lag-in-frames=0", src],
        check=True, capture_output=True)
    got = _decode_tus(WEBM.read_webm(wb))
    assert len(got) == len(frames)
    for g, f in zip(got, frames):
        for a, b in zip(g, f):
            np.testing.assert_array_equal(a, b)
