"""Raw-OBU and Annex-B stream I/O (spec Annex B; obudec.c analog)."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream.ivf import read_ivf
from aom_av1_lavish_tpu.bitstream import obu as OBU
from aom_av1_lavish_tpu.decoder import decode_frame_obus
from aom_av1_lavish_tpu.encoder import encode_lossless_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

ROOT = os.path.join(os.path.dirname(__file__), "..")
AOMENC = os.path.join(ROOT, ".oracle", "build", "aomenc")
AOMDEC = os.path.join(ROOT, ".oracle", "build", "aomdec")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(AOMENC) and os.path.exists(AOMDEC)),
    reason="aom oracle not built")


def _frames(w, h, n=2, seed=0):
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


def test_annexb_roundtrip_and_aomdec(tmp_path):
    w, h = 128, 96
    frames = _frames(w, h)
    ivf = str(tmp_path / "a.ivf")
    encode_lossless_ivf(ivf, frames, w, h)
    tus = [p for p, _ in read_ivf(ivf)]

    annexb = str(tmp_path / "a.obu")
    OBU.write_annexb(annexb, tus)
    # our reader round-trips
    got = _decode_tus(OBU.read_annexb(annexb))
    assert len(got) == len(frames)
    for g, f in zip(got, frames):
        for a, b in zip(g, f):
            np.testing.assert_array_equal(a, b)
    # stock aomdec accepts our annex-b framing
    out = str(tmp_path / "a.y4m")
    subprocess.run([AOMDEC, "--annexb", "-o", out, annexb], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    assert len(ref) == len(frames)
    for g, f in zip(ref, frames):
        for a, b in zip(g, f):
            np.testing.assert_array_equal(a, b)


def test_read_aomenc_annexb_and_obu(tmp_path):
    w, h = 176, 144
    frames = _frames(w, h, n=3, seed=2)
    src = str(tmp_path / "s.y4m")
    write_y4m(src, frames, w, h)
    for annexb in (0, 1):
        path = str(tmp_path / f"e{annexb}.obu")
        subprocess.run(
            [AOMENC, "--enable-chroma-deltaq=0", "--aq-mode=0",
             "--lossless=1", "--codec=av1", "--obu",
             f"--annexb={annexb}", "-o", path, "--cpu-used=6",
             "--threads=1", "--passes=1", "--lag-in-frames=0", src],
            check=True, capture_output=True)
        tus = (OBU.read_annexb(path) if annexb
               else OBU.read_obu_file(path))
        got = _decode_tus(tus)
        assert len(got) == len(frames)
        for g, f in zip(got, frames):
            for a, b in zip(g, f):
                np.testing.assert_array_equal(a, b)
