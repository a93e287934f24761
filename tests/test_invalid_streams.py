"""Invalid-bitstream robustness (test/invalid_file_test.cc analog):
corrupt/truncated input must raise CorruptFrameError, never leak
internal failures, and already-decoded frames stay intact."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream.ivf import read_ivf
from aom_av1_lavish_tpu.decoder import CorruptFrameError, decode_frame_obus
from aom_av1_lavish_tpu.utils.y4m import write_y4m

AOMENC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomenc")

pytestmark = pytest.mark.skipif(not os.path.exists(AOMENC),
                                reason="aomenc oracle not built")


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    d = tmp_path_factory.mktemp("iv")
    rng = np.random.default_rng(0)
    w, h = 128, 96
    frames = []
    for i in range(3):
        y = np.kron(rng.integers(0, 255, (h // 16, w // 16)),
                    np.ones((16, 16))).astype(np.uint8)
        u = rng.integers(90, 170, (h // 2, w // 2)).astype(np.uint8)
        frames.append((y, u, u.copy()))
    src = str(d / "s.y4m")
    ivf = str(d / "o.ivf")
    write_y4m(src, frames, w, h)
    subprocess.run(
        [AOMENC, "--enable-chroma-deltaq=0", "--aq-mode=0", "--codec=av1",
         "--ivf", "-o", ivf, "--cpu-used=6", "--end-usage=q",
         "--cq-level=30", "--passes=1", "--lag-in-frames=0",
         "--threads=1", src],
        check=True, capture_output=True)
    return [p for p, _ in read_ivf(ivf)]


def _decode_all(tus):
    sh = None
    state = {"slots": [None] * 8}
    n = 0
    for tu in tus:
        fr, sh = decode_frame_obus(tu, sh, state)
        n += len(fr)
    return n


def test_clean_stream_ok(stream):
    assert _decode_all(stream) == 3


def test_truncated_payloads(stream):
    for cut in (1, 7, len(stream[0]) // 2):
        bad = [stream[0][:-cut]] + stream[1:]
        with pytest.raises(CorruptFrameError):
            _decode_all(bad)


def test_bitflips_raise_cleanly(stream):
    """Flip bytes across the first TU: every failure mode must surface
    as CorruptFrameError (decoding may also survive with wrong pixels —
    that is legal — but it must never raise anything else)."""
    failures = 0
    for pos in range(3, min(len(stream[0]), 300), 13):
        bad = bytearray(stream[0])
        bad[pos] ^= 0xA5
        try:
            _decode_all([bytes(bad)] + stream[1:])
        except CorruptFrameError:
            failures += 1
    assert failures > 0   # at least some corruptions must be detected


def test_garbage_input():
    with pytest.raises(CorruptFrameError):
        decode_frame_obus(b"\x12\x34\x56\x78" * 20)


def test_missing_reference_frame(stream):
    # inter frame without its reference: clean error, not a crash
    with pytest.raises(CorruptFrameError):
        _decode_all(stream[1:])
