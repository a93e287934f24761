"""10-bit encoder conformance: our 10-bit streams must decode in stock
aomdec and match our own decoder bit-exactly (BASELINE config 5
prerequisite; reference hbd encode paths throughout av1/encoder/).
"""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.api import Decoder, Encoder, EncoderConfig
from aom_av1_lavish_tpu.bitstream.ivf import write_ivf

ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build")
AOMDEC = os.path.join(ORACLE, "aomdec")

pytestmark = pytest.mark.skipif(not os.path.exists(AOMDEC),
                                reason="aomdec oracle not built")


def _frames(w, h, n, seed=9):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 1023, h)[:, None] + np.linspace(0, 200, w)[None, :]
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, i * 2, axis=1)
                    + rng.integers(-40, 40, (h, w)), 0, 1023).astype(np.uint16)
        u = np.clip(512 + rng.integers(-60, 60, (h // 2, w // 2)),
                    0, 1023).astype(np.uint16)
        v = np.clip(470 + rng.integers(-60, 60, (h // 2, w // 2)),
                    0, 1023).astype(np.uint16)
        out.append((y, u, v))
    return out


def test_10bit_gop_encode_conformant(tmp_path):
    w, h, n = 96, 64, 5
    frames = _frames(w, h, n)
    cfg = EncoderConfig(width=w, height=h, qindex=100, bit_depth=10,
                        kf_interval=5, gf_length=4)
    enc = Encoder(cfg)
    for f in frames:
        enc.encode(f)
    pkts = enc.flush()
    ivf = str(tmp_path / "out10.ivf")
    write_ivf(ivf, [(p, i) for i, p in enumerate(pkts)], w, h)
    # stock decoder accepts the stream
    raw = str(tmp_path / "ref.raw")
    subprocess.run([AOMDEC, ivf, "-o", raw, "--rawvideo"], check=True,
                   capture_output=True)
    data = open(raw, "rb").read()
    fsz = (w * h + 2 * (w // 2) * (h // 2)) * 2
    assert len(data) == n * fsz
    # our decoder matches stock aomdec bit-exactly
    dec = Decoder()
    shown = []
    for p in pkts:
        shown.extend(dec.decode(p))
    assert len(shown) == n
    psnr = 0.0
    for i, f in enumerate(shown):
        ry = np.frombuffer(data[i * fsz:i * fsz + w * h * 2],
                           "<u2").reshape(h, w)
        np.testing.assert_array_equal(f[0], ry)
        mse = ((frames[i][0].astype(float) - ry.astype(float)) ** 2).mean()
        psnr += 10 * np.log10(1023 ** 2 / max(mse, 1e-9))
    assert psnr / n > 26.0


@pytest.mark.parametrize("bd", [10, 12])
def test_hbd_lossless(tmp_path, bd):
    """10/12-bit lossless: bit-exact through our decoder AND aomdec."""
    from aom_av1_lavish_tpu.api import Decoder, Encoder, EncoderConfig
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf

    rng = np.random.default_rng(bd)
    w, h = 96, 64
    mx = 1 << bd
    frames = [(rng.integers(0, mx, (h, w), dtype=np.uint16),
               rng.integers(0, mx, (h // 2, w // 2), dtype=np.uint16),
               rng.integers(0, mx, (h // 2, w // 2), dtype=np.uint16))
              for _ in range(2)]
    cfg = EncoderConfig(width=w, height=h, lossless=True, bit_depth=bd)
    enc = Encoder(cfg)
    for f in frames:
        enc.encode(f)
    pkts = enc.flush()
    dec = Decoder()
    out = []
    for p in pkts:
        out.extend(dec.decode(p))
    for o, f in zip(out, frames):
        for a, b in zip(o, f):
            np.testing.assert_array_equal(a, b)
    if os.path.exists(AOMDEC):
        ivf = str(tmp_path / "l.ivf")
        write_ivf(ivf, [(p, i) for i, p in enumerate(pkts)], w, h, 30, 1)
        raw = str(tmp_path / "l.raw")
        subprocess.run([AOMDEC, "--rawvideo", "-o", raw, ivf],
                       check=True, capture_output=True)
        data = np.fromfile(raw, "<u2")
        fsz = w * h + 2 * (w // 2) * (h // 2)
        for i, f in enumerate(frames):
            ys = data[i * fsz:i * fsz + w * h].reshape(h, w)
            np.testing.assert_array_equal(ys, f[0])
