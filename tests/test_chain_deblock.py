"""Device-chained GF group with in-loop deblocking: encoder/decoder
reference agreement.

The chain program (ops/inter_tpu._p_chain_fn) deblocks each P recon on
device before it becomes the next frame's LAST carry; the frame headers
signal the same q-derived levels.  If the device filter diverged from
the normative one by even one pixel, the next chained frame's
prediction would drift and every decoded P frame after it would
mismatch — so comparing EVERY chained recon against the decoder is an
exact end-to-end pin of ops/deblock_jnp.py inside the loop."""

import numpy as np

from aom_av1_lavish_tpu.bitstream.ivf import read_ivf
from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder.gop import GopEncoder


def _clip(n=8, w=96, h=64):
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h + n * 2, 0:w + n * 2]
    base = (128 + 70 * np.sin(yy / 9.0) * np.cos(xx / 13.0)
            + rng.normal(0, 4, yy.shape)).clip(0, 255).astype(np.uint8)
    cb = rng.integers(100, 156, ((h + n * 2) // 2, (w + n * 2) // 2),
                      dtype=np.uint8)
    return [(np.ascontiguousarray(base[i:i + h, 2 * i:2 * i + w]),
             np.ascontiguousarray(cb[i // 2:i // 2 + h // 2,
                                     i:i + w // 2]),
             np.ascontiguousarray(255 - cb[i // 2:i // 2 + h // 2,
                                           i:i + w // 2]))
            for i in range(n)]


def test_chain_deblock_no_drift(tmp_path, monkeypatch):
    from aom_av1_lavish_tpu.ops.inter_tpu import DeviceChainEncoder

    captured = {}
    orig = DeviceChainEncoder.encode_chain

    def spy(self, src_frames, qindexes, last_planes, arf_planes=None,
            recon="last", **kw):
        res = orig(self, src_frames, qindexes, last_planes,
                   arf_planes=arf_planes, recon="all", **kw)
        captured["recons"] = res[1]
        captured["lf"] = kw.get("lf_levels")
        return res

    monkeypatch.setattr(DeviceChainEncoder, "encode_chain", spy)

    frames = _clip()
    enc = GopEncoder(96, 64, qindex=96, gf_length=8, use_tpu=True,
                     enable_cdef=False)
    payloads = enc.encode_sequence(frames)
    assert "recons" in captured, "chain path not taken"
    assert captured["lf"] is not None and max(
        lv if isinstance(lv, int) else lv[0]
        for lv in captured["lf"]) > 0, "deblock level must be nonzero"

    path = str(tmp_path / "chain.ivf")
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    write_ivf(path, [(p, i) for i, p in enumerate(payloads) if p],
              96, 64, 30, 1)
    dec = decode_ivf(path)
    assert len(dec) == len(frames)
    # display frames 1..6 are the chained P frames (0 = key, 7 = ARF
    # via show_existing); each must equal the device recon byte-exactly
    for j, rec in enumerate(captured["recons"]):
        got = dec[1 + j]
        for pi in range(3):
            assert np.array_equal(np.asarray(got[pi]),
                                  np.asarray(rec[pi])), \
                f"chained frame {j} plane {pi} drifted"


def test_chain_deblock_quality_sanity(tmp_path):
    """Chained coding with the in-loop filter at a coarse q stays
    reasonable on a synthetic pan (regression floor for the RD-skip +
    deblock combination)."""
    import os

    from aom_av1_lavish_tpu.encoder.gop import encode_gop_ivf

    frames = _clip(w=128, h=96)
    p1 = str(tmp_path / "lf.ivf")
    encode_gop_ivf(p1, frames, 128, 96, qindex=140, gf_length=8,
                   use_tpu=True, enable_cdef=False)
    dec = decode_ivf(p1)
    mse = np.mean([
        np.mean((d[0].astype(np.float64) - s[0].astype(np.float64)) ** 2)
        for d, s in zip(dec, frames)])
    psnr_lf = 10 * np.log10(255.0 ** 2 / mse)
    assert os.path.getsize(p1) > 0
    assert psnr_lf > 26.0
