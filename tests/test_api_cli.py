"""Public API (codec-ABI analog), CLI apps, metrics, psy tune."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest


def _clip(n, W, H, seed=0):
    """Natural-ish moving content: smooth gradients + texture + edges."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H + 64, 0:W + 64]
    base = (128 + 60 * np.sin(yy / 17.0) * np.cos(xx / 23.0)
            + 40 * (xx % 97 < 40)).astype(np.float64)
    base += rng.normal(0, 3, base.shape)
    base = base.clip(0, 255).astype(np.uint8)
    frames = []
    for i in range(n):
        y = base[i:i + H, 2 * i:2 * i + W]
        u = np.full((H // 2, W // 2), 110, np.uint8)
        v = np.full((H // 2, W // 2), 124, np.uint8)
        frames.append((np.ascontiguousarray(y), u, v))
    return frames


def test_encoder_decoder_api_roundtrip():
    from aom_av1_lavish_tpu.api import Decoder, Encoder, EncoderConfig
    W, H = 128, 96
    frames = _clip(6, W, H)
    cfg = EncoderConfig(width=W, height=H, qindex=80, gf_length=4,
                        enable_cdef=True)
    enc = Encoder(cfg)
    for f in frames:
        enc.encode(f)
    pkts = enc.flush()
    assert len(pkts) == 6
    dec = Decoder()
    out = []
    for p in pkts:
        out.extend(dec.decode(p))
    assert len(out) == 6
    from aom_av1_lavish_tpu.dsp.metrics import psnr
    assert psnr(out[0][0], frames[0][0]) > 30


def test_config_validation():
    from aom_av1_lavish_tpu.api import EncoderConfig
    from aom_av1_lavish_tpu.encoder.ratectrl import MODE_CBR
    with pytest.raises(ValueError):
        EncoderConfig(width=0, height=64).validate()
    with pytest.raises(ValueError):
        EncoderConfig(width=64, height=64, qindex=500).validate()
    with pytest.raises(ValueError):
        EncoderConfig(width=64, height=64, rc_mode=MODE_CBR,
                      target_bps=0).validate()
    cfg = EncoderConfig(width=64, height=64)
    cfg.set_option("qindex", "90")
    cfg.set_option("enable_cdef", "false")
    assert cfg.qindex == 90 and cfg.enable_cdef is False
    with pytest.raises(KeyError):
        cfg.set_option("nope", "1")


def test_cli_enc_dec_roundtrip():
    from aom_av1_lavish_tpu.apps import dec as dec_app
    from aom_av1_lavish_tpu.apps import enc as enc_app
    from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m
    W, H = 64, 64
    frames = _clip(3, W, H)
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.y4m")
        ivf = os.path.join(td, "out.ivf")
        rec = os.path.join(td, "rec.y4m")
        write_y4m(src, frames, W, H)
        rc = enc_app.main([src, "-o", ivf, "--lossless", "1", "-q"])
        assert rc == 0 and os.path.getsize(ivf) > 0
        rc = dec_app.main([ivf, "-o", rec])
        assert rc == 0
        out, w2, h2, _ = read_y4m(rec)
        assert (w2, h2) == (W, H)
        for i in range(3):
            for p in range(3):
                assert np.array_equal(out[i][p], frames[i][p])


def test_metrics_sanity():
    from aom_av1_lavish_tpu.dsp import metrics as M
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    assert M.psnr(a, a) == 100.0
    assert abs(M.ssim(a, a) - 1.0) < 1e-9
    noisy = (a.astype(np.int32)
             + rng.integers(-10, 11, a.shape)).clip(0, 255).astype(np.uint8)
    blurred = a.copy()
    blurred[::2] = 0
    assert M.psnr(a, noisy) > M.psnr(a, blurred)
    assert 0 < M.ssim(a, noisy) < 1
    assert M.ssim(a, noisy) > M.ssim(a, blurred)
    assert 0 < M.fastssim(a, noisy) <= 1
    assert M.psnrhvs(a, noisy) > M.psnrhvs(a, blurred)
    fp = M.frame_psnr((a, a, a), (noisy, a, a))
    assert fp["y"] < fp["u"] == 100.0


def test_ssim_tune_improves_ssim():
    """tune=ssim must improve SSIM per bit vs tune=psnr (the
    av1_set_mb_ssim_rdmult_scaling contract)."""
    from aom_av1_lavish_tpu.api import Decoder, Encoder, EncoderConfig
    from aom_av1_lavish_tpu.dsp.metrics import ssim
    W, H = 128, 96
    frames = _clip(2, W, H, seed=5)

    def run(tune, q):
        cfg = EncoderConfig(width=W, height=H, qindex=q, gf_length=4,
                            tune=tune, enable_cdef=False)
        enc = Encoder(cfg)
        for f in frames:
            enc.encode(f)
        pkts = enc.flush()
        dec = Decoder()
        out = []
        for p in pkts:
            out.extend(dec.decode(p))
        s = np.mean([ssim(o[0], f[0]) for o, f in zip(out, frames)])
        return s, sum(len(p) for p in pkts) * 8

    s_s, b_s = run("ssim", 120)
    # psnr-tune rate curve bracketing the ssim-tune's bitrate
    pts = sorted(run("psnr", q)[::-1] + (q,) for q in (90, 105, 120, 140))
    lo = max((p for p in pts if p[0] <= b_s), default=pts[0])
    hi = min((p for p in pts if p[0] >= b_s), default=pts[-1])
    if hi[0] == lo[0]:
        s_p_at_bs = lo[1]
    else:
        t = (b_s - lo[0]) / (hi[0] - lo[0])
        s_p_at_bs = lo[1] + t * (hi[1] - lo[1])
    # equal-bitrate SSIM must not regress (and typically improves)
    assert s_s >= s_p_at_bs - 1e-4, (s_s, s_p_at_bs, b_s, pts)


def test_tune_maps():
    from aom_av1_lavish_tpu.encoder.tune import (combined_rdmult_map,
                                                 luma_bias_map,
                                                 ssim_rdmult_map)
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    m = ssim_rdmult_map(y)
    assert m.shape == (4, 4) and np.all(m > 0)
    assert abs(np.exp(np.mean(np.log(m))) - 1.0) < 1e-9
    flat = np.full((64, 64), 30, np.uint8)
    busy = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    combo = np.vstack([flat[:32], busy[:32]])
    m2 = ssim_rdmult_map(combo)
    assert m2[:2].mean() < m2[2:].mean()   # flat rows get lower lambda
    lb = luma_bias_map(combo, strength=1.0)
    # the dark flat half (luma 30) must get a lower multiplier
    assert lb[:2].mean() < lb[2:].mean()
    assert combined_rdmult_map(y, "psnr", 16, 0.0) is None
    assert combined_rdmult_map(y, "ssim", 16, 0.5).shape == (4, 4)


def test_level_enforcement():
    """Level picking + limits (av1/encoder/level.c analog)."""
    from aom_av1_lavish_tpu.api import EncoderConfig
    from aom_av1_lavish_tpu.encoder.levels import check_level, pick_level

    # auto-pick: 480p30 fits level 3.0 or lower
    cfg = EncoderConfig(width=854, height=480, fps=30.0)
    cfg.validate()
    assert cfg.level <= 5

    # 1080p60 needs >= 4.1 (display rate)
    assert pick_level(1920, 1080, 60.0) >= 9
    # 4K60 needs >= 5.1 (display rate 497.7M <= 534.8M)
    assert pick_level(3840, 2160, 60.0) >= 13

    # explicit too-small level rejected
    cfg = EncoderConfig(width=3840, height=2160, fps=60.0, level=0)
    try:
        cfg.validate()
        assert False, "expected level violation"
    except ValueError as e:
        assert "exceeds level" in str(e)

    # bitrate cap enforced
    assert check_level(8, 1920, 1080, 30.0, bitrate_bps=50e6)
    assert not check_level(8, 1920, 1080, 30.0, bitrate_bps=10e6)


def test_cli_special_modes(tmp_path):
    """CLI routes for realtime / screen / SVC / QM / multi-pass modes."""
    import numpy as np
    from aom_av1_lavish_tpu.apps.enc import main as enc_main
    from aom_av1_lavish_tpu.apps.dec import main as dec_main
    from aom_av1_lavish_tpu.utils.y4m import write_y4m

    rng = np.random.default_rng(0)
    w, h = 96, 64
    frames = []
    for i in range(3):
        y = np.kron(rng.integers(0, 255, (h // 16, w // 16)),
                    np.ones((16, 16))).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u, u.copy()))
    src = str(tmp_path / "s.y4m")
    write_y4m(src, frames, w, h)

    for name, extra in (
            ("rt", ["--usage", "realtime"]),
            ("scr", ["--tune-content", "screen"]),
            ("svc", ["--svc-temporal-layers", "2"]),
            ("qm", ["--enable-qm", "1"]),
            ("aq", ["--aq-mode", "1"])):
        out = str(tmp_path / f"{name}.ivf")
        rc = enc_main([src, "-o", out, "--cq-level", "90", "-q"] + extra)
        assert rc == 0 and os.path.getsize(out) > 0, name
        y4m = str(tmp_path / f"{name}.y4m")
        assert dec_main([out, "-o", y4m, "-q"] if False else
                        [out, "-o", y4m]) == 0
