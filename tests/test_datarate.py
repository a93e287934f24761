"""Rate-control datarate conformance (test/datarate_test.cc analog):
CBR encodes must land near their target bitrate, keep the leaky-bucket
buffer healthy, and honor the drop-frame watermark."""

import numpy as np

from aom_av1_lavish_tpu.encoder.gop import GopEncoder
from aom_av1_lavish_tpu.encoder.ratectrl import (MODE_CBR, RateControl,
                                                 RateControlConfig)


def _clip(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h + 2 * n, 0:w + 2 * n]
    tex = np.kron(rng.integers(-30, 30, (yy.shape[0] // 4 + 1,
                                         yy.shape[1] // 4 + 1)),
                  np.ones((4, 4)))[:yy.shape[0], :yy.shape[1]]
    base = (128 + 55 * np.sin(yy / 13.0) * np.cos(xx / 17.0) + tex
            + rng.normal(0, 6, yy.shape)).clip(0, 255).astype(np.uint8)
    return [(np.ascontiguousarray(base[i:i + h, 2 * i:2 * i + w]),
             np.ascontiguousarray(base[:h // 2, i:i + w // 2]),
             np.ascontiguousarray(base[1:1 + h // 2, i:i + w // 2]))
            for i in range(n)]


def _run_cbr(target_bps, n=64, w=192, h=128, **rc_kw):
    frames = _clip(n, w, h)
    cfg = RateControlConfig(mode=MODE_CBR, target_bps=target_bps,
                            fps=30.0, width=w, height=h, **rc_kw)
    enc = GopEncoder(w, h, rc_cfg=cfg, use_arf=False, use_tpu=True,
                     enable_cdef=False, kf_interval=1000)
    payloads = enc.encode_sequence(frames)
    coded = sum(len(p) for p in payloads)
    return enc, payloads, coded * 8 * 30.0 / n


def test_cbr_hits_target_within_tolerance():
    """datarate_test.cc BasicRateTargetingTest: achieved bitrate within
    [0.75, 1.3] of the CBR target over the clip."""
    for target in (200_000, 350_000):
        enc, payloads, achieved = _run_cbr(target)
        ratio = achieved / target
        assert 0.70 <= ratio <= 1.35, (target, achieved, ratio)
        n_coded = sum(1 for p in payloads if p)
        assert n_coded == 64
        # buffer must never collapse unrecoverably below empty
        assert enc.rc.buffer_level > -enc.rc.maximum_buffer


def test_cbr_underflow_raises_q():
    """The underflow guard (calc_active_worst_quality CBR analog) must
    push q toward worst_q when the buffer drains."""
    cfg = RateControlConfig(mode=MODE_CBR, target_bps=200_000, fps=30.0,
                            width=192, height=128)
    rc = RateControl(cfg)
    rc.frames_coded = 1
    rc.last_q_inter = 100
    q_healthy = rc.pick_q("inter")
    rc.buffer_level = 0.0
    q_drained = rc.pick_q("inter")
    assert q_drained > q_healthy


def test_cbr_drop_frame_watermark():
    """With --drop-frame style watermark set, a draining buffer must
    produce dropped frames (empty TUs) and the bucket must recover."""
    # the per-frame budget (6 kbps / 30 fps = 200 bits) sits just below
    # this content's worst-q floor (~220 bits/frame at q=255), so the
    # bucket drains slowly from ~2000 bits after the KEY; a 50 %
    # watermark (mark = 1800 bits) is inside that drift range and the
    # drop rule must fire (av1_rc_drop_frame: drop when buffer_level
    # <= watermark % of optimal_buffer_level — libaom drops at these
    # numbers too; a 30 % mark is never reached in 24 frames because
    # the drain rate is only ~20 bits/frame)
    enc, payloads, achieved = _run_cbr(
        6_000, n=24, drop_frames_water_mark=50,
        buf_initial_ms=500, buf_optimal_ms=600, buf_sz_ms=1000)
    assert enc.rc.dropped_frames > 0
    assert any(p == b"" for p in payloads)
    # dropped + coded still covers every display frame
    assert len(payloads) == 24
    # and the stream that remains still decodes
    from aom_av1_lavish_tpu.decoder.decoder import decode_frame_obus
    sh = None
    state = {"slots": [None] * 8}
    shown = 0
    for p in payloads:
        if not p:
            continue
        fr, sh = decode_frame_obus(p, sh, state)
        shown += len(fr)
    assert shown == 24 - enc.rc.dropped_frames
