"""RTC rate-control library (ratectrl_rtc.py; reference:
av1/ratectrl_rtc.cc AV1RateControlRTC) + CNN inference (models/cnn.py;
reference: av1/encoder/cnn.c)."""

import numpy as np

from aom_av1_lavish_tpu.encoder.ratectrl_rtc import (
    RateControlRtc, RateControlRtcConfig, RateControlRtcFrameParams)
from aom_av1_lavish_tpu.models.cnn import (cnn_partition_score,
                                           cnn_predict, ConvLayer,
                                           CNNConfig)


def test_rtc_qp_oracle_converges():
    cfg = RateControlRtcConfig(width=352, height=288,
                               target_bandwidth_kbps=300)
    rc = RateControlRtc(cfg)
    qps = []
    for i in range(60):
        fp = RateControlRtcFrameParams(
            frame_type="key" if i == 0 else "inter")
        rc.compute_qp(fp)
        qp = rc.get_qp()
        assert cfg.min_quantizer <= qp <= cfg.max_quantizer
        assert rc.get_loopfilter_level() >= 0
        qps.append(qp)
        # fake an encoder: bytes shrink as qp rises (inverse-q model)
        size = int(26000 / (1 + qp / 16) / 8)
        rc.post_encode_update(size)
    # feedback must settle: late QPs vary less than early ones
    assert np.std(qps[40:]) <= np.std(qps[:20]) + 1e-9


def test_rtc_temporal_layers():
    cfg = RateControlRtcConfig(target_bandwidth_kbps=400,
                               ts_number_layers=2,
                               ts_rate_share=(0.6, 0.4))
    rc = RateControlRtc(cfg)
    for i in range(8):
        rc.compute_qp(RateControlRtcFrameParams(
            frame_type="key" if i == 0 else "inter",
            temporal_layer_id=i % 2))
        rc.post_encode_update(800)


def test_cnn_conv_matches_reference_conv():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8))
    w = rng.normal(size=(3, 1, 3, 3))
    out = cnn_predict(x, CNNConfig([ConvLayer(w, np.zeros(3), stride=1,
                                              relu=False)]))
    # brute-force check one output sample (same-padding conv)
    xp = np.pad(x[0], 1)
    want = (xp[3:6, 4:7] * w[1, 0]).sum()
    assert abs(out[0, 1, 3, 4] - want) < 1e-9


def test_cnn_partition_score_orders_content():
    rng = np.random.default_rng(1)
    flat = np.full((32, 32), 128.0)
    mixed = np.full((32, 32), 128.0)
    mixed[16:, 16:] = rng.normal(128, 40, (16, 16))  # one busy quadrant
    assert cnn_partition_score(mixed) > cnn_partition_score(flat)


def test_complexity_aq_segmentation():
    from aom_av1_lavish_tpu.encoder.lossy import (LossyAllIntraEncoder,
                                                  make_lossy_frame_header)
    from aom_av1_lavish_tpu.encoder.encoder import make_sequence_header
    rng = np.random.default_rng(2)
    w, h = 128, 64
    y = np.full((h, w), 100, np.uint8)
    y[:, w // 2:] = rng.integers(0, 256, (h, w // 2)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    sh = make_sequence_header(w, h)
    fh = make_lossy_frame_header(sh, 80, seg=[-16, 0, 16])
    enc = LossyAllIntraEncoder(sh, fh, seg_flavor="complexity")
    enc.encode_frame((y, u, v))
    assert len(np.unique(enc.seg_plan)) >= 2
