"""Control registry (AV1E_SET_* / arg_defs analog) + public-API routing.

Mirrors the reference's encode-API param tests
(test/encode_api_test.cc, av1_config_test.cc): every control must be
settable through apply_control / set_option / the CLI, range checks
must reject out-of-range values, and the gates that claim to be
consumed must actually change (or still produce) decodable streams."""

import os
import subprocess
import sys

import numpy as np
import pytest

from aom_av1_lavish_tpu.api import (USAGE_ALL_INTRA, USAGE_REALTIME,
                                    Decoder, Encoder, EncoderConfig)
from aom_av1_lavish_tpu.controls import (BY_KEY, CONTROLS, apply_control,
                                         resolve_mode_set, resolve_tools)

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")
HAVE_ORACLE = os.path.exists(AOMDEC)


def _clip(n, W, H, seed=0):
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


def _encode(cfg, frames):
    enc = Encoder(cfg)
    for f in frames:
        enc.encode(f)
    return enc.flush()


def _decode_all(pkts):
    dec = Decoder()
    out = []
    for p in pkts:
        out.extend(dec.decode(p))
    return out


# --------------------------------------------------------------------------
# registry structure


def test_registry_fields_exist():
    """Every control maps to a real EncoderConfig attribute."""
    cfg = EncoderConfig(width=64, height=64)
    for ctl in CONTROLS.values():
        assert hasattr(cfg, ctl.field), ctl.name


def test_registry_size_and_uniqueness():
    # the registry must cover the bulk of the reference control surface
    assert len(CONTROLS) >= 130
    assert len(BY_KEY) == len(CONTROLS)


def test_apply_control_by_name_and_key():
    cfg = EncoderConfig(width=64, height=64)
    apply_control(cfg, "AV1E_SET_AQ_MODE", "1")
    assert cfg.aq_mode == 1
    apply_control(cfg, "aq-mode", 2)
    assert cfg.aq_mode == 2
    apply_control(cfg, "enable-cdef", "0")
    assert cfg.enable_cdef is False
    apply_control(cfg, "tune", "ssim")
    assert cfg.tune == "ssim"


def test_apply_control_range_checks():
    cfg = EncoderConfig(width=64, height=64)
    with pytest.raises(ValueError):
        apply_control(cfg, "aq-mode", 7)
    with pytest.raises(ValueError):
        apply_control(cfg, "qm-min", -1)
    with pytest.raises(ValueError):
        apply_control(cfg, "tune", "nonsense")
    with pytest.raises(KeyError):
        apply_control(cfg, "no-such-control", 1)


def test_validate_cross_field_rules():
    cfg = EncoderConfig(width=64, height=64)
    cfg.qm_min, cfg.qm_max = 9, 5
    with pytest.raises(ValueError):
        cfg.validate()
    cfg = EncoderConfig(width=64, height=64, min_partition_size=32,
                        max_partition_size=8)
    with pytest.raises(ValueError):
        cfg.validate()
    cfg = EncoderConfig(width=64, height=64)
    cfg.min_partition_size = 12   # not a power of two
    with pytest.raises(ValueError):
        cfg.validate()


def test_set_option_accepts_registry_keys():
    cfg = EncoderConfig(width=64, height=64)
    cfg.set_option("enable-qm", "1")
    cfg.set_option("qm-min", "6")
    assert cfg.enable_qm is True and cfg.qm_min == 6
    # raw dataclass field names still work
    cfg.set_option("qindex", "90")
    assert cfg.qindex == 90


def test_encoder_control_method():
    cfg = EncoderConfig(width=64, height=64)
    enc = Encoder(cfg)
    enc.control("AOME_SET_QUANT_SHARPNESS", 3)
    assert enc.cfg.quant_sharpness == 3
    with pytest.raises(ValueError):
        enc.control("AV1E_SET_QM_MIN", 99)


# --------------------------------------------------------------------------
# lowering (resolve_tools)


def test_resolve_mode_set_gates():
    from aom_av1_lavish_tpu.bitstream import constants as c
    cfg = EncoderConfig(width=64, height=64)
    assert resolve_mode_set(cfg) is None       # all auto
    cfg.enable_smooth_intra = False
    ms = resolve_mode_set(cfg)
    assert c.SMOOTH_PRED not in ms and c.DC_PRED in ms
    cfg.enable_directional_intra = False
    ms = resolve_mode_set(cfg)
    assert c.V_PRED not in ms and c.D45_PRED not in ms
    cfg = EncoderConfig(width=64, height=64,
                        enable_diagonal_intra=False,
                        enable_paeth_intra=False)
    ms = resolve_mode_set(cfg)
    assert c.V_PRED in ms and c.H_PRED in ms
    assert c.D45_PRED not in ms and c.PAETH_PRED not in ms


def test_resolve_tools_lowering():
    cfg = EncoderConfig(width=64, height=64,
                        disable_trellis_quant=1,
                        enable_rect_partitions=False,
                        enable_order_hint=False,
                        chroma_q_offset_u=4, chroma_q_offset_v=-2,
                        enable_obmc=False, allow_warped_motion=False,
                        enable_masked_comp=False, sharpness=3)
    t = resolve_tools(cfg)
    assert t["search"]["trellis"] is False
    assert t["search"]["rect_parts"] is False
    assert t["gop"]["order_hint"] is False
    assert t["gop"]["motion_modes"] is False
    assert t["gop"]["compound_types"] is False
    assert t["gop"]["q_offsets"] == (0, 4, -2)
    assert t["gop"]["lf_sharpness"] == 3


# --------------------------------------------------------------------------
# behavior: gated encodes still decode, and knobs actually change bits


def test_gates_change_stream_and_roundtrip():
    W, H = 128, 96
    frames = _clip(2, W, H)
    base = _encode(EncoderConfig(width=W, height=H, qindex=80,
                                 gf_length=2), frames)
    gated = _encode(
        EncoderConfig(width=W, height=H, qindex=80, gf_length=2,
                      enable_rect_partitions=False,
                      disable_trellis_quant=1,
                      enable_smooth_intra=False), frames)
    assert b"".join(base) != b"".join(gated)
    out = _decode_all(gated)
    assert len(out) == 2
    from aom_av1_lavish_tpu.dsp.metrics import psnr
    assert psnr(out[0][0], frames[0][0]) > 28


def test_quant_sharpness_changes_stream():
    W, H = 128, 96
    frames = _clip(1, W, H)
    a = _encode(EncoderConfig(width=W, height=H, usage=USAGE_ALL_INTRA,
                              qindex=100), frames)
    b = _encode(EncoderConfig(width=W, height=H, usage=USAGE_ALL_INTRA,
                              qindex=100, quant_sharpness=5), frames)
    assert a[0] != b[0]
    out = _decode_all(b)
    assert len(out) == 1


def _parse_headers(payload):
    """Parse (sequence_header, [frame_headers]) out of one TU payload."""
    from aom_av1_lavish_tpu.bitstream import headers as H
    from aom_av1_lavish_tpu.bitstream.obu import _obu_spans
    from aom_av1_lavish_tpu.bitstream.bits import leb128_decode
    sh, fhs = None, []
    for t, full in _obu_spans(payload):
        hdr = full[0]
        pos = 1 + ((hdr >> 2) & 1)
        size, pos = leb128_decode(full, pos)
        pl = full[pos:pos + size]
        if t == 1:
            sh = H.parse_sequence_header(pl)
        elif t in (3, 6) and sh is not None:
            fh, _ = H.parse_frame_header(pl, sh)
            fhs.append(fh)
    return sh, fhs


def test_lf_sharpness_header_roundtrip():
    W, H = 128, 96
    frames = _clip(1, W, H)
    pkts = _encode(EncoderConfig(width=W, height=H, qindex=60,
                                 usage=USAGE_ALL_INTRA, sharpness=4),
                   frames)
    _sh, fhs = _parse_headers(pkts[0])
    assert fhs[0].sharpness_level == 4


def test_color_config_roundtrip():
    W, H = 64, 64
    frames = _clip(1, W, H)
    pkts = _encode(EncoderConfig(width=W, height=H, qindex=60,
                                 usage=USAGE_ALL_INTRA,
                                 color_primaries=1,       # BT.709
                                 transfer_characteristics=1,
                                 matrix_coefficients=1),
                   frames)
    sh, _fhs = _parse_headers(pkts[0])
    assert sh.color_description_present == 1
    assert (sh.color_primaries, sh.transfer_characteristics,
            sh.matrix_coefficients) == (1, 1, 1)


def test_api_routes_all_modes():
    """flush() reaches every shipped encode mode from the public API."""
    W, H = 128, 96
    frames = _clip(4, W, H)
    # realtime
    pkts = _encode(EncoderConfig(width=W, height=H, usage=USAGE_REALTIME,
                                 qindex=100), frames)
    assert len(_decode_all(pkts)) == 4
    # temporal SVC
    pkts = _encode(EncoderConfig(width=W, height=H, qindex=100,
                                 temporal_layers=2), frames)
    assert len(_decode_all(pkts)) == 4
    # superres
    cfg = EncoderConfig(width=W, height=H, qindex=100,
                        enable_superres=True, superres_denom=12)
    pkts = _encode(cfg, frames[:1])
    assert len(_decode_all(pkts)) == 1
    # QM all-intra
    cfg = EncoderConfig(width=W, height=H, qindex=100, enable_qm=True,
                        qm_min=6, qm_max=8)
    pkts = _encode(cfg, frames[:1])
    assert len(_decode_all(pkts)) == 1


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_gated_gop_stream_conformance(tmp_path):
    """A control-gated GOP stream must still decode in stock aomdec."""
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    from aom_av1_lavish_tpu.utils.y4m import read_y4m
    W, H = 128, 96
    frames = _clip(4, W, H)
    pkts = _encode(
        EncoderConfig(width=W, height=H, qindex=80, gf_length=4,
                      quant_sharpness=3, sharpness=2,
                      enable_smooth_intra=False,
                      disable_trellis_quant=1), frames)
    ivf = str(tmp_path / "g.ivf")
    write_ivf(ivf, [(p, i) for i, p in enumerate(pkts)], W, H, 30, 1)
    out = str(tmp_path / "dec.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = _decode_all(pkts)
    for a, b in zip(ours[0], ref[0]):
        np.testing.assert_array_equal(a, b)


def test_cli_registry_flags(tmp_path):
    """The CLI exposes one flag per registry control and they thread."""
    from aom_av1_lavish_tpu.apps.enc import build_parser, main
    from aom_av1_lavish_tpu.utils.y4m import write_y4m
    helptext = build_parser().format_help()
    for key in ("--enable-qm", "--quant-sharpness", "--aq-mode",
                "--enable-obmc", "--color-primaries",
                "--butteraugli-rd-mult", "--max-reference-frames"):
        assert key in helptext
    W, H = 128, 96
    src = str(tmp_path / "in.y4m")
    write_y4m(src, _clip(2, W, H), W, H)
    out = str(tmp_path / "o.ivf")
    rc = main([src, "-o", out, "--quiet", "--cq-level", "90",
               "--quant-sharpness", "2", "--enable-smooth-intra", "0",
               "--sharpness", "1"])
    assert rc == 0 and os.path.getsize(out) > 0
    from aom_av1_lavish_tpu.bitstream.ivf import read_ivf
    pkts = [p for p, _ in read_ivf(out)]
    assert len(_decode_all(pkts)) == 2


def test_roi_map_control_drives_segmentation(tmp_path):
    """AOME_SET_ROI_MAP analog: a user segment map + per-segment q
    deltas must produce a segmented stream whose ROI region is coded
    at the finer quantizer (decoded quality differs accordingly)."""
    import numpy as np
    from aom_av1_lavish_tpu.api import Encoder, EncoderConfig
    from aom_av1_lavish_tpu.decoder.decoder import decode_frame_obus

    W, H = 128, 96
    rng = np.random.default_rng(7)
    y = rng.integers(0, 255, (H, W)).astype(np.uint8)
    frame = (y, np.full((H // 2, W // 2), 120, np.uint8),
             np.full((H // 2, W // 2), 130, np.uint8))
    # ROI: left half segment 1 (much finer q), right half segment 0
    m = np.zeros((H // 16, W // 16), np.uint8)
    m[:, : W // 32] = 1
    cfg = EncoderConfig(width=W, height=H, qindex=160)
    cfg.set_option("roi-map", {"map": m, "delta_q": [0, -80]})
    enc = Encoder(cfg)
    enc.encode(frame)
    payloads = enc.flush()
    frames, _ = decode_frame_obus(payloads[0], None,
                                  {"slots": [None] * 8})
    dy = frames[0][0].astype(np.float64)
    err_roi = np.mean((dy[:, :W // 2] - y[:, :W // 2]) ** 2)
    err_rest = np.mean((dy[:, W // 2:] - y[:, W // 2:]) ** 2)
    assert err_roi < err_rest * 0.6, (err_roi, err_rest)


def test_get_controls():
    """GET-side control accessors (AOME_GET_* / AV1E_GET_*)."""
    from aom_av1_lavish_tpu.api import Encoder, EncoderConfig
    cfg = EncoderConfig(width=128, height=96, qindex=120)
    enc = Encoder(cfg)
    assert enc.get_control("AOME_GET_LAST_QUANTIZER") == 120
    assert enc.get_control("AOME_GET_LAST_QUANTIZER_64") == 30
    assert enc.get_control("AV1E_GET_BASELINE_GF_INTERVAL") == cfg.gf_length
    assert enc.get_control("AV1E_GET_NUM_OPERATING_POINTS") >= 1
    assert isinstance(enc.get_control("AV1E_GET_SEQ_LEVEL_IDX"), int)


def test_control_id_parity_with_reference_headers():
    """Key-value API parity: every control ID in the reference's public
    headers (aomcx.h + aomdx.h) dispatches somewhere in this framework —
    the encoder registry/aliases, the encoder GET accessors, or the
    decoder control methods (api.py Decoder.control/get_control)."""
    import inspect
    from aom_av1_lavish_tpu import api, controls
    from tests._ref_control_ids import REF_CONTROL_IDS

    enc_get_src = inspect.getsource(api.Encoder.get_control)
    dec_src = (inspect.getsource(api.Decoder.control)
               + inspect.getsource(api.Decoder.get_control))
    known = set(controls.CONTROLS) | set(controls.ALIASES)
    missing = []
    for name in REF_CONTROL_IDS:
        if name in known:
            continue
        if name.startswith(("AOMD_", "AV1D_")) and f'"{name}"' in dec_src:
            continue
        if "_GET_" in name and f'"{name}"' in enc_get_src:
            continue
        missing.append(name)
    assert not missing, f"unmapped control IDs: {missing}"


def test_decoder_set_controls(tmp_path):
    """AV1D_SET_* surface: skip-film-grain, annex-B input, operating
    point, ext refs (av1_dx_iface.c ctrl handlers)."""
    from aom_av1_lavish_tpu.encoder.encoder import encode_lossless_ivf
    from aom_av1_lavish_tpu.bitstream.ivf import read_ivf
    from aom_av1_lavish_tpu.bitstream.obu import leb128_encode

    frames = _clip(2, 64, 48)
    path = str(tmp_path / "a.ivf")
    encode_lossless_ivf(path, frames, 64, 48)
    payloads = [p for p, _ in read_ivf(path)]

    d = Decoder()
    d.control("AV1D_SET_SKIP_FILM_GRAIN", 1)
    d.control("AV1D_SET_ROW_MT", 1)
    d.control("AV1D_SET_OUTPUT_ALL_LAYERS", 1)
    d.control("AV1D_SET_OPERATING_POINT", 0)
    out = [f for p in payloads for f in d.decode(p)]
    assert len(out) == 2
    assert np.array_equal(out[0][0], frames[0][0])  # lossless

    # annex-B framing: obu_length-wrapped OBUs inside fu/tu sizes
    def annexb_tu(low_overhead: bytes) -> bytes:
        from aom_av1_lavish_tpu.bitstream.obu import _obu_spans
        obus = [leb128_encode(len(full)) + full
                for _t, full in _obu_spans(low_overhead)]
        fu = b"".join(obus)
        body = leb128_encode(len(fu)) + fu
        return leb128_encode(len(body)) + body

    da = Decoder()
    da.control("AV1D_SET_IS_ANNEXB", 1)
    out2 = [f for p in payloads for f in da.decode(annexb_tu(p))]
    assert np.array_equal(out2[0][0], frames[0][0])

    # ext-ref preload (lightfield flow)
    dr = Decoder()
    dr.control("AV1D_SET_EXT_REF_PTR", {3: frames[0]})
    assert dr._state["slots"][3]["planes"][0] is frames[0][0]


def test_decoder_get_controls(tmp_path):
    """AOMD_GET_* / AV1D_GET_* read-back against a known stream."""
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf
    from aom_av1_lavish_tpu.bitstream.ivf import read_ivf

    frames = _clip(2, 64, 48)
    path = str(tmp_path / "g.ivf")
    encode_lossy_ivf(path, frames, 64, 48, qindex=80)
    payloads = [p for p, _ in read_ivf(path)]
    d = Decoder()
    for p in payloads:
        d.decode(p)
    assert d.get_control("AOMD_GET_BASE_Q_IDX") == 80
    assert d.get_control("AOMD_GET_LAST_QUANTIZER") == 80
    assert d.get_control("AOMD_GET_FRAME_CORRUPTED") == 0
    assert d.get_control("AOMD_GET_SHOW_FRAME_FLAG") == 1
    assert d.get_control("AOMD_GET_SHOW_EXISTING_FRAME_FLAG") in (0, 1)
    assert d.get_control("AOMD_GET_SB_SIZE") in (64, 128)
    assert d.get_control("AOMD_GET_STILL_PICTURE")["is_still_picture"] == 0
    assert d.get_control("AOMD_GET_S_FRAME_INFO")["is_s_frame"] == 0
    assert isinstance(d.get_control("AOMD_GET_ORDER_HINT"), int)
    assert isinstance(d.get_control("AOMD_GET_LAST_REF_UPDATES"), int)
    assert isinstance(d.get_control("AOMD_GET_LAST_REF_USED"), int)
    assert isinstance(d.get_control("AOMD_GET_ALTREF_PRESENT"), int)
    assert isinstance(d.get_control("AOMD_GET_FWD_KF_PRESENT"), int)
    sct = d.get_control("AOMD_GET_SCREEN_CONTENT_TOOLS_INFO")
    assert set(sct) == {"allow_screen_content_tools", "force_integer_mv"}
    assert d.get_control("AV1D_GET_BIT_DEPTH") == 8
    assert d.get_control("AV1D_GET_IMG_FORMAT") == "I420"
    assert d.get_control("AV1D_GET_FRAME_SIZE") == (64, 48)
    assert d.get_control("AV1D_GET_DISPLAY_SIZE") == (64, 48)
    assert d.get_control("AV1D_GET_FRAME_HEADER_INFO").base_q_idx == 80
    assert d.get_control("AV1D_GET_TILE_COUNT") >= 1
    ti = d.get_control("AV1D_GET_TILE_INFO")
    assert ti["tile_cols"] * ti["tile_rows"] \
        == d.get_control("AV1D_GET_TILE_COUNT")
    assert all(s > 0 for s in d.get_control("AV1D_GET_TILE_SIZE"))
    td = d.get_control("AV1D_GET_TILE_DATA")
    assert td and all(isinstance(b, bytes) for _, b in td)
    mi = d.get_control("AV1D_GET_MI_INFO", 0, 0)
    assert {"mode", "mv", "bsize", "skip", "segment_id"} <= set(mi)


# --------------------------------------------------------------------------
# controls wired to real features (round-5: formerly advisory)


def test_activemap_control_forces_skip():
    """AOME_SET_ACTIVEMAP through the public Encoder: inactive blocks
    produce near-empty inter frames (zero-MV skip)."""
    W, H = 128, 96
    rng = np.random.default_rng(3)
    frames = [(y + rng.integers(0, 30, y.shape).astype(np.uint8), u, v)
              for (y, u, v) in _clip(4, W, H, seed=3)]
    base = EncoderConfig(width=W, height=H, usage=USAGE_REALTIME, qindex=120,
                         target_bps=2_000_000)
    pkts_full = _encode(base, frames)
    cfg = EncoderConfig(width=W, height=H, usage=USAGE_REALTIME, qindex=120,
                        target_bps=2_000_000)
    amap = np.zeros((H // 16, W // 16), np.uint8)   # all inactive
    apply_control(cfg, "AOME_SET_ACTIVEMAP", {"map": amap})
    pkts_skip = _encode(cfg, frames)
    # inter frames must shrink drastically when everything is inactive
    full_inter = sum(len(p) for p in pkts_full[1:])
    skip_inter = sum(len(p) for p in pkts_skip[1:])
    assert skip_inter < full_inter // 2, (skip_inter, full_inter)
    assert len(_decode_all(pkts_skip)) == len(frames)


def test_scalemode_control_codes_scaled_size():
    """AOME_SET_SCALEMODE through the public Encoder: mode 3 halves the
    coded dimensions."""
    W, H = 128, 96
    frames = _clip(3, W, H, seed=5)
    cfg = EncoderConfig(width=W, height=H, qindex=120)
    apply_control(cfg, "AOME_SET_SCALEMODE", 3)
    pkts = _encode(cfg, frames)
    dec = _decode_all(pkts)
    assert len(dec) == len(frames)
    assert dec[0][0].shape == (H // 2, W // 2)
    assert cfg.width == W and cfg.height == H    # restored after flush


def test_svc_params_control_drives_layered_encode():
    """AV1E_SET_SVC_PARAMS through the public Encoder: layer counts
    route onto the temporal-SVC driver (decodable layered stream)."""
    W, H = 128, 96
    frames = _clip(4, W, H, seed=7)
    cfg = EncoderConfig(width=W, height=H, qindex=120)
    apply_control(cfg, "AV1E_SET_SVC_PARAMS",
                  {"number_spatial_layers": 1,
                   "number_temporal_layers": 2})
    assert cfg.temporal_layers == 2
    pkts = _encode(cfg, frames)
    assert len(_decode_all(pkts)) == len(frames)


def test_static_threshold_and_fpmt_controls():
    """STATIC_THRESHOLD shrinks RT inter frames; FP_MT_UNIT_TEST routes
    the GOP through the frame-parallel program and still decodes."""
    W, H = 128, 96
    rng = np.random.default_rng(9)
    frames = [(np.clip(y.astype(np.int32)
                       + rng.integers(-4, 5, y.shape), 0, 255)
               .astype(np.uint8), u, v)
              for (y, u, v) in _clip(4, W, H, seed=9)]
    base = EncoderConfig(width=W, height=H, usage=USAGE_REALTIME,
                         qindex=120, target_bps=2_000_000)
    full = sum(len(p) for p in _encode(base, frames)[1:])
    cfg = EncoderConfig(width=W, height=H, usage=USAGE_REALTIME,
                        qindex=120, target_bps=2_000_000)
    apply_control(cfg, "AOME_SET_STATIC_THRESHOLD", 100000)
    thin = sum(len(p) for p in _encode(cfg, frames)[1:])
    assert thin < full, (thin, full)

    cfg2 = EncoderConfig(width=W, height=H, qindex=120, use_tpu=True)
    apply_control(cfg2, "AV1E_SET_FP_MT_UNIT_TEST", 1)
    pkts = _encode(cfg2, frames)
    assert len(_decode_all(pkts)) == len(frames)
