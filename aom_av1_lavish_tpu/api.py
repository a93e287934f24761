"""Public encoder/decoder API — the codec-ABI analog.

Re-designs the reference's C ABI surface (aom/aom_encoder.h
aom_codec_enc_init_ver/aom_codec_encode/aom_codec_get_cx_data,
aom/aom_decoder.h aom_codec_dec_init_ver/aom_codec_decode, config
validation av1/av1_cx_iface.c:805) as a small Python-native API:

    cfg = EncoderConfig(width=1280, height=720, target_bps=2_000_000)
    enc = Encoder(cfg)
    for frame in frames:
        enc.encode(frame)           # (y, u, v) uint8 planes
    packets = enc.flush()           # display-ordered TU payloads

    dec = Decoder()
    for pkt in packets:
        for planes in dec.decode(pkt):
            ...

Controls map to config fields (the 391 AV1E_SET_* controls collapse to
validated dataclass fields + set_option for string key-values).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields

import numpy as np

from .bitstream import constants as c
from .encoder.ratectrl import (MODE_CBR, MODE_CQ, MODE_Q, MODE_VBR,
                               RateControlConfig)

USAGE_GOOD_QUALITY = 0
USAGE_REALTIME = 1
USAGE_ALL_INTRA = 2


@dataclass
class EncoderConfig:
    """Validated encode configuration (aom_codec_enc_cfg_t analog)."""

    width: int = 0
    height: int = 0
    fps: float = 30.0
    usage: int = USAGE_GOOD_QUALITY
    cpu_used: int | None = None      # speed preset (speed_features.c)
    # rate control
    rc_mode: int = MODE_Q            # MODE_Q | MODE_CBR | MODE_VBR
    target_bps: int = 0              # used by CBR/VBR
    qindex: int = 60                 # used by MODE_Q
    best_q: int = 4
    worst_q: int = 255
    # GOP
    kf_interval: int = 120
    gf_length: int = 8
    use_arf: bool = True
    lossless: bool = False
    bit_depth: int = 8               # 8 | 10 | 12 (10/12 use uint16 planes)
    # tools
    enable_cdef: bool = True
    deblock: bool = True
    tune: str = "psnr"               # "psnr" | "ssim"
    luma_bias: float = 0.0           # lavish dark-region rdmult bias
    tile_cols_log2: int = 0
    tile_rows_log2: int = 0
    # platform
    use_tpu: bool = False            # batched device encode paths
    use_native: bool | None = None   # native C entropy coder
    #: target level (AV1 Annex A); -1 = auto-pick, 31 = max-parameters.
    #: Enforced at validate() (av1/encoder/level.c analog).
    level: int = -1

    def validate(self) -> None:
        """RANGE_CHECK analog (av1_cx_iface.c:805) + level enforcement
        (encoder/levels.py)."""
        def rng(name, v, lo, hi):
            if not (lo <= v <= hi):
                raise ValueError(f"{name}={v} out of range [{lo},{hi}]")
        rng("width", self.width, 4, 65536)
        rng("height", self.height, 4, 65536)
        from .encoder.levels import check_level, pick_level
        if self.level == -1:
            self.level = pick_level(self.width, self.height, self.fps,
                                    float(self.target_bps))
        else:
            bad = check_level(self.level, self.width, self.height,
                              self.fps, float(self.target_bps))
            if bad:
                raise ValueError(
                    f"stream exceeds level {self.level}: " + "; ".join(bad))
        rng("qindex", self.qindex, 0, 255)
        rng("best_q", self.best_q, 0, 255)
        rng("worst_q", self.worst_q, self.best_q, 255)
        rng("kf_interval", self.kf_interval, 1, 1 << 30)
        rng("gf_length", self.gf_length, 1, 32)
        rng("tile_cols_log2", self.tile_cols_log2, 0, 6)
        rng("tile_rows_log2", self.tile_rows_log2, 0, 6)
        if self.bit_depth not in (8, 10, 12):
            raise ValueError(f"bit_depth={self.bit_depth} not in (8,10,12)")
        if self.rc_mode in (MODE_CBR, MODE_VBR) and self.target_bps <= 0:
            raise ValueError("CBR/VBR needs target_bps > 0")
        if self.fps <= 0:
            raise ValueError("fps must be positive")

    def set_option(self, key: str, value: str) -> None:
        """String key-value control (aom_codec_set_option analog)."""
        names = {f.name: f for f in fields(self)}
        if key not in names:
            raise KeyError(f"unknown option {key!r}")
        t = names[key].type
        cur = getattr(self, key)
        if cur is None:
            v = value.strip()
            setattr(self, key,
                    int(v) if v.lstrip("+-").isdigit() else v)
        elif isinstance(cur, bool):
            setattr(self, key, value.lower() in ("1", "true", "yes"))
        elif isinstance(cur, int):
            setattr(self, key, int(value))
        elif isinstance(cur, float):
            setattr(self, key, float(value))
        else:
            setattr(self, key, value)


class Encoder:
    """Stream encoder (aom_codec_encode surface)."""

    def __init__(self, cfg: EncoderConfig):
        cfg.validate()
        self.cfg = cfg
        self._frames = []
        self._packets = []

    def encode(self, planes) -> None:
        """Queue one (y, u, v) frame.  Encoding is deferred so GOP
        structure (ARF lookahead) sees the full group; packets drain via
        get_packets()/flush()."""
        y, u, v = planes
        if y.shape != (self.cfg.height, self.cfg.width):
            raise ValueError(
                f"luma shape {y.shape} != configured "
                f"{(self.cfg.height, self.cfg.width)}")
        pix = np.uint8 if self.cfg.bit_depth == 8 else np.uint16
        self._frames.append((np.asarray(y, pix), np.asarray(u, pix),
                             np.asarray(v, pix)))

    def flush(self) -> list:
        """Encode all queued frames; returns display-ordered payloads."""
        cfg = self.cfg
        if cfg.lossless:
            from .encoder.encoder import (LosslessEncoder,
                                          make_lossless_frame_header,
                                          make_sequence_header)
            from .ops.lossless import analyze_frames_for_encoder
            sh = make_sequence_header(cfg.width, cfg.height,
                                      bit_depth=cfg.bit_depth)
            encs = []
            srcs = []
            for f in self._frames:
                fh = make_lossless_frame_header(
                    sh, tile_cols_log2=cfg.tile_cols_log2,
                    tile_rows_log2=cfg.tile_rows_log2)
                e = LosslessEncoder(sh, fh, use_native=cfg.use_native)
                srcs.append(e.pad_planes(f))
                encs.append(e)
            if (cfg.tile_cols_log2 or cfg.tile_rows_log2
                    or cfg.bit_depth > 8):
                # the batched device analyze is 8-bit single-tile; tiles
                # and high bitdepth use the host walk
                payloads = [e.encode_frame(f,
                                           use_jax=cfg.bit_depth == 8)
                            for e, f in zip(encs, self._frames)]
            else:
                analyses = analyze_frames_for_encoder(srcs)
                payloads = [e.encode_frame(f, analysis=a) for e, f, a in
                            zip(encs, self._frames, analyses)]
        else:
            from .encoder.gop import GopEncoder
            rc_cfg = RateControlConfig(
                target_bps=cfg.target_bps, fps=cfg.fps, width=cfg.width,
                height=cfg.height, mode=cfg.rc_mode, worst_q=cfg.worst_q,
                best_q=cfg.best_q, fixed_qindex=cfg.qindex)
            genc = GopEncoder(
                cfg.width, cfg.height, rc_cfg=rc_cfg,
                gf_length=cfg.gf_length, kf_interval=cfg.kf_interval,
                use_arf=cfg.use_arf, use_tpu=cfg.use_tpu,
                use_native=cfg.use_native, enable_cdef=cfg.enable_cdef,
                tune=cfg.tune, luma_bias=cfg.luma_bias,
                bit_depth=cfg.bit_depth, cpu_used=cfg.cpu_used)
            payloads = genc.encode_sequence(self._frames)
        self._frames = []
        return payloads


class Decoder:
    """Stream decoder (aom_codec_decode surface)."""

    def __init__(self):
        self._sh = None
        self._state = {"slots": [None] * 8}

    def decode(self, payload: bytes) -> list:
        """Decode one temporal unit; returns the list of shown frames
        (each a (y, u, v) tuple)."""
        from .decoder.decoder import decode_frame_obus
        frames, self._sh = decode_frame_obus(payload, self._sh,
                                             self._state)
        return frames
