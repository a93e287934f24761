"""Temporal SVC (scalable video coding) encoding.

Re-designs the reference's SVC controller (av1/encoder/svc_layercontext.c
av1_update_layer_context / aom_svc_params) for temporal layers: a dyadic
layer pattern where enhancement-layer frames are non-references, frame
OBUs carry temporal_id extension headers, and the sequence header
advertises the layer structure through operating_point_idc.  A decoder
(ours via max_temporal_layer, or any conformant one dropping high tids)
can decode the base layer alone bit-exactly.
"""

from __future__ import annotations

from ..bitstream import constants as c
from ..bitstream import headers as H
from .encoder import make_sequence_header
from .inter import InterFrameEncoder, make_inter_frame_header
from .lossy import LossyAllIntraEncoder, make_lossy_frame_header


def temporal_layer_of(frame_idx: int, layers: int) -> int:
    """Dyadic pattern: layer = number of trailing period bits set."""
    if layers <= 1 or frame_idx == 0:
        return 0
    period = 1 << (layers - 1)
    pos = frame_idx % period
    for lvl in range(layers - 1, 0, -1):
        if pos % (1 << (layers - lvl)) == (1 << (layers - lvl - 1)):
            return lvl
    return 0


def _retag(payload: bytes, tid: int, sid: int = 0) -> bytes:
    """Re-wrap a temporal unit's OBUs with a temporal/spatial-id
    extension."""
    out = bytearray()
    for t, p in H.split_obus(payload):
        if t in (c.OBU_FRAME, c.OBU_FRAME_HEADER, c.OBU_TILE_GROUP):
            out += H.wrap_obu(t, p, temporal_id=tid, spatial_id=sid)
        else:
            out += H.wrap_obu(t, p)
    return bytes(out)


def encode_svc_ivf(path: str, frames, width: int, height: int,
                   temporal_layers: int = 2, qindex: int = 90,
                   layer_q_boost: int = 12, fps=(30, 1), **kw) -> None:
    """Temporal-SVC low-delay encode.

    Base layer (tid 0) frames reference and refresh slot 0; enhancement
    frames reference the most recent lower-layer frame and refresh
    nothing (so dropping them never breaks the chain).  Enhancement
    layers run at a higher q (standard SVC rate ladder)."""
    from ..bitstream.ivf import write_ivf
    assert 1 <= temporal_layers <= 3
    sh = make_sequence_header(width, height)
    # operating_point_idc: spatial layer 0 + all temporal layers
    sh.operating_point_idc = (1 << 8) | ((1 << temporal_layers) - 1)
    slots = [None] * 8
    slot_time = [-1] * 8     # frame index stored in each slot
    slot_tid = [9] * 8
    payloads = []
    for i, f in enumerate(frames):
        tid = temporal_layer_of(i, temporal_layers)
        q = min(255, qindex + layer_q_boost * tid)
        if i == 0:
            fh = make_lossy_frame_header(sh, q)
            enc = LossyAllIntraEncoder(sh, fh, **kw)
        else:
            refresh = 0 if (tid == temporal_layers - 1 and tid > 0) \
                else (1 << tid)
            # LAST = newest stored frame from a lower-or-equal layer
            cands = [s for s in range(8)
                     if slot_time[s] >= 0 and slot_tid[s] <= tid]
            ref_slot = max(cands, key=lambda s: slot_time[s])
            fh = make_inter_frame_header(
                sh, q, refresh_frame_flags=refresh,
                ref_frame_idx=(ref_slot,) * 7)
            enc = InterFrameEncoder(sh, fh, slots, **kw)
        payload = enc.encode_frame(f)
        w4, h4 = sh.max_frame_width, sh.max_frame_height
        cw, ch = (w4 + 1) >> 1, (h4 + 1) >> 1
        out = (enc.recon[0][:h4, :w4].copy(),
               enc.recon[1][:ch, :cw].copy(),
               enc.recon[2][:ch, :cw].copy())
        for slot in range(8):
            if fh.refresh_frame_flags & (1 << slot):
                slots[slot] = out
                slot_time[slot] = i
                slot_tid[slot] = tid
        payloads.append((_retag(payload, tid), i))
    write_ivf(path, payloads, width, height, fps[0], fps[1])


# ---------------------------------------------------------------------------
# Spatial SVC (svc_layercontext.c spatial layers / examples/svc_encoder_rtc.c)

def _downscale_plane(plane, out_w: int, out_h: int):
    """Source downsampling for the base layer (non-normative; reference
    analog av1_resize_plane): separable bilinear via the superres
    downscaler run in both directions."""
    import numpy as np
    from ..common.resize import downscale_plane_horz
    t = downscale_plane_horz(plane, out_w)
    t = downscale_plane_horz(np.ascontiguousarray(t.T), out_h)
    return np.ascontiguousarray(t.T)


def encode_svc_spatial_ivf(path: str, frames, width: int, height: int,
                           qindex: int = 80, base_q_boost: int = 14,
                           fps=(30, 1), **kw) -> None:
    """Two-spatial-layer SVC encode (L2T1).

    Each temporal unit carries the base layer at half resolution
    (spatial_id 0, ref slot 1) followed by the enhancement layer at full
    resolution (spatial_id 1, ref slot 0).  The enhancement layer uses
    inter-layer prediction: GOLDEN points at the *current* base-layer
    recon, motion-compensated through the scaled-reference convolve
    (spec is_scaled path), plus normal temporal prediction from the
    previous enhancement frame via LAST.  Decoding only spatial layer 0
    (operating-point drop) yields a valid half-resolution stream.

    Reference: av1/encoder/svc_layercontext.c layer contexts + ref map,
    examples/svc_encoder_rtc.c L2T1 pattern."""
    import numpy as np
    from ..bitstream.ivf import write_ivf
    assert width % 2 == 0 and height % 2 == 0
    bw, bh = width // 2, height // 2
    assert bw % 2 == 0 and bh % 2 == 0, "chroma halves must be integral"
    sh = make_sequence_header(width, height)
    # one operating point spanning both spatial layers at tid 0
    sh.operating_point_idc = (0b11 << 8) | 0b1
    slots = [None] * 8
    payloads = []

    def store(enc, fh):
        w_, h_ = fh.frame_width, fh.frame_height
        cw, ch = (w_ + 1) >> 1, (h_ + 1) >> 1
        out = (enc.recon[0][:h_, :w_].copy(),
               enc.recon[1][:ch, :cw].copy(),
               enc.recon[2][:ch, :cw].copy())
        flags = 0xFF if (fh.frame_type == c.KEY_FRAME and fh.show_frame) \
            else fh.refresh_frame_flags
        for s in range(8):
            if flags & (1 << s):
                slots[s] = out

    for i, f in enumerate(frames):
        q0 = min(255, qindex + base_q_boost)
        base_f = (_downscale_plane(f[0], bw, bh),
                  _downscale_plane(f[1], bw // 2, bh // 2),
                  _downscale_plane(f[2], bw // 2, bh // 2))
        # --- spatial layer 0 (half resolution) ---
        if i == 0:
            fh0 = make_lossy_frame_header(sh, q0, width=bw, height=bh)
            enc0 = LossyAllIntraEncoder(sh, fh0, **kw)
        else:
            fh0 = make_inter_frame_header(
                sh, q0, refresh_frame_flags=1 << 1,
                ref_frame_idx=(1,) * 7, width=bw, height=bh)
            enc0 = InterFrameEncoder(sh, fh0, slots, **kw)
        p0 = enc0.encode_frame(base_f)
        store(enc0, fh0)
        # --- spatial layer 1 (full resolution, inter-layer GOLDEN) ---
        ref_idx = [1] * 7
        if i > 0:
            ref_idx[c.LAST_FRAME - 1] = 0
        fh1 = make_inter_frame_header(
            sh, qindex, refresh_frame_flags=1 << 0,
            ref_frame_idx=tuple(ref_idx))
        ref_list = (c.LAST_FRAME, c.GOLDEN_FRAME) if i > 0 \
            else (c.GOLDEN_FRAME,)
        enc1 = InterFrameEncoder(sh, fh1, slots, ref_list=ref_list, **kw)
        p1 = enc1.encode_frame(f)
        store(enc1, fh1)
        tu = _retag(p0, 0, 0) + _retag(p1, 0, 1)
        payloads.append((tu, i))
    write_ivf(path, payloads, width, height, fps[0], fps[1])
