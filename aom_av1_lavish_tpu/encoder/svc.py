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


def _retag(payload: bytes, tid: int) -> bytes:
    """Re-wrap a temporal unit's OBUs with a temporal_id extension."""
    out = bytearray()
    for t, p in H.split_obus(payload):
        if t in (c.OBU_FRAME, c.OBU_FRAME_HEADER, c.OBU_TILE_GROUP):
            out += H.wrap_obu(t, p, temporal_id=tid)
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
