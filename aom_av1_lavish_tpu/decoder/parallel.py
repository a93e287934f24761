"""Parallel decode orchestration.

Re-designs the reference's decoder-side parallelism (frame-parallel
output queue in av1_dx_iface.c, tile/row workers in decodeframe.c) at
the granularity that suits this runtime: temporal units are split into
independent keyframe-delimited segments (no cross-references), and the
segments decode in a process pool.  Within a segment, decode is the
ordinary serial conformant path.
"""

from __future__ import annotations

from ..bitstream import constants as c
from ..bitstream import headers as H


def _is_keyframe_tu(payload: bytes) -> bool:
    """True when the TU starts a new prediction chain (shown keyframe)."""
    for obu_type, p in H.split_obus(payload):
        if obu_type in (c.OBU_FRAME, c.OBU_FRAME_HEADER):
            if not p:
                return False
            r0 = p[0]
            if r0 & 0x80:          # show_existing_frame
                return False
            frame_type = (r0 >> 5) & 3
            return frame_type == c.KEY_FRAME and ((r0 >> 4) & 1) == 1
    return False


def split_segments(tus) -> list:
    """Group TUs into keyframe-delimited, independently-decodable runs."""
    segments = []
    cur = []
    for tu in tus:
        if cur and _is_keyframe_tu(tu):
            segments.append(cur)
            cur = []
        cur.append(tu)
    if cur:
        segments.append(cur)
    return segments


def _decode_segment(tus):
    from .decoder import decode_frame_obus
    sh = None
    state = {"slots": [None] * 8}
    frames = []
    for tu in tus:
        fr, sh = decode_frame_obus(tu, sh, state)
        frames.extend(fr)
    return frames


def decode_ivf_parallel(path: str, workers: int = 2):
    """Frame-parallel decode of an IVF file; bit-identical to the serial
    decode_ivf.  Needs the sequence header repeated at keyframes (our
    encoders and aomenc defaults do this)."""
    from ..bitstream.ivf import read_ivf
    tus = [p for p, _ in read_ivf(path)]
    segments = split_segments(tus)
    if workers <= 1 or len(segments) <= 1:
        out = []
        for seg in segments:
            out.extend(_decode_segment(seg))
        return out
    import multiprocessing as mp
    with mp.get_context("fork").Pool(min(workers, len(segments))) as pool:
        results = pool.map(_decode_segment, segments)
    out = []
    for fr in results:
        out.extend(fr)
    return out
