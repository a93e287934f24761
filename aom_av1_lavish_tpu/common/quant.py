"""Quantization (encoder side) + dequant values.

Behavioral port of the reference quantizer pipeline
(av1/encoder/av1_quantize.c:602 av1_build_quantizer,
aom_dsp/quantize.c:108 aom_quantize_b_helper_c).  Only the dequant side is
normative; the quantize side is matched for rate/quality parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..bitstream import tables


def dc_quant_qtx(qindex: int, delta: int, bd: int = 8) -> int:
    q = max(0, min(255, qindex + delta))
    row = {8: 0, 10: 1, 12: 2}[bd]
    return int(tables.get("dc_quant_qtx")[row][q])


def ac_quant_qtx(qindex: int, delta: int, bd: int = 8) -> int:
    q = max(0, min(255, qindex + delta))
    row = {8: 0, 10: 1, 12: 2}[bd]
    return int(tables.get("ac_quant_qtx")[row][q])


def _invert_quant(d: int):
    t = d
    length = 0
    while t > 1:
        t >>= 1
        length += 1
    m = 1 + (1 << (16 + length)) // d
    quant = m - (1 << 16)
    shift = 1 << (16 - length)
    return quant, shift


@dataclass(frozen=True)
class PlaneQuant:
    zbin: tuple      # (dc, ac)
    round: tuple
    quant: tuple
    quant_shift: tuple
    dequant: tuple


@lru_cache(maxsize=None)
def build_plane_quant(qindex: int, dc_delta: int, ac_delta: int,
                      bd: int = 8, sharpness: int = 0) -> PlaneQuant:
    dcq = dc_quant_qtx(0, 0, bd)  # for qzbin factor rule, q=qindex's table
    base_dc = dc_quant_qtx(qindex, 0, bd)
    thresholds = {8: 148, 10: 592, 12: 2368}[bd]
    qzbin_factor = 64 if qindex == 0 else (84 if base_dc < thresholds else 80)
    qrounding_factor = 64 if qindex == 0 else 48
    if sharpness > 0 and qindex > 0:
        adj = 16 * (7 - sharpness) // 7
        qzbin_factor = 64 + adj
        qrounding_factor = 64 - adj
    elif sharpness < 0 and qindex > 0:
        adj = 16 * (7 + sharpness) // 7
        qzbin_factor = 64 - adj
        qrounding_factor = 64 + adj
    zbin = []
    rnd = []
    quant = []
    qshift = []
    deq = []
    for i in range(2):
        if i == 0:
            qtx = dc_quant_qtx(qindex, dc_delta, bd)
        else:
            qtx = ac_quant_qtx(qindex, ac_delta, bd)
        q_, s_ = _invert_quant(qtx)
        quant.append(q_)
        qshift.append(s_)
        zbin.append((qzbin_factor * qtx + 64) >> 7)
        rnd.append((qrounding_factor * qtx) >> 7)
        deq.append(qtx)
    return PlaneQuant(tuple(zbin), tuple(rnd), tuple(quant), tuple(qshift),
                      tuple(deq))


def quantize_b(coeff_flat: np.ndarray, scan: np.ndarray, pq: PlaneQuant,
               log_scale: int):
    """Returns (qcoeff, dqcoeff, eob).  coeff_flat is col-major flat."""
    n = len(scan)
    qcoeff = np.zeros_like(coeff_flat)
    dqcoeff = np.zeros_like(coeff_flat)
    zbins = [(pq.zbin[0] + (1 << log_scale >> 1)) >> log_scale,
             (pq.zbin[1] + (1 << log_scale >> 1)) >> log_scale] \
        if log_scale else list(pq.zbin)
    # pre-scan: trailing sub-zbin coeffs are skippable
    non_zero_count = n
    for si in range(n - 1, -1, -1):
        rc = int(scan[si])
        v = int(coeff_flat[rc])
        if -zbins[rc != 0] < v < zbins[rc != 0]:
            non_zero_count -= 1
        else:
            break
    eob = -1
    for si in range(non_zero_count):
        rc = int(scan[si])
        v = int(coeff_flat[rc])
        abs_v = abs(v)
        if abs_v >= zbins[rc != 0]:
            rnd = (pq.round[rc != 0] + (1 << log_scale >> 1)) >> log_scale \
                if log_scale else pq.round[rc != 0]
            tmp = min(max(abs_v + rnd, -32768), 32767)
            tmp32 = ((((tmp * pq.quant[rc != 0]) >> 16) + tmp)
                     * pq.quant_shift[rc != 0]) >> (16 - log_scale)
            q = tmp32 if v >= 0 else -tmp32
            qcoeff[rc] = q
            dq = (tmp32 * pq.dequant[rc != 0]) >> log_scale
            dqcoeff[rc] = dq if v >= 0 else -dq
            if tmp32:
                eob = si
    return qcoeff, dqcoeff, eob + 1
