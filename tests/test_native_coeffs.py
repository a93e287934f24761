"""Native fast paths (runtime/coeff_dec.c, txfm_inv.c) must be
byte-exact with the Python reference implementations."""

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import constants as c
from aom_av1_lavish_tpu.bitstream import tables
from aom_av1_lavish_tpu.common import quant as Q
from aom_av1_lavish_tpu.common import txfm2d as T2
from aom_av1_lavish_tpu.runtime import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native runtime unavailable")

SIZES = [c.TX_4X4, c.TX_8X8, c.TX_16X16, c.TX_32X32, c.TX_64X64,
         c.TX_4X8, c.TX_8X4, c.TX_8X16, c.TX_16X8, c.TX_16X32,
         c.TX_32X16, c.TX_4X16, c.TX_16X4, c.TX_8X32, c.TX_32X8,
         c.TX_32X64, c.TX_64X32, c.TX_16X64, c.TX_64X16]


def _valid_types(ts):
    from aom_av1_lavish_tpu.common import txtype as TT
    out = []
    for tt in range(16):
        st = TT.ext_tx_set_type(ts, False, False)
        sti = TT.ext_tx_set_type(ts, True, False)
        if TT.EXT_TX_USED[st][tt] or TT.EXT_TX_USED[sti][tt]:
            out.append(tt)
    return out or [0]


@pytest.mark.parametrize("ts", SIZES)
def test_native_fwd_matches_python(ts):
    rng = np.random.default_rng(ts)
    h, w = c.TX_HEIGHT[ts], c.TX_WIDTH[ts]
    for tt in _valid_types(ts):
        for bd in (8, 10):
            resid = rng.integers(-(1 << bd) + 1, 1 << bd,
                                 (h, w)).astype(np.int32)
            a = T2.fwd_txfm2d(resid, ts, tt, bd)
            import aom_av1_lavish_tpu.common.txfm2d as t2mod
            saved = t2mod._native_inv
            t2mod._native_inv = None
            try:
                b = T2.fwd_txfm2d(resid, ts, tt, bd)
            finally:
                t2mod._native_inv = saved
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"ts={ts} tt={tt}")


@pytest.mark.parametrize("ts", [c.TX_4X4, c.TX_8X8, c.TX_16X16,
                                c.TX_32X32, c.TX_8X16, c.TX_16X8])
def test_native_quantize_matches_python(ts):
    rng = np.random.default_rng(ts + 100)
    from aom_av1_lavish_tpu.common import coeffs as CF
    adj = CF.adjusted_tx_size(ts)
    n = c.TX_WIDTH[adj] * c.TX_HEIGHT[adj]
    scan = tables.scan(adj, 0)
    ls = CF._tx_scale(ts)
    import aom_av1_lavish_tpu.common.quant as qmod
    for q in (20, 80, 160):
        pq = Q.build_plane_quant(q, 0, 0)
        for use_qm in (False, True):
            qm = Q.qm_table(6, 0, ts) if use_qm else None
            iqm = Q.iqm_table(6, 0, ts) if use_qm else None
            coeff = rng.integers(-4000, 4000, n).astype(np.int32)
            a = Q.quantize_b(coeff, scan, pq, ls, qm=qm, iqm=iqm)
            saved = qmod._native_quant
            qmod._native_quant = None
            try:
                b = Q.quantize_b(coeff, scan, pq, ls, qm=qm, iqm=iqm)
            finally:
                qmod._native_quant = saved
            assert a[2] == b[2]
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_array_equal(a[1], b[1])


def test_native_lossless_tile_decode_matches_python(tmp_path):
    """runtime/lossless_dec.c: whole-tile C decode must be pixel-exact
    with the Python reference walk on our lossless streams (random
    content + odd dims exercise edge SBs and the skip contexts)."""
    import subprocess
    import sys
    from aom_av1_lavish_tpu.encoder import encode_lossless_ivf
    from aom_av1_lavish_tpu.decoder import decode_ivf
    rng = np.random.default_rng(3)
    for (w, h) in ((96, 64), (100, 76), (64, 80)):
        y = ((rng.integers(0, 256, (h, w)) // 3)
             + 80 * np.sin(np.mgrid[0:h, 0:w][1] / 13.0)
             ).clip(0, 255).astype(np.uint8)
        u = rng.integers(90, 170, ((h + 1) // 2, (w + 1) // 2)) \
            .astype(np.uint8)
        v = rng.integers(90, 170, ((h + 1) // 2, (w + 1) // 2)) \
            .astype(np.uint8)
        p = str(tmp_path / "l.ivf")
        encode_lossless_ivf(p, [(y, u, v)], w, h)
        d = decode_ivf(p)[0]
        for a, b in zip(d, (y, u, v)):
            np.testing.assert_array_equal(a, b)
