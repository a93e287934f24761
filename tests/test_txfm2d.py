"""2D transform bit-exactness vs the reference C oracle (all sizes/types).

Mirrors the reference kernel-test strategy (av1_fwd_txfm2d_test.cc /
av1_inv_txfm2d_test.cc): random inputs, every valid (tx_size, tx_type).
"""

import ctypes
import os

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import constants as c
from aom_av1_lavish_tpu.common import txfm2d as T2

ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle",
                      "libtxfm2d_oracle.so")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="txfm2d oracle not built")


def _lib():
    lib = ctypes.CDLL(ORACLE)
    return lib


def _valid_types(tx_size):
    w, h = c.TX_WIDTH[tx_size], c.TX_HEIGHT[tx_size]
    out = []
    for t in range(16):
        vk, hk = T2.VTX[t], T2.HTX[t]
        ok = True
        for k, dim in ((vk, h), (hk, w)):
            if dim == 64 and k != 0:
                ok = False
            if dim == 32 and k in (1, 2):
                ok = False
        if ok:
            out.append(t)
    return out


ALL_SIZES = list(range(c.TX_SIZES_ALL))


@pytest.mark.parametrize("tx_size", ALL_SIZES)
def test_fwd_matches_oracle(tx_size):
    lib = _lib()
    rng = np.random.default_rng(tx_size)
    w, h = c.TX_WIDTH[tx_size], c.TX_HEIGHT[tx_size]
    for tx_type in _valid_types(tx_size):
        for _ in range(4):
            resid = rng.integers(-255, 256, (h, w)).astype(np.int16)
            out = np.zeros(w * h, dtype=np.int32)
            lib.txfm2d_fwd(
                tx_size, tx_type,
                resid.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), w,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 8)
            mine = T2.fwd_txfm2d(resid.astype(np.int32), tx_size, tx_type)
            aw, ah = min(w, 32), min(h, 32)
            np.testing.assert_array_equal(mine, out[:aw * ah],
                                          err_msg=f"ts={tx_size} tt={tx_type}")


@pytest.mark.parametrize("tx_size", ALL_SIZES)
def test_inv_matches_oracle(tx_size):
    lib = _lib()
    rng = np.random.default_rng(100 + tx_size)
    w, h = c.TX_WIDTH[tx_size], c.TX_HEIGHT[tx_size]
    aw, ah = min(w, 32), min(h, 32)
    for tx_type in _valid_types(tx_size):
        for _ in range(4):
            # plausible dequantized coeff magnitudes
            coeff = rng.integers(-(1 << 15), 1 << 15, aw * ah).astype(
                np.int32)
            base = rng.integers(0, 256, (h, w)).astype(np.uint16)
            dest = base.copy()
            lib.txfm2d_inv_add(
                tx_size, tx_type,
                coeff.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                dest.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), w, 8)
            mine = T2.inv_txfm2d_add(coeff, base.astype(np.uint8), tx_size,
                                     tx_type)
            np.testing.assert_array_equal(
                mine, dest.astype(np.uint8),
                err_msg=f"ts={tx_size} tt={tx_type}")


@pytest.mark.parametrize("tx_size", [c.TX_4X4, c.TX_8X8, c.TX_16X16,
                                     c.TX_8X16, c.TX_4X16])
def test_roundtrip_small_residual(tx_size):
    """fwd -> exact-dequant -> inv reconstructs close to the input."""
    rng = np.random.default_rng(7)
    w, h = c.TX_WIDTH[tx_size], c.TX_HEIGHT[tx_size]
    resid = rng.integers(-64, 65, (h, w)).astype(np.int32)
    base = np.full((h, w), 128, dtype=np.uint8)
    co = T2.fwd_txfm2d(resid, tx_size, c.DCT_DCT)
    # forward scales by 8*sqrt(w*h)-ish; normative inverse shifts it back
    shift = 0 if w * h <= 256 else (1 if w * h <= 1024 else 2)
    deq = (co >> shift).astype(np.int32)
    rec = T2.inv_txfm2d_add(deq, base, tx_size, c.DCT_DCT)
    err = np.abs(rec.astype(int) - np.clip(resid + 128, 0, 255))
    assert err.mean() < 2.0, err.mean()
