"""1D transform bit-exactness vs the reference C oracle (all kernels)."""

import ctypes
import os

import numpy as np
import pytest

from aom_av1_lavish_tpu.common import txfm1d as T

ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle",
                      "libtxfm1d_oracle.so")
pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="txfm1d oracle not built")

INV = [(0, 4, "dct"), (1, 8, "dct"), (2, 16, "dct"), (3, 32, "dct"),
       (4, 64, "dct"), (5, 4, "adst"), (6, 8, "adst"), (7, 16, "adst"),
       (8, 4, "identity"), (9, 8, "identity"), (18, 16, "identity"),
       (19, 32, "identity")]
FWD = [(10, 4, "dct"), (11, 8, "dct"), (12, 16, "dct"), (13, 32, "dct"),
       (14, 64, "dct"), (15, 4, "adst"), (16, 8, "adst"), (17, 16, "adst"),
       (20, 4, "identity"), (21, 8, "identity"), (22, 16, "identity"),
       (23, 32, "identity")]


def _oracle(lib, kind, x, cos_bit, ranges):
    out = np.zeros(len(x), dtype=np.int32)
    sr = np.asarray(ranges, dtype=np.int8)
    lib.txfm1d_run(
        kind, np.asarray(x, dtype=np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cos_bit,
        sr.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out


@pytest.mark.parametrize("kind,n,tname", INV)
def test_inverse_1d(kind, n, tname):
    lib = ctypes.CDLL(ORACLE)
    rng = np.random.default_rng(kind)
    for _ in range(100):
        x = rng.integers(-(1 << 15), 1 << 15, n)
        ref = _oracle(lib, kind, x, 12, [0] + [16] * 15)
        mine = T.inv_txfm1d(x, tname, n, [16] * 14, 12)
        np.testing.assert_array_equal(mine.astype(np.int32), ref)


@pytest.mark.parametrize("kind,n,tname", FWD)
def test_forward_1d(kind, n, tname):
    lib = ctypes.CDLL(ORACLE)
    rng = np.random.default_rng(kind)
    for _ in range(100):
        x = rng.integers(-(1 << 13), 1 << 13, n)
        ref = _oracle(lib, kind, x, 13, [20] * 16)
        mine = T.fwd_txfm1d(x, tname, n, 13)
        np.testing.assert_array_equal(mine.astype(np.int32), ref)
