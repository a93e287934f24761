"""Warped motion: unit bit-exactness of warp_affine vs the reference
oracle (av1_warp_affine_c, warped_motion.c:538) over randomized affine
models, block geometries and subsampling."""

import ctypes
import os

import numpy as np
import pytest

from aom_av1_lavish_tpu.common import warp as WP

ROOT = os.path.join(os.path.dirname(__file__), "..")
ORACLE = os.path.join(ROOT, ".oracle", "libwarp_oracle.so")


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
def test_warp_affine_oracle():
    lib = ctypes.CDLL(ORACLE)
    rng = np.random.default_rng(7)
    for ss in (0, 1):
        w, h = (176, 144) if ss == 0 else (88, 72)
        ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
        for _ in range(120):
            pw = int(rng.choice([8, 16, 32]))
            ph = int(rng.choice([8, 16, 32]))
            pcol = int(rng.integers(-8, w))
            prow = int(rng.integers(-8, h))
            # shear params are multiples of 1 << WARP_PARAM_REDUCE_BITS
            a, b, g, d = (int(rng.integers(-3, 4)) * 64 for _ in range(4))
            mat = [int(rng.integers(-50, 50)) << 16,
                   int(rng.integers(-50, 50)) << 16,
                   (1 << 16) + int(rng.integers(-2000, 2000)),
                   int(rng.integers(-2000, 2000)),
                   int(rng.integers(-2000, 2000)),
                   (1 << 16) + int(rng.integers(-2000, 2000))]
            pred_ref = np.zeros((ph, pw), np.uint8)
            matc = (ctypes.c_int32 * 6)(*mat)
            lib.oracle_warp(
                matc, ref.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                w, h, w,
                pred_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                pcol, prow, pw, ph, pw, ss, ss, a, b, g, d)
            pred_our = np.empty((ph, pw), np.uint8)
            WP.warp_affine(np.array(mat, np.int64), ref, pred_our,
                           pcol, prow, pw, ph, ss, ss, a, b, g, d)
            np.testing.assert_array_equal(
                pred_our, pred_ref,
                err_msg=f"mat={mat} abgd={(a, b, g, d)} "
                        f"at ({pcol},{prow}) {pw}x{ph} ss={ss}")
