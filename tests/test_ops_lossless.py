"""JAX batched analyze path vs the scalar host reference (bit-exact)."""

import numpy as np
import pytest

from aom_av1_lavish_tpu.common.txfm import fwht4x4
from aom_av1_lavish_tpu.ops.lossless import (analyze_for_encoder,
                                             fwht4x4_batched)


@pytest.mark.parametrize("seed", range(4))
def test_batched_wht_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    res = rng.integers(-255, 256, (64, 4, 4)).astype(np.int32)
    got = np.asarray(fwht4x4_batched(res))
    for i in range(len(res)):
        np.testing.assert_array_equal(got[i], fwht4x4(res[i]))


def _host_dc_qcoeff(plane):
    """Scalar reference of the batched analyze (DC-from-source rule)."""
    H, W = plane.shape
    s = plane.astype(np.int64)
    out = np.zeros((H // 4, W // 4, 16), dtype=np.int32)
    for r4 in range(H // 4):
        for c4 in range(W // 4):
            py, px = r4 * 4, c4 * 4
            st = s[py - 1, px:px + 4].sum() if py else 0
            sl = s[py:py + 4, px - 1].sum() if px else 0
            if py and px:
                dc = (st + sl + 4) >> 3
            elif py:
                dc = (st + 2) >> 2
            elif px:
                dc = (sl + 2) >> 2
            else:
                dc = 128
            resid = s[py:py + 4, px:px + 4] - dc
            out[r4, c4] = (fwht4x4(resid.astype(np.int32)) >> 2).ravel()
    return out


@pytest.mark.parametrize("seed", range(3))
def test_analyze_matches_host(seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    u = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    rs = analyze_for_encoder([y, u, v])
    for plane, (q, z) in zip((y, u, v), rs):
        want = _host_dc_qcoeff(plane)
        np.testing.assert_array_equal(q, want)
        np.testing.assert_array_equal(z, np.all(want == 0, axis=-1))
