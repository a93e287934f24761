"""JAX batched transforms must be bit-exact with the host numpy engine."""

from functools import partial

import jax
import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import constants as c
from aom_av1_lavish_tpu.common import txfm2d as T2
from aom_av1_lavish_tpu.ops import txfm_jax as TJ

CASES = [
    (c.TX_4X4, c.DCT_DCT), (c.TX_4X4, c.ADST_ADST), (c.TX_4X4, c.IDTX),
    (c.TX_8X8, c.DCT_DCT), (c.TX_8X8, c.FLIPADST_DCT),
    (c.TX_16X16, c.DCT_DCT), (c.TX_16X16, c.V_DCT),
    (c.TX_8X16, c.ADST_DCT), (c.TX_16X8, c.DCT_DCT),
    (c.TX_32X32, c.DCT_DCT), (c.TX_64X64, c.DCT_DCT),
    (c.TX_32X64, c.DCT_DCT),
]


@pytest.mark.parametrize("ts,tt", CASES)
def test_fwd_inv_batched_match_host(ts, tt):
    rng = np.random.default_rng(ts * 16 + tt)
    h, w = c.TX_HEIGHT[ts], c.TX_WIDTH[ts]
    aw, ah = min(w, 32), min(h, 32)
    fwd = jax.jit(partial(TJ.fwd_txfm2d_batched, tx_size=ts, tx_type=tt))
    inv = jax.jit(partial(TJ.inv_txfm2d_add_batched, tx_size=ts, tx_type=tt))
    resid = rng.integers(-255, 256, (4, h, w)).astype(np.int32)
    got = np.asarray(fwd(resid))
    for i in range(4):
        want = T2.fwd_txfm2d(resid[i], ts, tt)
        np.testing.assert_array_equal(got[i], want)
    coeff = rng.integers(-(1 << 15), 1 << 15, (4, aw * ah)).astype(np.int32)
    pred = rng.integers(0, 256, (4, h, w)).astype(np.uint8)
    got = np.asarray(inv(coeff, pred))
    for i in range(4):
        want = T2.inv_txfm2d_add(coeff[i], pred[i], ts, tt)
        np.testing.assert_array_equal(got[i], want)
