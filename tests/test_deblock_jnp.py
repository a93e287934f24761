"""Device (jnp) deblock vs the host normative loop filter — bit-exact.

The device encode paths emit fixed 16x16 blocks (TX_16X16 luma, TX_8X8
chroma, no LF deltas); ops/deblock_jnp.py filters that layout on device
so the GF-group chain can carry FILTERED references without a host
round trip.  These tests pin it to common/loopfilter.py (which the
decoder uses and which is itself corpus-pinned to stock aomdec)."""

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import constants as c
from aom_av1_lavish_tpu.bitstream.headers import FrameHeader
from aom_av1_lavish_tpu.common import loopfilter as LF
from aom_av1_lavish_tpu.encoder.encoder import make_sequence_header


def _host_filter(planes, sh, lvl, sharpness=0):
    h, w = planes[0].shape
    mh, mw = h // 4, w // 4
    fh = FrameHeader(frame_type=c.INTER_FRAME, base_q_idx=60)
    fh.filter_level = (lvl, lvl)
    fh.filter_level_u = lvl
    fh.filter_level_v = lvl
    fh.sharpness_level = sharpness
    fh.loop_filter_delta_enabled = 0
    txw4 = np.full((mh, mw), 4, np.int64)
    txh4 = np.full((mh, mw), 4, np.int64)
    bsg = np.full((mh, mw), c.BLOCK_16X16, np.int32)
    ref_grid = np.full((mh, mw), c.LAST_FRAME, np.int32)
    mode_grid = np.full((mh, mw), 13, np.int32)   # NEARESTMV
    rng = np.random.default_rng(7)
    skip = np.repeat(np.repeat(
        rng.integers(0, 2, (mh // 4, mw // 4)), 4, 0), 4, 1).astype(
            np.int32)
    out = [p.copy() for p in planes]
    LF.loop_filter_frame(out, fh, sh, txw4, txh4, bsg, ref_grid,
                         mode_grid, skip, lambda p, b: c.TX_8X8, bd=8)
    return out


def _mk_planes(h, w, seed=0, blocky=True):
    rng = np.random.default_rng(seed)
    if blocky:
        # blockwise-flat + noise: exercises flat/flat2/hev branches
        y = np.kron(rng.integers(0, 256, (h // 16, w // 16)),
                    np.ones((16, 16))).astype(np.int32)
        y = (y + rng.integers(-3, 4, (h, w))).clip(0, 255) \
            .astype(np.uint8)
        u = np.kron(rng.integers(0, 256, (h // 16, w // 16)),
                    np.ones((8, 8))).astype(np.int32)
        u = (u + rng.integers(-2, 3, (h // 2, w // 2))).clip(0, 255) \
            .astype(np.uint8)
        v = (255 - u).astype(np.uint8)
    else:
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    return [y, u, v]


@pytest.mark.parametrize("lvl", [0, 7, 21, 42, 63])
@pytest.mark.parametrize("blocky", [True, False])
def test_deblock_fixed16_bit_exact(lvl, blocky):
    from aom_av1_lavish_tpu.ops.deblock_jnp import deblock_fixed16
    h, w = 96, 128
    sh = make_sequence_header(w, h)
    planes = _mk_planes(h, w, seed=lvl + blocky, blocky=blocky)
    ref = _host_filter(planes, sh, lvl)
    got = deblock_fixed16(planes[0], planes[1], planes[2],
                          np.int32(lvl), np.int32(lvl), np.int32(lvl))
    for i, (a, b) in enumerate(zip(got, ref)):
        assert np.array_equal(np.asarray(a), b), \
            f"plane {i} mismatch at lvl={lvl}"


@pytest.mark.parametrize("sharpness", [1, 4, 7])
def test_deblock_fixed16_sharpness(sharpness):
    from aom_av1_lavish_tpu.ops.deblock_jnp import deblock_fixed16
    h, w = 64, 96
    sh = make_sequence_header(w, h)
    planes = _mk_planes(h, w, seed=sharpness)
    ref = _host_filter(planes, sh, 35, sharpness)
    got = deblock_fixed16(planes[0], planes[1], planes[2],
                          np.int32(35), np.int32(35), np.int32(35),
                          sharpness=sharpness)
    for i, (a, b) in enumerate(zip(got, ref)):
        assert np.array_equal(np.asarray(a), b), f"plane {i} mismatch"


def test_deblock_fixed16_distinct_chroma_levels():
    from aom_av1_lavish_tpu.ops.deblock_jnp import deblock_fixed16
    h, w = 64, 64
    sh = make_sequence_header(w, h)
    planes = _mk_planes(h, w, seed=3)
    # u filtered at 30, v disabled: v must come back untouched
    got = deblock_fixed16(planes[0], planes[1], planes[2],
                          np.int32(30), np.int32(30), np.int32(0))
    assert np.array_equal(np.asarray(got[2]), planes[2])
    assert not np.array_equal(np.asarray(got[1]), planes[1])
