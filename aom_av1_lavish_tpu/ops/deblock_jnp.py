"""Device (jnp) deblocking for the fixed-16x16 encode paths.

Normative AV1 loop filter (spec 7.14; reference behavior:
av1/common/av1_loopfilter.c + aom_dsp/loopfilter.c) specialized to the
layout the device encoders emit: every luma block BLOCK_16X16 with
TX_16X16, chroma TX_8X8, loop_filter_delta_enabled=0, segmentation off.
Under that syntax every interior 16-aligned luma edge takes the 14-tap
filter and every interior 8-aligned chroma edge the 6-tap filter, with a
single frame-wide level per plane/direction — the per-edge (length,
level) dispatch of the general host filter (common/loopfilter.py)
collapses into two uniform strided passes per plane, which XLA fuses
into a handful of elementwise kernels.

Tap extraction and write-back use STATIC strided slices (start::16), so
nothing here is a gather; the filter level arrives as a traced scalar
(per-frame q-derived level inside the GF-group chain scan) and selects
its (lim, mblim) from a 64-entry constant table.

Bit-exactness vs the host filter (and therefore vs the decoder) is
pinned by tests/test_deblock_jnp.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..common.loopfilter import sharpness_limits

_LIM_TABS = {}


def _lim_tables(sharpness: int):
    tabs = _LIM_TABS.get(sharpness)
    if tabs is None:
        lim, mblim = sharpness_limits(sharpness)
        tabs = (np.asarray(lim, np.int32), np.asarray(mblim, np.int32))
        _LIM_TABS[sharpness] = tabs
    return tabs


def _filter4_core(p1, p0, q0, q1, mask, hev):
    """filter4 (aom_dsp/loopfilter.c filter4) on int32 arrays centred at
    +-128; returns (op1, op0, oq0, oq1)."""
    clamp = lambda x: jnp.clip(x, -128, 127)  # noqa: E731
    ps1, ps0 = p1 - 128, p0 - 128
    qs0, qs1 = q0 - 128, q1 - 128
    f = jnp.where(hev, clamp(ps1 - qs1), 0)
    f = jnp.where(mask, clamp(f + 3 * (qs0 - ps0)), 0)
    f1 = clamp(f + 4) >> 3
    f2 = clamp(f + 3) >> 3
    oq0 = clamp(qs0 - f1) + 128
    op0 = clamp(ps0 + f2) + 128
    f3 = jnp.where(hev, 0, (f1 + 1) >> 1)
    oq1 = clamp(qs1 - f3) + 128
    op1 = clamp(ps1 + f3) + 128
    return op1, op0, oq0, oq1


def _filter14(P, Q, lim, mblim, thresh):
    """14-tap luma edge filter on tap arrays P[0..6] (p0..p6), Q[0..6].
    Returns dict {('p'|'q', i): new_value} for i in 0..5."""
    ad = lambda a, b: jnp.abs(a - b)  # noqa: E731
    mask = ~((ad(P[3], P[2]) > lim) | (ad(P[2], P[1]) > lim)
             | (ad(P[1], P[0]) > lim) | (ad(Q[1], Q[0]) > lim)
             | (ad(Q[2], Q[1]) > lim) | (ad(Q[3], Q[2]) > lim)
             | (ad(P[0], Q[0]) * 2 + (ad(P[1], Q[1]) >> 1) > mblim))
    flat = ~((ad(P[1], P[0]) > 1) | (ad(Q[1], Q[0]) > 1)
             | (ad(P[2], P[0]) > 1) | (ad(Q[2], Q[0]) > 1)
             | (ad(P[3], P[0]) > 1) | (ad(Q[3], Q[0]) > 1))
    flat2 = ~((ad(P[6], P[0]) > 1) | (ad(P[5], P[0]) > 1)
              | (ad(P[4], P[0]) > 1) | (ad(Q[4], Q[0]) > 1)
              | (ad(Q[5], Q[0]) > 1) | (ad(Q[6], Q[0]) > 1))
    hev = (ad(P[1], P[0]) > thresh) | (ad(Q[1], Q[0]) > thresh)
    o1, o0, oq0, oq1 = _filter4_core(P[1], P[0], Q[0], Q[1],
                                     mask & ~flat, hev)
    r2 = lambda x: (x + 4) >> 3  # noqa: E731
    f8p2 = r2(P[3] * 3 + 2 * P[2] + P[1] + P[0] + Q[0])
    f8p1 = r2(P[3] * 2 + P[2] + 2 * P[1] + P[0] + Q[0] + Q[1])
    f8p0 = r2(P[3] + P[2] + P[1] + 2 * P[0] + Q[0] + Q[1] + Q[2])
    f8q0 = r2(P[2] + P[1] + P[0] + 2 * Q[0] + Q[1] + Q[2] + Q[3])
    f8q1 = r2(P[1] + P[0] + Q[0] + 2 * Q[1] + Q[2] + 2 * Q[3])
    f8q2 = r2(P[0] + Q[0] + Q[1] + 2 * Q[2] + 3 * Q[3])
    fm = flat & mask
    out = {("p", 2): jnp.where(fm, f8p2, P[2]),
           ("p", 1): jnp.where(fm, f8p1, o1),
           ("p", 0): jnp.where(fm, f8p0, o0),
           ("q", 0): jnp.where(fm, f8q0, oq0),
           ("q", 1): jnp.where(fm, f8q1, oq1),
           ("q", 2): jnp.where(fm, f8q2, Q[2])}
    fm2 = flat2 & fm
    r4 = lambda x: (x + 8) >> 4  # noqa: E731
    p6, p5, p4, p3, p2, p1, p0 = P[6], P[5], P[4], P[3], P[2], P[1], P[0]
    q0, q1, q2, q3, q4, q5, q6 = Q[0], Q[1], Q[2], Q[3], Q[4], Q[5], Q[6]
    n = {
        ("p", 5): r4(p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0),
        ("p", 4): r4(p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0
                     + q0 + q1),
        ("p", 3): r4(p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0
                     + q0 + q1 + q2),
        ("p", 2): r4(p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0
                     + q0 + q1 + q2 + q3),
        ("p", 1): r4(p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2
                     + q0 + q1 + q2 + q3 + q4),
        ("p", 0): r4(p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2
                     + q1 + q2 + q3 + q4 + q5),
        ("q", 0): r4(p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2
                     + q2 + q3 + q4 + q5 + q6),
        ("q", 1): r4(p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2
                     + q3 + q4 + q5 + q6 * 2),
        ("q", 2): r4(p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2
                     + q4 + q5 + q6 * 3),
        ("q", 3): r4(p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2
                     + q5 + q6 * 4),
        ("q", 4): r4(p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2
                     + q6 * 5),
        ("q", 5): r4(p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7),
    }
    res = {}
    for i in range(6):
        base_p = out.get(("p", i), P[i] if i < 7 else None)
        base_q = out.get(("q", i), Q[i] if i < 7 else None)
        if base_p is None:
            base_p = P[i]
        if base_q is None:
            base_q = Q[i]
        res[("p", i)] = jnp.where(fm2, n[("p", i)], base_p)
        res[("q", i)] = jnp.where(fm2, n[("q", i)], base_q)
    return res


def _filter6(P, Q, lim, mblim, thresh):
    """6-tap chroma edge filter on taps P[0..2], Q[0..2]; returns new
    (p1, p0, q0, q1)."""
    ad = lambda a, b: jnp.abs(a - b)  # noqa: E731
    mask = ~((ad(P[2], P[1]) > lim) | (ad(P[1], P[0]) > lim)
             | (ad(Q[1], Q[0]) > lim) | (ad(Q[2], Q[1]) > lim)
             | (ad(P[0], Q[0]) * 2 + (ad(P[1], Q[1]) >> 1) > mblim))
    flat = ~((ad(P[1], P[0]) > 1) | (ad(Q[1], Q[0]) > 1)
             | (ad(P[2], P[0]) > 1) | (ad(Q[2], Q[0]) > 1))
    hev = (ad(P[1], P[0]) > thresh) | (ad(Q[1], Q[0]) > thresh)
    o1, o0, oq0, oq1 = _filter4_core(P[1], P[0], Q[0], Q[1],
                                     mask & ~flat, hev)
    fm = flat & mask
    r2 = lambda x: (x + 4) >> 3  # noqa: E731
    n_p1 = r2(P[2] * 3 + P[1] * 2 + P[0] * 2 + Q[0])
    n_p0 = r2(P[2] + P[1] * 2 + P[0] * 2 + Q[0] * 2 + Q[1])
    n_q0 = r2(P[1] + P[0] * 2 + Q[0] * 2 + Q[1] * 2 + Q[2])
    n_q1 = r2(P[0] + Q[0] * 2 + Q[1] * 2 + Q[2] * 3)
    return (jnp.where(fm, n_p1, o1), jnp.where(fm, n_p0, o0),
            jnp.where(fm, n_q0, oq0), jnp.where(fm, n_q1, oq1))


def _edge_pass(plane, step, ntaps, nmod, filt, lim, mblim, thresh,
               horizontal, edge_mask=None):
    """One direction's uniform-grid edge pass.

    plane: (H, W) int32.  Edges every `step` pixels (interior only);
    ntaps taps read each side, nmod written each side.  filt is
    _filter14 (returns a dict) or _filter6 (returns a 4-tuple).
    edge_mask: optional (rows, K) bool — False edges are left
    untouched (interior edges of merged coding blocks, which under
    tx==block syntax are neither transform nor prediction boundaries)."""
    if horizontal:
        plane = plane.T
    W = plane.shape[1]
    K = W // step - 1
    if K <= 0:
        return plane.T if horizontal else plane
    span = step * K
    # taps: p_i at column e*step - 1 - i, q_i at e*step + i (e = 1..K)
    P = [plane[:, step - 1 - i:step - 1 - i + span:step] for i in
         range(ntaps)]
    Q = [plane[:, step + i:step + i + span:step] for i in range(ntaps)]
    res = filt(P, Q, lim, mblim, thresh)
    if isinstance(res, tuple):
        res = {("p", 1): res[0], ("p", 0): res[1],
               ("q", 0): res[2], ("q", 1): res[3]}
    for i in range(nmod):
        new_p = res[("p", i)]
        new_q = res[("q", i)]
        if edge_mask is not None:
            new_p = jnp.where(edge_mask, new_p, P[i])
            new_q = jnp.where(edge_mask, new_q, Q[i])
        plane = plane.at[:, step - 1 - i:step - 1 - i + span:step].set(
            new_p)
        plane = plane.at[:, step + i:step + i + span:step].set(new_q)
    return plane.T if horizontal else plane


def deblock_fixed16(rec_y, rec_u, rec_v, lvl_y, lvl_uv_u, lvl_uv_v,
                    sharpness: int = 0):
    """Deblock uint8 420 recon planes of a fixed-16x16/TX16/TX8 frame.

    lvl_y / lvl_uv_u / lvl_uv_v: traced int32 scalars (0 disables the
    plane, matching the decoder's filter_level gating).  Returns the
    filtered planes as uint8.  Vertical edges first, then horizontal —
    the normative pass order."""
    lim_tab, mblim_tab = _lim_tables(sharpness)
    lim_t = jnp.asarray(lim_tab)
    mblim_t = jnp.asarray(mblim_tab)

    def plane_pass(plane_u8, lvl, step, ntaps, nmod, filt):
        p32 = jnp.asarray(plane_u8).astype(jnp.int32)
        lvl = jnp.asarray(lvl, jnp.int32)
        lim = jnp.take(lim_t, lvl)
        mblim = jnp.take(mblim_t, lvl)
        thresh = lvl >> 4
        out = _edge_pass(p32, step, ntaps, nmod, filt, lim, mblim,
                         thresh, horizontal=False)
        out = _edge_pass(out, step, ntaps, nmod, filt, lim, mblim,
                         thresh, horizontal=True)
        out = jnp.clip(out, 0, 255)
        return jnp.where(lvl > 0, out, p32).astype(jnp.uint8)

    y = plane_pass(rec_y, lvl_y, 16, 7, 6, _filter14)
    u = plane_pass(rec_u, lvl_uv_u, 8, 3, 2, _filter6)
    v = plane_pass(rec_v, lvl_uv_v, 8, 3, 2, _filter6)
    return y, u, v


def deblock_leafmask(rec_y, rec_u, rec_v, lvl_y, lvl_uv_u, lvl_uv_v,
                     leaf_id, sharpness: int = 0):
    """Deblock planes of a variable-partition frame (leaves in {16, 32,
    64} squares, tx == block size).

    leaf_id: (nby, nbx) int32 per-16x16-block coding-leaf id — a
    16-grid edge is filtered iff the ids on its two sides differ (it is
    then a prediction AND transform boundary, so the normative filter
    applies unconditionally; equal ids mean the edge is interior to a
    merged block and must not be touched — av1_loopfilter.c builds the
    same masks from the tx/block size grids).  Chroma edges at the
    8-px grid map 1:1 onto the luma 16-grid edges because every leaf's
    chroma transform spans exactly its chroma area."""
    lim_tab, mblim_tab = _lim_tables(sharpness)
    lim_t = jnp.asarray(lim_tab)
    mblim_t = jnp.asarray(mblim_tab)
    von = leaf_id[:, 1:] != leaf_id[:, :-1]    # (nby, nbx-1)
    hon = leaf_id[1:, :] != leaf_id[:-1, :]    # (nby-1, nbx)

    def plane_pass(plane_u8, lvl, step, ntaps, nmod, filt):
        p32 = jnp.asarray(plane_u8).astype(jnp.int32)
        lvl = jnp.asarray(lvl, jnp.int32)
        lim = jnp.take(lim_t, lvl)
        mblim = jnp.take(mblim_t, lvl)
        thresh = lvl >> 4
        vmask = jnp.repeat(von, step, axis=0)        # (rows, K)
        hmask = jnp.repeat(hon.T, step, axis=0)      # (cols, K)
        out = _edge_pass(p32, step, ntaps, nmod, filt, lim, mblim,
                         thresh, horizontal=False, edge_mask=vmask)
        out = _edge_pass(out, step, ntaps, nmod, filt, lim, mblim,
                         thresh, horizontal=True, edge_mask=hmask)
        out = jnp.clip(out, 0, 255)
        return jnp.where(lvl > 0, out, p32).astype(jnp.uint8)

    y = plane_pass(rec_y, lvl_y, 16, 7, 6, _filter14)
    u = plane_pass(rec_u, lvl_uv_u, 8, 3, 2, _filter6)
    v = plane_pass(rec_v, lvl_uv_v, 8, 3, 2, _filter6)
    return y, u, v
