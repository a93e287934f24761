"""TPU-batched P-frame encoding: motion search + MC + transform coding.

Inter blocks only read the (fixed) reference frame, so unlike intra there
is no wavefront dependency at all: every 16x16 block's motion search,
motion compensation, forward transform, quantization and reconstruction
runs as ONE batched jit invocation over the whole frame.  The host then
walks the fixed partition tree and feeds the entropy coder
(encoder/tpu_inter.py).

Search: 3-stage fullpel grid refinement (stride 4/2/1 over +-16) then a
5x5 quarter-pel refine through the normative 8-tap interpolator.  The MC
math mirrors common/interpred.py bit-exactly (verified against the
convolve oracle via the conformance tests).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..bitstream import constants as c
from ..common import interpred as IP
from ..common import quant as Q
from ..common import coeffs as CF
from ..bitstream import tables
from .txfm_jax import fwd_txfm2d_batched, inv_txfm2d_add_batched
from .wavefront import _quantize_jnp, _est_bits, _PQ, _pq_array

PADR = 64          # device ref padding (>= clamp overshoot + taps)
FILT8 = jnp.asarray(IP.SUBPEL_FILTERS_8)    # (16, 8) regular


def _round2(x, n):
    return (x + (1 << (n - 1))) >> n


def _gather_blocks(plane, base_r, base_c, h, w):
    """plane (H', W'); base_r/base_c (B,) -> (B, h, w)."""
    rr = base_r[:, None, None] + jnp.arange(h)[None, :, None]
    cc = base_c[:, None, None] + jnp.arange(w)[None, None, :]
    return plane[rr, cc]


def _mc_block(refp, x0, y0, bw, bh, mv_r_q4, mv_c_q4):
    """Batched single-ref convolve (av1_convolve_2d_sr family) for blocks
    of size (bh, bw) at plane coords (x0, y0) (B,), mv already clamped,
    in q4 plane units.  refp is PADR-padded; returns (B, bh, bw) uint8."""
    pos_r = (y0 << 4) + mv_r_q4
    pos_c = (x0 << 4) + mv_c_q4
    fr = pos_r >> 4
    fc = pos_c >> 4
    sr = pos_r & 15
    sc = pos_c & 15
    region = _gather_blocks(refp, PADR + fr - 3, PADR + fc - 3,
                            bh + 7, bw + 7).astype(jnp.int32)
    kx = FILT8[sc]          # (B, 8)
    ky = FILT8[sr]
    # horizontal pass -> (B, bh+7, bw), int16 wrap not reachable at bd8
    acc = jnp.zeros(region.shape[:1] + (bh + 7, bw), jnp.int32)
    for k in range(8):
        acc = acc + kx[:, k, None, None] * region[:, :, k:k + bw]
    im = _round2(acc + (1 << 14), 3)
    # vertical pass
    acc2 = jnp.zeros(region.shape[:1] + (bh, bw), jnp.int32)
    for k in range(8):
        acc2 = acc2 + ky[:, k, None, None] * im[:, k:k + bh, :]
    sum_ = acc2 + (1 << (8 + 14 - 3))
    res = _round2(sum_, 11) - ((1 << 8) + (1 << 7))
    both = jnp.clip(res, 0, 255)
    # subpel==0 paths collapse to the same result through the 2d pipe only
    # when the kernel is the identity phase (phase 0 = [..128..]), which
    # FILT8[0] is -- so the unified 2d path is bit-exact for all phases.
    return both.astype(jnp.uint8)


def _clamp_mv(mv_r, mv_c, bw, bh, ss_x, ss_y, x0l, y0l, fw, fh_, bw4l,
              bh4l):
    """clamp_mv_to_umv_border_sb in q4 plane units (batched).
    x0l/y0l: luma block origins (B,); fw/fh_: luma frame dims;
    bw4l/bh4l: luma block dims."""
    spel_left_c = (4 + bw) << 4
    spel_right_c = spel_left_c - 16
    spel_left_r = (4 + bh) << 4
    spel_right_r = spel_left_r - 16
    sx = 1 << (1 - ss_x)
    sy = 1 << (1 - ss_y)
    row = mv_r * sy
    col = mv_c * sx
    lo_c = (-x0l) * 8 * sx - spel_left_c
    hi_c = (fw - bw4l - x0l) * 8 * sx + spel_right_c
    lo_r = (-y0l) * 8 * sy - spel_left_r
    hi_r = (fh_ - bh4l - y0l) * 8 * sy + spel_right_r
    return (jnp.clip(row, lo_r, hi_r), jnp.clip(col, lo_c, hi_c))


_FN_CACHE = {}


def _p_frame_fn(key):
    if key in _FN_CACHE:
        return _FN_CACHE[key]
    H, W = key
    Hc, Wc = H >> 1, W >> 1
    nby, nbx = H // 16, W // 16
    B = nby * nbx
    by, bx = np.meshgrid(np.arange(nby), np.arange(nbx), indexing="ij")
    y0 = jnp.asarray((by.ravel() * 16).astype(np.int32))
    x0 = jnp.asarray((bx.ravel() * 16).astype(np.int32))
    scan_y = jnp.asarray(np.asarray(tables.scan(c.TX_16X16, c.DCT_DCT)))
    scan_c = jnp.asarray(np.asarray(tables.scan(c.TX_8X8, c.DCT_DCT)))
    dc_mask_y = np.zeros(256, bool)
    dc_mask_y[0] = True
    dc_mask_c = np.zeros(64, bool)
    dc_mask_c[0] = True
    dc_y = jnp.asarray(dc_mask_y)
    dc_c = jnp.asarray(dc_mask_c)

    # static fullpel search offset stages
    stage1 = [(dy, dx) for dy in range(-16, 17, 4)
              for dx in range(-16, 17, 4)]
    stage23 = ([(dy, dx) for dy in (-2, 0, 2) for dx in (-2, 0, 2)],
               [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    subpel = [(dy, dx) for dy in (-4, -2, 0, 2, 4)
              for dx in (-4, -2, 0, 2, 4)]

    def fn(src_y, src_u, src_v, refp_y, refp_u, refp_v, pq_arr_y,
           pq_arr_u, pq_arr_v):
        pq_y = _PQ(pq_arr_y)
        pq_u = _PQ(pq_arr_u)
        pq_v = _PQ(pq_arr_v)
        sy_blk = src_y.reshape(nby, 16, nbx, 16).transpose(0, 2, 1, 3) \
            .reshape(B, 16, 16).astype(jnp.int32)

        def sad_at(dy, dx):
            blk = _gather_blocks(refp_y, PADR + y0 + dy, PADR + x0 + dx,
                                 16, 16).astype(jnp.int32)
            return jnp.abs(blk - sy_blk).sum((1, 2))

        # stage 1: fixed grid
        sads = jnp.stack([sad_at(dy, dx) for (dy, dx) in stage1], 1)
        bidx = jnp.argmin(sads, 1)
        off = jnp.asarray(np.array(stage1, np.int32))
        best_dy = off[bidx, 0]
        best_dx = off[bidx, 1]
        best_sad = jnp.min(sads, 1)

        def sad_at_var(dy, dx):
            blk = _gather_blocks(refp_y, PADR + y0 + dy, PADR + x0 + dx,
                                 16, 16).astype(jnp.int32)
            return jnp.abs(blk - sy_blk).sum((1, 2))

        for offs in stage23:
            cands = []
            for (dy, dx) in offs:
                ny = jnp.clip(best_dy + dy, -40, 40)
                nx = jnp.clip(best_dx + dx, -40, 40)
                cands.append((sad_at_var(ny, nx), ny, nx))
            sstack = jnp.stack([s for (s, _, _) in cands], 1)
            nystack = jnp.stack([y for (_, y, _) in cands], 1)
            nxstack = jnp.stack([x for (_, _, x) in cands], 1)
            bi = jnp.argmin(sstack, 1)
            ar = jnp.arange(B)
            best_dy = nystack[ar, bi]
            best_dx = nxstack[ar, bi]
            best_sad = sstack[ar, bi]

        # quarter-pel refine via normative interpolation
        fw4 = W // 4
        fh4 = H // 4
        cands = []
        for (dy, dx) in subpel:
            mv_r = best_dy * 8 + dy
            mv_c = best_dx * 8 + dx
            cr, ccol = _clamp_mv(mv_r, mv_c, 16, 16, 0, 0, x0, y0, W, H,
                                 16, 16)
            # q4 luma units = 2 * (1/8 pel)
            pred = _mc_block(refp_y, x0, y0, 16, 16, cr, ccol)
            sad = jnp.abs(pred.astype(jnp.int32) - sy_blk).sum((1, 2))
            cands.append((sad, mv_r, mv_c))
        sstack = jnp.stack([s for (s, _, _) in cands], 1)
        rstack = jnp.stack([r for (_, r, _) in cands], 1)
        cstack = jnp.stack([cc for (_, _, cc) in cands], 1)
        bi = jnp.argmin(sstack, 1)
        ar = jnp.arange(B)
        mv_r = rstack[ar, bi]
        mv_c = cstack[ar, bi]

        # --- final MC + residual coding ---
        # luma (clamp scales 1/8-pel mv to q4 internally)
        cr, ccol = _clamp_mv(mv_r, mv_c, 16, 16, 0, 0, x0, y0, W, H,
                             16, 16)
        pred_y = _mc_block(refp_y, x0, y0, 16, 16, cr, ccol)
        resid_y = sy_blk - pred_y.astype(jnp.int32)
        coeff_y = fwd_txfm2d_batched(resid_y, c.TX_16X16, c.DCT_DCT)
        qy, dqy = _quantize_jnp(coeff_y, pq_y, CF._tx_scale(c.TX_16X16),
                                dc_y)
        _, eob_y = _est_bits(qy, scan_y)
        rec_y = inv_txfm2d_add_batched(dqy, pred_y, c.TX_16X16, c.DCT_DCT)
        rec_y = jnp.where((eob_y > 0)[:, None, None], rec_y, pred_y)

        # chroma (8x8 blocks at half coords; chroma q4 = mv 1/8 luma pel)
        xc = x0 >> 1
        yc = y0 >> 1
        out_c = []
        for (src_p, refp, pq_p) in ((src_u, refp_u, pq_u),
                                    (src_v, refp_v, pq_v)):
            sc_blk = src_p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) \
                .reshape(B, 8, 8).astype(jnp.int32)
            crc, cccol = _clamp_mv(mv_r, mv_c, 8, 8, 1, 1, x0, y0, W, H,
                                   16, 16)
            pred = _mc_block(refp, xc, yc, 8, 8, crc, cccol)
            resid = sc_blk - pred.astype(jnp.int32)
            coeff = fwd_txfm2d_batched(resid, c.TX_8X8, c.DCT_DCT)
            qc, dqc = _quantize_jnp(coeff, pq_p, CF._tx_scale(c.TX_8X8),
                                    dc_c)
            _, eob = _est_bits(qc, scan_c)
            rec = inv_txfm2d_add_batched(dqc, pred, c.TX_8X8, c.DCT_DCT)
            rec = jnp.where((eob > 0)[:, None, None], rec, pred)
            out_c.append((qc, eob, rec))

        def untile(blocks, n):
            return blocks.reshape(nby, nbx, n, n).transpose(0, 2, 1, 3) \
                .reshape(nby * n, nbx * n)

        (qu, eob_u, rec_u), (qv, eob_v, rec_v) = out_c
        return (mv_r, mv_c, qy, eob_y, qu, eob_u, qv, eob_v,
                untile(rec_y, 16), untile(rec_u, 8), untile(rec_v, 8))

    fn = jax.jit(fn)
    _FN_CACHE[key] = fn
    return fn


class DeviceInterEncoder:
    """Whole-frame batched P-frame encode at fixed 16x16 blocks."""

    def __init__(self, qindex: int):
        self.qindex = qindex
        self.pq_arrs = []
        for (dcd, acd) in ((0, 0), (0, 0), (0, 0)):
            self.pq_arrs.append(_pq_array(
                Q.build_plane_quant(qindex, dcd, acd)))

    def encode_frame(self, src_planes, ref_planes):
        """src_planes: mi-aligned (y, u, v); ref_planes: visible (y, u, v)
        of the reference.  Returns dict of per-block results + recon."""
        H, W = src_planes[0].shape[:2]
        assert H % 16 == 0 and W % 16 == 0
        fn = _p_frame_fn((H, W))
        refp = [np.pad(p, PADR, mode="edge") for p in ref_planes]
        out = fn(jnp.asarray(src_planes[0][:H, :W]),
                 jnp.asarray(src_planes[1][:H >> 1, :W >> 1]),
                 jnp.asarray(src_planes[2][:H >> 1, :W >> 1]),
                 jnp.asarray(refp[0]), jnp.asarray(refp[1]),
                 jnp.asarray(refp[2]),
                 self.pq_arrs[0], self.pq_arrs[1], self.pq_arrs[2])
        (mv_r, mv_c, qy, eob_y, qu, eob_u, qv, eob_v,
         rec_y, rec_u, rec_v) = [np.asarray(o) for o in out]
        self.recon = (rec_y, rec_u, rec_v)
        nbx = W // 16
        res = {}
        for b in range(mv_r.shape[0]):
            r, cc = divmod(b, nbx)
            res[(r, cc)] = dict(
                mv=(int(mv_r[b]), int(mv_c[b])), qy=qy[b],
                eoby=int(eob_y[b]), qu=qu[b], eobu=int(eob_u[b]),
                qv=qv[b], eobv=int(eob_v[b]))
        return res
