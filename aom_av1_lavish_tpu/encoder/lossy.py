"""Lossy all-intra encoder (fixed qindex, TX_MODE_LARGEST).

SURVEY.md §7 step 4 first slice: full DCT pipeline with recon-in-the-loop
intra prediction, mode selection by prediction SSE (CDF-rate-aware RDO comes
next), per-txb quantization and tokenization through the shared sinks.
In-loop filters disabled in this config (seq cdef/restoration off, lf 0).
"""

from __future__ import annotations

import numpy as np

from ..bitstream import constants as c
from ..bitstream import headers as H
from ..common import blockd, coeffs as CF, intra, quant as Q
from ..common import txfm2d as T2
from ..common import txtype as TT
from .encoder import (INTRA_MODE_CONTEXT, LosslessEncoder,
                      make_sequence_header)

MAX_ANGLE_DELTA = 3


def make_lossy_frame_header(sh: H.SequenceHeader,
                            qindex: int) -> H.FrameHeader:
    assert 0 < qindex <= 255
    return H.FrameHeader(
        frame_type=c.KEY_FRAME, show_frame=1, error_resilient_mode=1,
        disable_cdf_update=0, disable_frame_end_update_cdf=1,
        frame_size_override=0,
        frame_width=sh.max_frame_width, frame_height=sh.max_frame_height,
        render_width=sh.max_frame_width, render_height=sh.max_frame_height,
        base_q_idx=qindex, tx_mode=c.TX_MODE_LARGEST, reduced_tx_set=0)


class LossyAllIntraEncoder(LosslessEncoder):
    """Key-frame encoder at base_q_idx > 0 (inherits partition machinery)."""

    PAD = 64

    # luma intra candidates evaluated per block (pred-SSE pick)
    MODE_CANDIDATES = (c.DC_PRED, c.V_PRED, c.H_PRED, c.SMOOTH_PRED,
                      c.PAETH_PRED)

    def __init__(self, sh, fh, use_native=None, block_size=c.BLOCK_16X16):
        super().__init__(sh, fh, use_native=use_native)
        self.block_size = block_size
        self.pq = []
        for (dcd, acd) in ((fh.delta_q_y_dc, 0),
                           (fh.delta_q_u_dc, fh.delta_q_u_ac),
                           (fh.delta_q_v_dc, fh.delta_q_v_ac)):
            self.pq.append(Q.build_plane_quant(fh.base_q_idx, dcd, acd))

    def encode_frame(self, planes, use_jax: bool = False) -> bytes:
        self.analysis = None
        return super().encode_frame(planes, use_jax=False)

    def _choose_partition(self, mi_row, mi_col, bsize):
        """Split down to self.block_size, edge rules as in lossless."""
        base = super()._choose_partition(mi_row, mi_col, bsize)
        if base == c.PARTITION_NONE and bsize > self.block_size:
            return c.PARTITION_SPLIT
        return base

    # --- block encode -----------------------------------------------------

    def _encode_block(self, mi_row, mi_col, bsize, partition):
        bw = blockd.mi_size_wide(bsize)
        bh = blockd.mi_size_high(bsize)
        up_avail = mi_row > 0
        left_avail = mi_col > 0

        y_mode = self._pick_y_mode(mi_row, mi_col, bsize, up_avail,
                                   left_avail)
        uv_mode = c.DC_PRED
        # code the whole block (predict/transform/quantize), collecting
        # txb records; recon is written as we go (prediction dependency)
        txbs = self._code_block_txbs(mi_row, mi_col, bsize, y_mode, uv_mode,
                                     up_avail, left_avail, partition)
        skip = all(t["eob"] == 0 for t in txbs)

        above_mi = (mi_row - 1, mi_col) if up_avail else None
        left_mi = (mi_row, mi_col - 1) if left_avail else None
        skip_ctx = (int(self.mi_skip[above_mi]) if above_mi else 0) + \
                   (int(self.mi_skip[left_mi]) if left_mi else 0)
        self.sink.symbol(int(skip), 2, "skip_txfm_cdfs", skip_ctx)

        above_mode = int(self.mi_mode[above_mi]) if above_mi else c.DC_PRED
        left_mode = int(self.mi_mode[left_mi]) if left_mi else c.DC_PRED
        self.sink.symbol(y_mode, c.INTRA_MODES, "kf_y_cdf",
                         INTRA_MODE_CONTEXT[above_mode],
                         INTRA_MODE_CONTEXT[left_mode])
        use_angle_delta = bsize >= c.BLOCK_8X8
        if use_angle_delta and intra.is_directional(y_mode):
            self.sink.symbol(MAX_ANGLE_DELTA, 2 * MAX_ANGLE_DELTA + 1,
                             "angle_delta_cdf", y_mode - c.V_PRED)
        is_chroma_ref = blockd.is_chroma_reference(
            mi_row, mi_col, bsize, self.ss_x, self.ss_y) \
            and self.num_planes > 1
        if is_chroma_ref:
            cfl_allowed = (blockd.block_wide(bsize) <= 32
                           and blockd.block_high(bsize) <= 32)
            self.sink.symbol(
                uv_mode, c.UV_INTRA_MODES - int(not cfl_allowed),
                "uv_mode_cdf", int(cfl_allowed), y_mode)
            if use_angle_delta and intra.is_directional(uv_mode):
                self.sink.symbol(MAX_ANGLE_DELTA, 2 * MAX_ANGLE_DELTA + 1,
                                 "angle_delta_cdf", uv_mode - c.V_PRED)

        rmax = min(mi_row + bh, self.mi_rows)
        cmax = min(mi_col + bw, self.mi_cols)
        self.mi_skip[mi_row:rmax, mi_col:cmax] = int(skip)
        self.mi_mode[mi_row:rmax, mi_col:cmax] = y_mode

        # entropy-code txbs; update entropy contexts + final recon
        for t in txbs:
            plane = t["plane"]
            au = self.above_entropy[plane]
            lu = self.left_entropy[plane]
            acol, lrow = t["acol"], t["lrow"]
            txw = c.TX_WIDTH[t["tx_size"]] >> 2
            txh = c.TX_HEIGHT[t["tx_size"]] >> 2
            if skip:
                au[acol:acol + txw] = 0
                lu[lrow:lrow + txh] = 0
                # recon already holds pred (written during planning); for a
                # skipped block pred IS the recon
                continue
            skip_ctx2, dc_sign_ctx = CF.txb_ctx(
                t["plane_bsize"], t["tx_size"], plane, au[acol:acol + txw],
                lu[lrow:lrow + txh])
            cul = self.sink.txb(t["qcoeff"], plane, skip_ctx2, dc_sign_ctx,
                                tx_size=t["tx_size"], tx_type=t["tx_type"],
                                tx_type_sym=t["tx_type_sym"])
            au[acol:acol + txw] = cul
            lu[lrow:lrow + txh] = cul

    def _pick_y_mode(self, mi_row, mi_col, bsize, up_avail, left_avail):
        """Prediction-SSE mode pick over MODE_CANDIDATES (luma)."""
        best = (None, None)
        px = mi_col * 4
        py = mi_row * 4
        w = blockd.block_wide(bsize)
        h = blockd.block_high(bsize)
        # clip to visible frame area
        w = min(w, self.mi_cols * 4 - px)
        h = min(h, self.mi_rows * 4 - py)
        src = self.src[0][py:py + h, px:px + w].astype(np.int64)
        for mode in self.MODE_CANDIDATES:
            pred = self._predict(0, mode, mi_row, mi_col, bsize,
                                 self._plane_tx(0, bsize), 0, 0,
                                 up_avail, left_avail)
            sse = int(((src - pred[:h, :w].astype(np.int64)) ** 2).sum())
            if best[0] is None or sse < best[0]:
                best = (sse, mode)
        return best[1]

    def _plane_tx(self, plane, bsize):
        pb = blockd.plane_block_size(bsize, self.ss_x, self.ss_y) \
            if plane else bsize
        tx = blockd.max_tx_size_rect(pb)
        if plane:
            w = min(32, c.TX_WIDTH[tx])
            h = min(32, c.TX_HEIGHT[tx])
            tx = blockd.tx_size_of(w, h)
        return tx

    def _predict(self, plane, mode, mi_row, mi_col, bsize, tx_size,
                 row_off, col_off, up_avail, left_avail):
        """Intra prediction for one tx block from the recon buffer."""
        ss_x = self.ss_x if plane else 0
        ss_y = self.ss_y if plane else 0
        plane_bsize = blockd.plane_block_size(bsize, ss_x, ss_y) \
            if plane else bsize
        txwpx = c.TX_WIDTH[tx_size]
        txhpx = c.TX_HEIGHT[tx_size]
        row0 = ((mi_row - (mi_row & ss_y)) * 4) >> ss_y if plane \
            else mi_row * 4
        col0 = ((mi_col - (mi_col & ss_x)) * 4) >> ss_x if plane \
            else mi_col * 4
        x = col_off * 4
        y = row_off * 4
        px, py = col0 + x, row0 + y
        bw_mi = blockd.mi_size_wide(bsize)
        bh_mi = blockd.mi_size_high(bsize)
        wpx = blockd.block_wide(plane_bsize)
        hpx = blockd.block_high(plane_bsize)
        mb_to_right = (self.mi_cols - bw_mi - mi_col) * 4
        mb_to_bottom = (self.mi_rows - bh_mi - mi_row) * 4
        xr = (mb_to_right >> ss_x) + wpx - x - txwpx
        yd = (mb_to_bottom >> ss_y) + hpx - y - txhpx
        have_top = row_off > 0 or up_avail
        have_left = col_off > 0 or left_avail
        txw = txwpx >> 2
        txh = txhpx >> 2
        right_avail = mi_col + ((col_off + txw) << ss_x) < self.mi_cols
        bottom_avail = (yd > 0) and \
            (mi_row + ((row_off + txh) << ss_y) < self.mi_rows)
        is_dr = intra.is_directional(mode)
        p_angle = intra.MODE_TO_ANGLE.get(mode, 0) if is_dr else 0
        need_tr = is_dr and p_angle < 90
        need_bl = is_dr and p_angle > 180
        cbsize = bsize
        have_tr = blockd.has_top_right(
            self.sh.sb_size_log2, cbsize, mi_row, mi_col, have_top,
            right_avail, c.PARTITION_NONE, tx_size, row_off, col_off,
            ss_x, ss_y) if need_tr else -1
        have_bl = blockd.has_bottom_left(
            self.sh.sb_size_log2, cbsize, mi_row, mi_col, bottom_avail,
            have_left, c.PARTITION_NONE, tx_size, row_off, col_off,
            ss_x, ss_y) if need_bl else -1
        return intra.build_intra_predictor(
            self.recon[plane], px, py, txwpx, txhpx, mode, 0, -1,
            n_top_px=min(txwpx, xr + txwpx) if have_top else 0,
            n_topright_px=(min(txwpx, xr) if have_tr > 0 else have_tr),
            n_left_px=min(txhpx, yd + txhpx) if have_left else 0,
            n_bottomleft_px=(min(txhpx, yd) if have_bl > 0 else have_bl),
            disable_edge_filter=not self.sh.enable_intra_edge_filter,
            intra_edge_filter_type=0)

    def _code_block_txbs(self, mi_row, mi_col, bsize, y_mode, uv_mode,
                         up_avail, left_avail, partition):
        """Predict + transform + quantize all txbs; write recon."""
        out = []
        bw = blockd.mi_size_wide(bsize)
        bh = blockd.mi_size_high(bsize)
        chroma_up = up_avail
        chroma_left = left_avail
        if self.ss_x and bw < 2:
            chroma_left = (mi_col - 1) > 0
        if self.ss_y and bh < 2:
            chroma_up = (mi_row - 1) > 0
        is_chroma_ref = blockd.is_chroma_reference(
            mi_row, mi_col, bsize, self.ss_x, self.ss_y) \
            and self.num_planes > 1
        nplanes = self.num_planes if is_chroma_ref else 1
        reduced = bool(self.fh.reduced_tx_set)
        for plane in range(nplanes):
            ss_x = self.ss_x if plane else 0
            ss_y = self.ss_y if plane else 0
            plane_bsize = blockd.plane_block_size(bsize, ss_x, ss_y) \
                if plane else bsize
            pbw = blockd.block_wide(plane_bsize)
            pbh = blockd.block_high(plane_bsize)
            tx_size = self._plane_tx(plane, bsize)
            txw4 = c.TX_WIDTH[tx_size] >> 2
            txh4 = c.TX_HEIGHT[tx_size] >> 2
            row0 = ((mi_row - (mi_row & ss_y)) * 4) >> ss_y if plane \
                else mi_row * 4
            col0 = ((mi_col - (mi_col & ss_x)) * 4) >> ss_x if plane \
                else mi_col * 4
            mb_to_right = (self.mi_cols - bw - mi_col) * 4
            mb_to_bottom = (self.mi_rows - bh - mi_row) * 4
            vis_w = pbw + (min(mb_to_right, 0) >> ss_x)
            vis_h = pbh + (min(mb_to_bottom, 0) >> ss_y)
            mode = y_mode if plane == 0 else uv_mode
            # tx type
            if plane == 0:
                st = TT.ext_tx_set_type(tx_size, False, reduced)
                tx_type = c.DCT_DCT
                tx_type_sym = None
                if TT.NUM_EXT_TX_SET[st] > 1:
                    eset = TT.intra_ext_tx_idx(st)
                    sqr = c.TX_SIZE_SQR[tx_size]
                    sym = TT.EXT_TX_IND[st][tx_type]
                    tx_type_sym = (("intra_ext_tx_cdf", eset, sqr, y_mode),
                                   sym, TT.NUM_EXT_TX_SET[st])
            else:
                tx_type = TT.chroma_intra_tx_type(uv_mode, tx_size, reduced)
                tx_type_sym = None
            pq = self.pq[plane]
            from ..bitstream import tables
            adj = CF.adjusted_tx_size(tx_size)
            scan = tables.scan(adj, tx_type)
            log_scale = CF._tx_scale(tx_size)
            for r4 in range(0, max(vis_h >> 2, 1), txh4):
                for c4 in range(0, max(vis_w >> 2, 1), txw4):
                    pred = self._predict(
                        plane, mode, mi_row, mi_col, bsize, tx_size, r4, c4,
                        up_avail if not (plane and ss_y) else chroma_up,
                        left_avail if not (plane and ss_x) else chroma_left)
                    py = row0 + r4 * 4
                    px = col0 + c4 * 4
                    h, w = pred.shape
                    src = self.src[plane][py:py + h, px:px + w]
                    resid = src.astype(np.int32) - pred.astype(np.int32)
                    coeff = T2.fwd_txfm2d(resid, tx_size, tx_type)
                    qcoeff, dqcoeff, eob = Q.quantize_b(coeff, scan, pq,
                                                        log_scale)
                    if eob:
                        recon = T2.inv_txfm2d_add(dqcoeff, pred, tx_size,
                                                  tx_type)
                    else:
                        recon = pred
                    self.recon[plane][py:py + h, px:px + w] = recon
                    out.append(dict(
                        plane=plane, tx_size=tx_size, tx_type=tx_type,
                        tx_type_sym=tx_type_sym, qcoeff=qcoeff, eob=eob,
                        plane_bsize=plane_bsize,
                        acol=px >> 2, lrow=py >> 2))
        return out


def encode_lossy_ivf(path: str, frames, width: int, height: int,
                     qindex: int = 60, fps=(30, 1),
                     block_size: int = c.BLOCK_16X16) -> None:
    from ..bitstream.ivf import write_ivf
    sh = make_sequence_header(width, height)
    payloads = []
    for i, f in enumerate(frames):
        fh = make_lossy_frame_header(sh, qindex)
        enc = LossyAllIntraEncoder(sh, fh, block_size=block_size)
        payloads.append((enc.encode_frame(f), i))
    write_ivf(path, payloads, width, height, fps[0], fps[1])
