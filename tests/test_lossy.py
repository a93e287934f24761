"""Lossy all-intra conformance: our decoder and stock aomdec must decode
our streams identically (pixel-exact), and quality must be sane."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import constants as c
from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")
HAVE_ORACLE = os.path.exists(AOMDEC)


def _content(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx // 4 + yy // 4) * 8 % 256).astype(np.uint8)
    y = (y + rng.integers(-10, 11, (h, w))).clip(0, 255).astype(np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    u = ((xx[:ch * 2:2, :cw * 2:2] // 8) * 16 % 256).astype(np.uint8)[
        :ch, :cw]
    v = rng.integers(100, 160, (ch, cw)).astype(np.uint8)
    return y, u, v


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else 99.0


@pytest.mark.parametrize("dims,bs", [
    ((64, 64), c.BLOCK_16X16), ((176, 144), c.BLOCK_16X16),
    ((100, 76), c.BLOCK_16X16), ((64, 64), c.BLOCK_64X64),
    ((96, 64), c.BLOCK_32X32)])
def test_lossy_selfdecode_and_quality(tmp_path, dims, bs):
    w, h = dims
    frame = _content(w, h)
    ivf = str(tmp_path / "l.ivf")
    encode_lossy_ivf(ivf, [frame], w, h, qindex=60, block_size=bs)
    y, u, v = decode_ivf(ivf)[0]
    assert _psnr(y, frame[0]) > 28
    assert _psnr(u, frame[1]) > 28


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
@pytest.mark.parametrize("dims,bs", [
    ((176, 144), c.BLOCK_16X16),
    ((352, 288), c.BLOCK_16X16),
    ((100, 76), c.BLOCK_16X16),
    ((64, 64), c.BLOCK_64X64),   # TX_64X64 (entropy class 4)
    ((96, 64), c.BLOCK_16X16),   # partial SB -> rect 64-dim tx blocks
])
def test_lossy_conformance_aomdec(tmp_path, dims, bs):
    w, h = dims
    frame = _content(w, h)
    ivf = str(tmp_path / "l.ivf")
    out = str(tmp_path / "dec.y4m")
    encode_lossy_ivf(ivf, [frame], w, h, qindex=60, block_size=bs)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)[0]
    ref = read_y4m(out)[0][0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_lossy_flatblocks_edge_crossing(tmp_path):
    """Regression: av1_set_entropy_contexts clips cul spans to visible units
    for edge-crossing blocks (av1/common/av1_common_int.h); stale dc-sign
    context bits beyond the visible edge broke a 128x144 flat-block stream."""
    rng = np.random.default_rng(7)
    y = np.kron(rng.integers(0, 255, (9, 11)),
                np.ones((16, 16))).astype(np.uint8)
    u = (128 + 30 * np.sin(np.mgrid[0:144, 0:176][1][::2, ::2] / 23)).astype(
        np.uint8)
    v = rng.integers(90, 170, (72, 88)).astype(np.uint8)
    w, h = 128, 144
    frame = (y[:h, :w], u[:h // 2, :w // 2], v[:h // 2, :w // 2])
    ivf = str(tmp_path / "l.ivf")
    out = str(tmp_path / "dec.y4m")
    encode_lossy_ivf(ivf, [frame], w, h, qindex=120, mode_set=(0, 1, 2))
    subprocess.run([AOMDEC, "-o", out, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)[0]
    ref = read_y4m(out)[0][0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
@pytest.mark.parametrize("qindex", [20, 120, 230])
def test_lossy_qindex_sweep(tmp_path, qindex):
    w, h = 176, 144
    frame = _content(w, h, seed=3)
    ivf = str(tmp_path / "l.ivf")
    out = str(tmp_path / "dec.y4m")
    encode_lossy_ivf(ivf, [frame], w, h, qindex=qindex)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)[0]
    ref = read_y4m(out)[0][0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


def test_trellis_improves_rd(tmp_path):
    """optimize_txb must save bits at equal q without losing more
    quality than the rate saving is worth (mini BD check at one point),
    and trellis streams must stay self-decodable."""
    w, h = 176, 144
    frame = _content(w, h, seed=9)
    nt = str(tmp_path / "nt.ivf")
    tr = str(tmp_path / "tr.ivf")
    encode_lossy_ivf(nt, [frame], w, h, qindex=120, trellis=False)
    encode_lossy_ivf(tr, [frame], w, h, qindex=120)
    yn = decode_ivf(nt)[0][0]
    yt = decode_ivf(tr)[0][0]
    sz_nt, sz_tr = os.path.getsize(nt), os.path.getsize(tr)
    assert sz_tr < sz_nt
    assert _psnr(yt, frame[0]) > _psnr(yn, frame[0]) - 1.0


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_trellis_conformance_aomdec(tmp_path):
    w, h = 176, 144
    frame = _content(w, h, seed=9)
    ivf = str(tmp_path / "tr.ivf")
    out = str(tmp_path / "dec.y4m")
    encode_lossy_ivf(ivf, [frame], w, h, qindex=100)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ours = decode_ivf(ivf)[0]
    ref = read_y4m(out)[0][0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_rect_partitions_and_angle_delta_conformance(tmp_path):
    """Interior HORZ/VERT partitions + nonzero intra angle deltas must
    produce streams stock aomdec decodes identically."""
    rng = np.random.default_rng(2)
    w, h = 176, 144
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.where((yy // 16) % 2 == 0,
                 60 + rng.integers(-4, 5, (h, w)),
                 (128 + 90 * np.sin((2 * xx + 5 * yy) / 11.0))
                 ).clip(0, 255).astype(np.uint8)
    u = (100 + rng.integers(-20, 20, (h // 2, w // 2))).astype(np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    frame = (y, u, v)
    ivf = str(tmp_path / "rp.ivf")
    out = str(tmp_path / "dec.y4m")
    encode_lossy_ivf(ivf, [frame], w, h, qindex=80, block_size=3)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ours = decode_ivf(ivf)[0]
    ref = read_y4m(out)[0][0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_variance_aq_delta_q(tmp_path):
    """Variance AQ writes per-SB delta-q; stream decodes identically in
    stock aomdec and our decoder (write_delta_qindex mirror)."""
    w, h = 192, 128
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w]
    # left half flat gradient (low variance), right half textured
    y = (xx * 255 // w).astype(np.uint8)
    y[:, w // 2:] = rng.integers(0, 256, (h, w // 2)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    frames = [(y, u, v)]
    ivf = str(tmp_path / "aq.ivf")
    encode_lossy_ivf(ivf, frames, w, h, qindex=80, aq=True)

    # the AQ map must actually vary for this content
    from aom_av1_lavish_tpu.encoder.lossy import (LossyAllIntraEncoder,
                                                  make_lossy_frame_header,
                                                  make_sequence_header)
    sh = make_sequence_header(w, h)
    enc = LossyAllIntraEncoder(sh, make_lossy_frame_header(sh, 80, aq=True))
    enc._setup_aq(frames[0])
    assert len(np.unique(enc.sb_qmap)) >= 2, enc.sb_qmap

    out = str(tmp_path / "aq.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    for pi, (a, b) in enumerate(zip(ours[0], ref[0])):
        np.testing.assert_array_equal(a, b, err_msg=f"plane {pi}")


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_segmentation_encode(tmp_path):
    """Segment-based AQ (SEG_LVL_ALT_Q): params + per-block seg ids
    written; conformant vs stock aomdec and our decoder."""
    w, h = 192, 128
    rng = np.random.default_rng(6)
    y = (np.mgrid[0:h, 0:w][1] * 200 // w).astype(np.uint8)   # flat ramp
    y[:, w // 2:] = rng.integers(0, 256, (h, w // 2))         # texture
    u = np.full((h // 2, w // 2), 120, np.uint8)
    frames = [(y, u, u.copy())]
    ivf = str(tmp_path / "seg.ivf")
    encode_lossy_ivf(ivf, frames, w, h, qindex=100, seg=[-24, 0, 24])

    out = str(tmp_path / "seg.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    for pi, (a, b) in enumerate(zip(ours[0], ref[0])):
        np.testing.assert_array_equal(a, b, err_msg=f"plane {pi}")

    # the decoded seg map must use multiple segments, and the flat half
    # (better q) must beat a flat-q encode there at similar total rate
    from aom_av1_lavish_tpu.decoder.inspect import inspect_ivf
    info = inspect_ivf(ivf)[0]
    assert len(np.unique(info.seg_grid)) >= 2
    assert len(np.unique(info.qindex_grid)) >= 2


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_tx_type_search_conformance(tmp_path):
    """tx-type RD search must emit non-DCT types that stock aomdec
    accepts bit-exactly, and must not cost bits vs DCT-only."""
    w, h = 176, 144
    yy, xx = np.mgrid[0:h, 0:w]
    y0 = (100 + 80 * np.sin((xx + yy) / 19.0)
          + 40 * ((xx - yy) % 71 < 30)).clip(0, 255).astype(np.uint8)
    frame = (y0, np.full((h // 2, w // 2), 120, np.uint8),
             np.full((h // 2, w // 2), 130, np.uint8))
    off = str(tmp_path / "off.ivf")
    on = str(tmp_path / "on.ivf")
    encode_lossy_ivf(off, [frame], w, h, qindex=120, tx_search=False,
                     tx_select=False)
    encode_lossy_ivf(on, [frame], w, h, qindex=120, tx_search=True,
                     tx_select=False)
    assert os.path.getsize(on) < os.path.getsize(off)
    out = str(tmp_path / "dec.y4m")
    subprocess.run([AOMDEC, "-o", out, on], check=True,
                   capture_output=True)
    ours = decode_ivf(on)[0]
    ref = read_y4m(out)[0][0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
@pytest.mark.parametrize("dims", [(176, 144), (100, 76)])
def test_tx_size_select_conformance(tmp_path, dims):
    """TX_MODE_SELECT (per-block uniform tx depth) must beat
    TX_MODE_LARGEST in rate at equal q and decode bit-exactly in stock
    aomdec (incl. edge-crossing blocks: CfL stores the visible luma
    aligned to the tx dims, cfl.c max_intra_block_width)."""
    w, h = dims
    frame = _content(w, h, seed=9)
    lg = str(tmp_path / "lg.ivf")
    sel = str(tmp_path / "sel.ivf")
    encode_lossy_ivf(lg, [frame], w, h, qindex=120, tx_select=False)
    encode_lossy_ivf(sel, [frame], w, h, qindex=120, tx_select=True)
    assert os.path.getsize(sel) < os.path.getsize(lg)
    out = str(tmp_path / "dec.y4m")
    subprocess.run([AOMDEC, "-o", out, sel], check=True,
                   capture_output=True)
    ours = decode_ivf(sel)[0]
    ref = read_y4m(out)[0][0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_ext_partition_shapes_conformance(tmp_path):
    """AB + 4:1 partition search (partition_search.c EXT_PARTITION
    types): must save bits on striped content and round-trip through
    stock aomdec pixel-exactly."""
    rng = np.random.default_rng(3)
    w, h = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.where(yy % 32 < 8, rng.integers(0, 256, (h, w)),
                 90 + (xx // 2) % 8).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    off = str(tmp_path / "off.ivf")
    on = str(tmp_path / "on.ivf")
    encode_lossy_ivf(off, [(y, u, v)], w, h, qindex=100, ext_parts=False)
    encode_lossy_ivf(on, [(y, u, v)], w, h, qindex=100, ext_parts=True)
    assert os.path.getsize(on) < os.path.getsize(off)
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, on], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0][0]
    ours = decode_ivf(on)[0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
def test_filter_intra_conformance(tmp_path):
    """Filter-intra search (av1_handle_filter_intra_mode): blocks coded
    with use_filter_intra + mode symbols must round-trip bit-exactly
    through stock aomdec, and the search must actually pick some."""
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    from aom_av1_lavish_tpu.encoder.encoder import make_sequence_header
    from aom_av1_lavish_tpu.encoder.lossy import (LossyAllIntraEncoder,
                                                  make_lossy_frame_header)
    w, h = 176, 144
    frame = _content(w, h, seed=11)
    sh = make_sequence_header(w, h, filter_intra=True)
    fh = make_lossy_frame_header(sh, 100)
    enc = LossyAllIntraEncoder(sh, fh)
    n_fi = [0]
    orig = enc._trial_block

    def spy(*a, **kw):
        cost, plan = orig(*a, **kw)
        if plan.get("fim", -1) >= 0:
            n_fi[0] += 1
        return cost, plan

    enc._trial_block = spy
    data = enc.encode_frame(frame)
    ivf = str(tmp_path / "fi.ivf")
    write_ivf(ivf, [(data, 0)], w, h)
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0][0]
    ours = decode_ivf(ivf)[0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)
    assert n_fi[0] > 0


def test_psy_tunes_improve_their_metric():
    """tune=butteraugli / tune=vmaf must measurably improve the metric
    they are named after vs tune=psnr at EQUAL RATE (the contract behind
    tune_butteraugli.c:26 / tune_vmaf.c:1114 — a tune that does not move
    its own metric is mislabeled).  Both encode a small q sweep; the
    psnr anchor's score is interpolated to the tune's achieved rate."""
    from aom_av1_lavish_tpu.decoder import decode_ivf
    from aom_av1_lavish_tpu.dsp.butteraugli import (butteraugli_score,
                                                    vif_map)
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf
    import tempfile

    rng = np.random.default_rng(11)
    W, H = 128, 96
    yy, xx = np.mgrid[0:H, 0:W]
    # dark gradient + bright busy texture: psy tunes shift bits toward
    # the regions where the perceptual metrics see the most damage
    y = (20 + 30 * (yy / H) + 120 * (xx > W // 2)
         + rng.normal(0, 14, (H, W)) * (xx > W // 2)).clip(0, 255) \
        .astype(np.uint8)
    frame = (y, np.full((H // 2, W // 2), 120, np.uint8),
             np.full((H // 2, W // 2), 130, np.uint8))

    def metric_of(tune, dec):
        if tune == "vmaf":
            return float(np.mean(vif_map(frame[0], dec[0][0])))
        return butteraugli_score(frame[0], dec[0][0])

    def sweep(tune, metric_name, qs):
        pts = []
        with tempfile.TemporaryDirectory() as td:
            for q in qs:
                p = os.path.join(td, f"{tune}{q}.ivf")
                encode_lossy_ivf(p, [frame], W, H, qindex=q,
                                 tune=tune if tune != "anchor"
                                 else "psnr")
                dec = decode_ivf(p)
                pts.append((os.path.getsize(p),
                            metric_of(metric_name, dec)))
        return sorted(pts)

    def interp(pts, rate):
        for (r0, s0), (r1, s1) in zip(pts, pts[1:]):
            if r0 <= rate <= r1:
                t = (rate - r0) / max(r1 - r0, 1)
                return s0 + t * (s1 - s0)
        return None

    for tune in ("butteraugli", "vmaf"):
        anchor = sweep("anchor", tune, (90, 105, 120, 135, 150))
        ours = sweep(tune, tune, (105, 120, 135))
        gains = []
        for rate, score in ours:
            ref = interp(anchor, rate)
            if ref is None:
                continue
            # both metrics here: lower = better
            gains.append((ref - score) / max(ref, 1e-9))
        assert len(gains) >= 2, (tune, ours, anchor)
        assert float(np.mean(gains)) > 0.0, (tune, gains, ours, anchor)
