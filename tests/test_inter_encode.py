"""Low-delay inter encoder conformance: stock aomdec and our decoder must
decode our key+P-frame streams identically."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder.inter import encode_lowdelay_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")
HAVE_ORACLE = os.path.exists(AOMDEC)


def _content(w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    bh, bw = h + 80, w + 80
    base = (np.kron(rng.integers(0, 256, (bh // 10 + 1, bw // 10 + 1)),
                    np.ones((10, 10)))[:bh, :bw]
            + rng.integers(-15, 15, (bh, bw))).clip(0, 255).astype(np.uint8)
    out = []
    for i in range(n):
        y = base[5 + i:5 + i + h, 6 + 2 * i:6 + 2 * i + w].copy()
        y[20 + 3 * i:40 + 3 * i, 10 + 4 * i:30 + 4 * i] = (60 + 25 * i) % 255
        u = (128 + 30 * np.sin(
            (np.mgrid[0:(h + 1) // 2, 0:(w + 1) // 2][0] + 4 * i)
            / 13)).astype(np.uint8)
        v = base[:(h + 1) // 2, i:i + (w + 1) // 2]
        out.append((y, u, v))
    return out


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else 99.0


@pytest.mark.parametrize("dims,q,n", [
    ((128, 96), 60, 4), ((100, 76), 60, 3), ((128, 96), 150, 4)])
def test_lowdelay_selfdecode(tmp_path, dims, q, n):
    w, h = dims
    frames = _content(w, h, n)
    ivf = str(tmp_path / "ld.ivf")
    encode_lowdelay_ivf(ivf, frames, w, h, qindex=q)
    dec = decode_ivf(ivf)
    assert len(dec) == n
    for o, s in zip(dec, frames):
        assert _psnr(o[0], s[0]) > (26 if q <= 60 else 18)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
@pytest.mark.parametrize("dims,q,n", [
    ((128, 96), 60, 4), ((100, 76), 60, 3), ((176, 144), 120, 5)])
def test_lowdelay_conformance(tmp_path, dims, q, n):
    w, h = dims
    frames = _content(w, h, n)
    ivf = str(tmp_path / "ld.ivf")
    out = str(tmp_path / "dec.y4m")
    encode_lowdelay_ivf(ivf, frames, w, h, qindex=q)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(out)[0]
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(
                a, b, err_msg=f"frame {i} plane {pi}")


def test_interp_filter_search_conformance(tmp_path):
    """Frame-level interpolation-filter pick (av1_pick_interp_filter
    analog): signaled filter must round-trip pixel-exactly through
    stock aomdec."""
    import subprocess
    from aom_av1_lavish_tpu.encoder.gop import encode_gop_ivf
    from aom_av1_lavish_tpu.utils.y4m import read_y4m
    if not HAVE_ORACLE:
        pytest.skip("oracle not built")
    rng = np.random.default_rng(1)
    W, H, N = 176, 144, 4
    yy, xx = np.mgrid[0:H + 16, 0:W + 16]
    base = (120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
            + rng.normal(0, 2, yy.shape)).clip(0, 255).astype(np.uint8)
    frames = [(np.ascontiguousarray(base[i:i + H, 3 * i:3 * i + W]),
               np.full((H // 2, W // 2), 120, np.uint8),
               np.full((H // 2, W // 2), 130, np.uint8))
              for i in range(N)]
    ivf = str(tmp_path / "g.ivf")
    out = str(tmp_path / "d.y4m")
    encode_gop_ivf(ivf, frames, W, H, qindex=80, gf_length=4,
                   interp_search=True, enable_cdef=False)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    refs = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    assert len(ours) == len(refs) == N
    for a, b in zip(ours, refs):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


def test_inter_vartx_select_conformance(tmp_path):
    """Inter TX_MODE_SELECT: vartx partition tree (uniform leaves) +
    intra-in-inter tx depth symbols round-trip through stock aomdec."""
    import subprocess
    from aom_av1_lavish_tpu.encoder.gop import encode_gop_ivf
    from aom_av1_lavish_tpu.utils.y4m import read_y4m
    if not HAVE_ORACLE:
        pytest.skip("oracle not built")
    rng = np.random.default_rng(1)
    W, H, N = 176, 144, 5
    yy, xx = np.mgrid[0:H + 24, 0:W + 24]
    base = (120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
            + 25 * (xx % 53 < 22)
            + rng.normal(0, 3, yy.shape)).clip(0, 255).astype(np.uint8)
    frames = [(np.ascontiguousarray(base[2 * i:2 * i + H,
                                         3 * i:3 * i + W]),
               rng.integers(100, 150, (H // 2, W // 2)).astype(np.uint8),
               rng.integers(100, 150, (H // 2, W // 2)).astype(np.uint8))
              for i in range(N)]
    ivf = str(tmp_path / "g.ivf")
    out = str(tmp_path / "d.y4m")
    encode_gop_ivf(ivf, frames, W, H, qindex=100, gf_length=4,
                   enable_cdef=False)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    refs = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    assert len(ours) == len(refs) == N
    for a, b in zip(ours, refs):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


@pytest.mark.parametrize("method", ["diamond", "bigdia", "square", "hex",
                                    "exhaustive"])
def test_motion_search_methods(tmp_path, method):
    """SEARCH_METHODS knob (mcomp.c search site configs): every pattern
    must find a plain translation and produce a decodable stream."""
    from aom_av1_lavish_tpu.encoder.inter import InterFrameEncoder
    old = InterFrameEncoder.search_method
    InterFrameEncoder.search_method = method
    try:
        rng = np.random.default_rng(3)
        W, H = 96, 64
        yy, xx = np.mgrid[0:H + 16, 0:W + 16]
        base = (120 + 60 * np.sin(yy / 7.0) * np.cos(xx / 9.0)
                + rng.normal(0, 2, yy.shape)).clip(0, 255).astype(np.uint8)
        frames = [(np.ascontiguousarray(base[0:H, 0:W]),
                   np.full((H // 2, W // 2), 120, np.uint8),
                   np.full((H // 2, W // 2), 130, np.uint8)),
                  (np.ascontiguousarray(base[4:4 + H, 6:6 + W]),
                   np.full((H // 2, W // 2), 120, np.uint8),
                   np.full((H // 2, W // 2), 130, np.uint8))]
        ivf = str(tmp_path / "m.ivf")
        encode_lowdelay_ivf(ivf, frames, W, H, qindex=80)
        dec = decode_ivf(ivf)
        assert len(dec) == 2
        # the P frame must predict well (translation found)
        mse = np.mean((dec[1][0].astype(float)
                       - frames[1][0].astype(float)) ** 2)
        assert mse < 120, (method, mse)
    finally:
        InterFrameEncoder.search_method = old


def test_compound_prediction_conformance(tmp_path):
    """COMPOUND_AVERAGE NEAREST_NEARESTMV (LAST, ALTREF): compound ref
    + mode symbols and CONV_BUF-average prediction must round-trip
    through stock aomdec (compound branch of read_ref_frames,
    decodemv.c:956)."""
    import subprocess
    from aom_av1_lavish_tpu.encoder.gop import encode_gop_ivf
    from aom_av1_lavish_tpu.utils.y4m import read_y4m
    if not HAVE_ORACLE:
        pytest.skip("oracle not built")
    rng = np.random.default_rng(1)
    W, H, N = 176, 144, 5
    yy, xx = np.mgrid[0:H + 24, 0:W + 24]
    base = (120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 7.0)).clip(0, 255)
    frames = [((base[2 * i:2 * i + H, 3 * i:3 * i + W]
                + rng.normal(0, 5, (H, W))).clip(0, 255).astype(np.uint8),
               np.full((H // 2, W // 2), 120, np.uint8),
               np.full((H // 2, W // 2), 130, np.uint8))
              for i in range(N)]
    ivf = str(tmp_path / "c.ivf")
    out = str(tmp_path / "d.y4m")
    encode_gop_ivf(ivf, frames, W, H, qindex=120, gf_length=5,
                   enable_cdef=False, comp_pred=True)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    refs = read_y4m(out)[0]
    ours = decode_ivf(ivf)
    assert len(ours) == len(refs) == N
    for a, b in zip(ours, refs):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


def test_skip_mode_and_cdf_carry_conformance(tmp_path):
    """Non-ER GF-group streams: order hints + primary_ref CDF carry +
    frame-level skip mode (av1_setup_skip_mode_allowed).  On static
    content skip-mode blocks (derived compound NEAREST_NEARESTMV, zero
    residual) must be chosen, the encoder recon must equal the decoder
    output, and the stream must decode in stock aomdec."""
    import subprocess
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    from aom_av1_lavish_tpu.decoder.decoder import decode_frame_obus
    from aom_av1_lavish_tpu.decoder.inspect import inspect_ivf
    from aom_av1_lavish_tpu.encoder.gop import GopEncoder
    from aom_av1_lavish_tpu.utils.y4m import read_y4m

    rng = np.random.default_rng(11)
    W, H, N = 176, 144, 6
    y = (rng.integers(0, 200, (H // 8, W // 8)).astype(np.uint8)
         .repeat(8, 0).repeat(8, 1))
    frame = (y, np.full((H // 2, W // 2), 118, np.uint8),
             np.full((H // 2, W // 2), 135, np.uint8))
    frames = [frame] * N
    enc = GopEncoder(W, H, qindex=100, gf_length=N, enable_cdef=False)
    payloads = enc.encode_sequence(frames)
    # coding-path sync with backward CDF adaptation
    sh = None
    state = {"slots": [None] * 8}
    for p in payloads:
        _, sh = decode_frame_obus(p, sh, state)
    for slot in range(8):
        if enc.slots[slot] is None or state["slots"][slot] is None:
            continue
        for pe, pd in zip(enc.slots[slot], state["slots"][slot]["planes"]):
            np.testing.assert_array_equal(pe, pd)
    ivf = str(tmp_path / "sm.ivf")
    write_ivf(ivf, [(p, i) for i, p in enumerate(payloads)], W, H, 30, 1)
    # skip-mode blocks must actually be used on the static P frames
    infos = inspect_ivf(ivf)
    n_skip_mode = sum(int(i.skip_mode_grid.sum()) for i in infos)
    assert n_skip_mode > 0, "no skip-mode block chosen on static content"
    if not HAVE_ORACLE:
        return
    out = str(tmp_path / "sm.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    golden = read_y4m(out)[0]
    sh = None
    state = {"slots": [None] * 8}
    ours = []
    for p in payloads:
        fr, sh = decode_frame_obus(p, sh, state)
        ours.extend(fr)
    assert len(ours) == len(golden) == N
    for a, b in zip(ours, golden):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


def test_motion_modes_encode_conformance(tmp_path):
    """OBMC + WARPED_CAUSAL encode: the motion-mode RD trial must pick
    both modes on rotational content, the encoder recon must equal the
    decoder output, and streams must decode in stock aomdec
    (read_motion_mode / warp-sample search parity)."""
    import subprocess
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    from aom_av1_lavish_tpu.decoder.decoder import decode_frame_obus
    from aom_av1_lavish_tpu.encoder.gop import GopEncoder
    import aom_av1_lavish_tpu.encoder.inter as EI
    from aom_av1_lavish_tpu.utils.y4m import read_y4m
    from scipy import ndimage

    rng = np.random.default_rng(5)
    W, H, N = 176, 144, 5
    yy, xx = np.mgrid[0:H * 2, 0:W * 2]
    base = (120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 8.0)
            + rng.normal(0, 4, yy.shape)).clip(0, 255).astype(np.uint8)
    frames = []
    for i in range(N):
        rot = ndimage.rotate(base.astype(float), i * 1.2, reshape=False,
                             order=1, mode="nearest")
        crop = rot[H // 2:H // 2 + H, W // 2:W // 2 + W] \
            .clip(0, 255).astype(np.uint8)
        frames.append((np.ascontiguousarray(crop),
                       np.full((H // 2, W // 2), 120, np.uint8),
                       np.full((H // 2, W // 2), 130, np.uint8)))

    counts = {0: 0, 1: 0, 2: 0}
    orig = EI.InterFrameEncoder._fill_trial

    def spy(self, bplan, part):
        if bplan.get("is_inter"):
            counts[bplan.get("motion_mode", 0)] += 1
        orig(self, bplan, part)

    EI.InterFrameEncoder._fill_trial = spy
    try:
        enc = GopEncoder(W, H, qindex=100, gf_length=N,
                         enable_cdef=False)
        payloads = enc.encode_sequence(frames)
    finally:
        EI.InterFrameEncoder._fill_trial = orig
    assert counts[1] > 0, "no OBMC block chosen"
    assert counts[2] > 0, "no WARPED_CAUSAL block chosen"
    sh = None
    state = {"slots": [None] * 8}
    ours = []
    for p in payloads:
        fr, sh = decode_frame_obus(p, sh, state)
        ours.extend(fr)
    for slot in range(8):
        if enc.slots[slot] is None or state["slots"][slot] is None:
            continue
        for pe, pd in zip(enc.slots[slot], state["slots"][slot]["planes"]):
            np.testing.assert_array_equal(pe, pd)
    if not HAVE_ORACLE:
        return
    ivf = str(tmp_path / "mm.ivf")
    out = str(tmp_path / "mm.y4m")
    write_ivf(ivf, [(p, i) for i, p in enumerate(payloads)], W, H, 30, 1)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    golden = read_y4m(out)[0]
    assert len(ours) == len(golden) == N
    for a, b in zip(ours, golden):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


def test_compound_types_and_interintra_conformance(tmp_path):
    """Masked compound (WEDGE + DIFFWTD) and interintra encode: the RD
    search must pick each tool on content where it wins, the encoder
    recon must equal the decoder output, and streams must decode in
    stock aomdec (compound_type.c av1_compound_type_rd /
    decodemv.c:1382,1428 write mirrors)."""
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    from aom_av1_lavish_tpu.decoder.decoder import decode_frame_obus
    from aom_av1_lavish_tpu.encoder.gop import GopEncoder
    import aom_av1_lavish_tpu.encoder.inter as EI

    rng = np.random.default_rng(3)
    W, H, N = 176, 144, 6
    yy, xx = np.mgrid[0:H + 40, 0:W + 40]
    bg = 110 + 60 * np.sin(yy / 11.0) * np.cos(xx / 13.0)
    frames = []
    for i in range(N):
        f = bg[2 * i:2 * i + H, 0:W].copy()
        x0 = 30 + 6 * i          # object moving against the background
        f[40:80, x0:x0 + 40] = 220 - (yy[40:80, 0:40] * 2 % 60)
        f = (f + rng.normal(0, 3, (H, W))).clip(0, 255).astype(np.uint8)
        frames.append((f, np.full((H // 2, W // 2), 120, np.uint8),
                       np.full((H // 2, W // 2), 130, np.uint8)))

    counts = {"wedge": 0, "diffwtd": 0, "ii": 0}
    orig = EI.InterFrameEncoder._fill_trial

    def spy(self, bplan, part):
        if bplan.get("is_inter"):
            if bplan.get("comp_group_idx"):
                counts["wedge" if bplan["comp_type"] == 1
                       else "diffwtd"] += 1
            if bplan.get("interintra"):
                counts["ii"] += 1
        orig(self, bplan, part)

    EI.InterFrameEncoder._fill_trial = spy
    try:
        enc = GopEncoder(W, H, qindex=110, gf_length=N, enable_cdef=False,
                         comp_pred=True, compound_types=True,
                         interintra=True)
        payloads = enc.encode_sequence(frames)
    finally:
        EI.InterFrameEncoder._fill_trial = orig
    assert counts["wedge"] > 0, "no WEDGE compound block chosen"
    assert counts["diffwtd"] > 0, "no DIFFWTD compound block chosen"
    assert counts["ii"] > 0, "no interintra block chosen"
    # coding-path sync (encoder recon == decoder ref slots)
    sh = None
    state = {"slots": [None] * 8}
    ours = []
    for p in payloads:
        fr, sh = decode_frame_obus(p, sh, state)
        ours.extend(fr)
    for slot in range(8):
        if enc.slots[slot] is None or state["slots"][slot] is None:
            continue
        for pe, pd in zip(enc.slots[slot], state["slots"][slot]["planes"]):
            np.testing.assert_array_equal(pe, pd)
    if not HAVE_ORACLE:
        return
    ivf = str(tmp_path / "ct.ivf")
    out = str(tmp_path / "ct.y4m")
    write_ivf(ivf, [(p, i) for i, p in enumerate(payloads)], W, H, 30, 1)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    golden = read_y4m(out)[0]
    assert len(ours) == len(golden) == N
    for a, b in zip(ours, golden):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


def test_jnt_comp_conformance(tmp_path):
    """Distance-weighted compound (compound_idx = 0): RD trial +
    compound_index symbol emission + DIST_WTD averaging must round-trip
    through stock aomdec (av1_dist_wtd_comp_weight_assign,
    reconinter.c:668; compound_type.c:1666 trial; decodemv.c:1449
    read mirror).  Content is a linear fade + pan so the unequal-weight
    average beats the plain one on some blocks."""
    import subprocess
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    from aom_av1_lavish_tpu.decoder.decoder import decode_frame_obus
    from aom_av1_lavish_tpu.encoder import inter as EI
    from aom_av1_lavish_tpu.encoder.gop import GopEncoder
    from aom_av1_lavish_tpu.utils.y4m import read_y4m

    rng = np.random.default_rng(5)
    W, H, N = 176, 144, 6
    yy, xx = np.mgrid[0:H + 32, 0:W + 32]
    base = (120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 7.0)).clip(0, 255)
    frames = []
    for i in range(N):
        # pan + brightness ramp: the temporally nearer ref should carry
        # more weight, which is what DIST_WTD encodes
        f = (base[2 * i:2 * i + H, 3 * i:3 * i + W] + 6.0 * i
             + rng.normal(0, 4, (H, W))).clip(0, 255).astype(np.uint8)
        frames.append((f, np.full((H // 2, W // 2), 120, np.uint8),
                       np.full((H // 2, W // 2), 130, np.uint8)))

    jnt = {"n": 0}
    orig = EI.InterFrameEncoder._fill_trial

    def spy(self, bplan, part):
        if bplan.get("is_inter") and bplan.get("compound_idx", 1) == 0:
            jnt["n"] += 1
        orig(self, bplan, part)

    EI.InterFrameEncoder._fill_trial = spy
    try:
        enc = GopEncoder(W, H, qindex=140, gf_length=N,
                         enable_cdef=False, comp_pred=True,
                         jnt_comp=True)
        payloads = enc.encode_sequence(frames)
    finally:
        EI.InterFrameEncoder._fill_trial = orig
    assert jnt["n"] > 0, "no DIST_WTD compound block chosen"
    # self-decode: encoder recon must equal decoder ref state
    sh = None
    state = {"slots": [None] * 8}
    ours = []
    for p in payloads:
        fr, sh = decode_frame_obus(p, sh, state)
        ours.extend(fr)
    assert len(ours) == N
    for slot in range(8):
        if enc.slots[slot] is None or state["slots"][slot] is None:
            continue
        for pe, pd in zip(enc.slots[slot], state["slots"][slot]["planes"]):
            np.testing.assert_array_equal(pe, pd)
    if not HAVE_ORACLE:
        return
    ivf = str(tmp_path / "jnt.ivf")
    out = str(tmp_path / "jnt.y4m")
    write_ivf(ivf, [(p, i) for i, p in enumerate(payloads)], W, H, 30, 1)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    golden = read_y4m(out)[0]
    for a, b in zip(ours, golden):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


def test_sframe_insertion_conformance(tmp_path):
    """Encoder-side S-frames (aom_encoder.h:785 sframe_dist analog):
    every Nth low-delay frame is coded as a SWITCH_FRAME (error
    resilient, refreshes all slots, CDF reset) and the stream decodes
    bit-exact in stock aomdec.  Previously decode-only."""
    import subprocess
    from aom_av1_lavish_tpu.bitstream import constants as cst
    from aom_av1_lavish_tpu.bitstream import headers as HH
    from aom_av1_lavish_tpu.encoder.gop import GopEncoder
    from aom_av1_lavish_tpu.utils.y4m import read_y4m
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf

    rng = np.random.default_rng(9)
    W, H, N = 128, 96, 8
    yy, xx = np.mgrid[0:H + 16, 0:W + 16]
    base = (120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
            + rng.normal(0, 3, yy.shape)).clip(0, 255).astype(np.uint8)
    frames = [(np.ascontiguousarray(base[i:i + H, 2 * i:2 * i + W]),
               np.full((H // 2, W // 2), 120, np.uint8),
               np.full((H // 2, W // 2), 130, np.uint8))
              for i in range(N)]
    enc = GopEncoder(W, H, qindex=100, use_arf=False, kf_interval=1000,
                     enable_cdef=False, sframe_dist=3)
    payloads = enc.encode_sequence(frames)
    # verify SWITCH_FRAME types landed at the cadence
    kinds = []
    for p in payloads:
        for t, pl in HH.split_obus(p):
            if t == cst.OBU_FRAME:
                kinds.append((pl[0] >> 5) & 3)   # frame_type bits
                break
    assert kinds[0] == cst.KEY_FRAME
    assert kinds[3] == cst.SWITCH_FRAME and kinds[6] == cst.SWITCH_FRAME
    assert kinds[1] == cst.INTER_FRAME
    # decode both ways
    from aom_av1_lavish_tpu.decoder import decode_ivf
    ivf = str(tmp_path / "sf.ivf")
    write_ivf(ivf, [(p, i) for i, p in enumerate(payloads)], W, H, 30, 1)
    ours = decode_ivf(ivf)
    assert len(ours) == N
    if not HAVE_ORACLE:
        return
    out = str(tmp_path / "sf.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    golden = read_y4m(out)[0]
    for a, b in zip(ours, golden):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)
