"""Loop restoration: Wiener/SGR kernel bit-exactness vs the reference
oracle + stream conformance with restoration enabled."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.common import restoration as LR
from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

ROOT = os.path.join(os.path.dirname(__file__), "..")
ORACLE = os.path.join(ROOT, ".oracle", "liblr_oracle.so")
AOMENC = os.path.join(ROOT, ".oracle", "build", "aomenc")
AOMDEC = os.path.join(ROOT, ".oracle", "build", "aomdec")
HAVE_ORACLE = os.path.exists(AOMENC) and os.path.exists(AOMDEC)


def _rand_wiener(rng):
    t3 = [int(rng.integers(LR.WIENER_TAP_MIN[i], LR.WIENER_TAP_MAX[i] + 1))
          for i in range(3)]
    return [t3[0], t3[1], t3[2], -2 * sum(t3), t3[2], t3[1], t3[0], 0]


def _rand_sgr(rng):
    ep = int(rng.integers(0, 16))
    r0, r1, _, _ = LR.SGR_PARAMS[ep]
    xqd = [0, 0]
    if r0 == 0:
        xqd[1] = int(rng.integers(LR.SGRPROJ_PRJ_MIN1,
                                  LR.SGRPROJ_PRJ_MAX1 + 1))
    elif r1 == 0:
        xqd[0] = int(rng.integers(LR.SGRPROJ_PRJ_MIN0,
                                  LR.SGRPROJ_PRJ_MAX0 + 1))
        xqd[1] = max(LR.SGRPROJ_PRJ_MIN1,
                     min(LR.SGRPROJ_PRJ_MAX1, 128 - xqd[0]))
    else:
        xqd[0] = int(rng.integers(LR.SGRPROJ_PRJ_MIN0,
                                  LR.SGRPROJ_PRJ_MAX0 + 1))
        xqd[1] = int(rng.integers(LR.SGRPROJ_PRJ_MIN1,
                                  LR.SGRPROJ_PRJ_MAX1 + 1))
    return ep, xqd


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
def test_wiener_kernel_oracle():
    lib = ctypes.CDLL(ORACLE)
    lib.oracle_wiener_stripe.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    rng = np.random.default_rng(11)
    for _ in range(30):
        w = int(rng.choice([8, 16, 32, 64]))
        h = int(rng.choice([8, 16, 28, 64]))
        wid, hei = w + 32, h + 32
        src = rng.integers(0, 256, (hei, wid), dtype=np.uint8)
        hf, vf = _rand_wiener(rng), _rand_wiener(rng)
        ref_out = np.zeros((h, w), np.uint8)
        hfc = (ctypes.c_int16 * 8)(*hf)
        vfc = (ctypes.c_int16 * 8)(*vf)
        lib.oracle_wiener_stripe(src.ctypes.data + 12 * wid + 12, wid,
                                 ref_out.ctypes.data, w, hfc, vfc, w, h)
        our = LR.wiener_filter(src, 12, 12, w, h, hf, vf)
        np.testing.assert_array_equal(our, ref_out)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
def test_sgr_kernel_oracle():
    lib = ctypes.CDLL(ORACLE)
    lib.oracle_sgr.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p]
    rng = np.random.default_rng(12)
    tmp = np.zeros(2 * 400000, np.int32)
    for _ in range(30):
        w = int(rng.choice([8, 16, 32, 64]))
        h = int(rng.choice([4, 8, 28, 64]))
        wid, hei = w + 32, h + 32
        src = rng.integers(0, 256, (hei, wid), dtype=np.uint8)
        ep, xqd = _rand_sgr(rng)
        ref_out = np.zeros((h, w), np.uint8)
        xqdc = (ctypes.c_int * 2)(*xqd)
        lib.oracle_sgr(src.ctypes.data + 12 * wid + 12, w, h, wid, ep, xqdc,
                       ref_out.ctypes.data, w, tmp.ctypes.data)
        our = LR.sgr_filter(src, 12, 12, w, h, ep, xqd)
        np.testing.assert_array_equal(our, ref_out,
                                      err_msg=f"ep={ep} xqd={xqd}")


@pytest.mark.skipif(not HAVE_ORACLE, reason="aom oracle not built")
def test_restoration_stream_conformance(tmp_path):
    """Wiener + SGR + switchable restoration over multiple frames with
    CDEF interaction and deblock/CDEF stripe boundary context."""
    from test_inter_decode import _moving_frames
    w, h = 160, 128
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "t.ivf")
    dec = str(tmp_path / "dec.y4m")
    write_y4m(src, _moving_frames(w, h, 6), w, h)
    subprocess.run([AOMENC, "--codec=av1", "-w", str(w), "-h", str(h),
                    "--ivf", "-o", ivf, "--cpu-used=2", "--passes=1",
                    "--threads=1", "--tile-columns=0", "--kf-max-dist=9999",
                    "--enable-restoration=1", "--enable-palette=0",
                    "--enable-intrabc=0", "--end-usage=q", "--cq-level=30",
                    src], check=True, capture_output=True)
    subprocess.run([AOMDEC, "-o", dec, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(dec)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i} "
                                          f"plane {pi}")


# ---------------------------------------------------------------------------
# Encoder-side LR search (pickrst.py)
# ---------------------------------------------------------------------------


def _noisy_frame(w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
         + rng.normal(0, 12, (h, w))).clip(0, 255).astype(np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    u = (128 + 40 * np.sin(xx[:ch * 2:2, :cw * 2:2] / 31.0)
         + rng.normal(0, 6, (ch, cw))).clip(0, 255).astype(np.uint8)
    v = (128 + rng.normal(0, 8, (ch, cw))).clip(0, 255).astype(np.uint8)
    return y, u, v


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else 99.0


@pytest.mark.parametrize("cdef", [0, 1])
def test_encoder_lr_selfdecode(tmp_path, cdef):
    """LR search must emit decodable streams and not hurt quality."""
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf
    w, h = 160, 128
    frame = _noisy_frame(w, h)
    base = str(tmp_path / "base.ivf")
    lr = str(tmp_path / "lr.ivf")
    encode_lossy_ivf(base, [frame], w, h, qindex=120, enable_cdef=cdef)
    encode_lossy_ivf(lr, [frame], w, h, qindex=120, enable_cdef=cdef,
                     enable_restoration=1)
    yb = decode_ivf(base)[0][0]
    yl = decode_ivf(lr)[0][0]
    assert _psnr(yl, frame[0]) >= _psnr(yb, frame[0]) - 0.01


@pytest.mark.skipif(not HAVE_ORACLE, reason="aomdec oracle not built")
@pytest.mark.parametrize("dims,cdef", [
    ((160, 128), 0), ((160, 128), 1),
    ((176, 144), 0),    # non-multiple-of-unit dims
    ((100, 76), 0),     # tiny partial units
])
def test_encoder_lr_conformance_aomdec(tmp_path, dims, cdef):
    """Streams carrying searched LR units must decode identically in
    stock aomdec and in our decoder."""
    from aom_av1_lavish_tpu.encoder.lossy import encode_lossy_ivf
    w, h = dims
    frame = _noisy_frame(w, h, seed=5)
    ivf = str(tmp_path / "lr.ivf")
    out = str(tmp_path / "dec.y4m")
    encode_lossy_ivf(ivf, [frame], w, h, qindex=140, enable_cdef=cdef,
                     enable_restoration=1)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ours = decode_ivf(ivf)[0]
    ref = read_y4m(out)[0][0]
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)
