"""CDEF: unit bit-exactness vs the reference oracle + stream conformance."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.common import cdef as CD
from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

ROOT = os.path.join(os.path.dirname(__file__), "..")
ORACLE = os.path.join(ROOT, ".oracle", "libcdef_oracle.so")
AOMENC = os.path.join(ROOT, ".oracle", "build", "aomenc")
AOMDEC = os.path.join(ROOT, ".oracle", "build", "aomdec")

S = 144  # reference CDEF_BSTRIDE (128 superblock)


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
def test_cdef_find_dir_oracle():
    lib = ctypes.CDLL(ORACLE)
    rng = np.random.default_rng(0)
    for _ in range(100):
        blk = rng.integers(0, 256, (8, 8)).astype(np.uint16)
        var = ctypes.c_int32(0)
        d = lib.oracle_cdef_find_dir(
            blk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), 8,
            ctypes.byref(var), 0)
        dirs, variances = CD.find_dir_blocks(blk[None].astype(np.int32))
        assert d == dirs[0] and var.value == variances[0]


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle not built")
def test_cdef_filter_oracle():
    lib = ctypes.CDLL(ORACLE)
    rng = np.random.default_rng(1)
    for t in range(200):
        bh, bw = (8, 8) if t % 3 else (4, 4)
        buf = rng.integers(0, 256, (bh + 4, S)).astype(np.uint16)
        if t % 3 == 0:
            buf[:, :2] = CD.CDEF_VERY_LARGE
        if t % 5 == 0:
            buf[:2, :] = CD.CDEF_VERY_LARGE
        pri = int(rng.integers(0, 16))
        sec = int(rng.integers(0, 4))
        sec += sec == 3
        d = int(rng.integers(0, 8))
        damp = int(rng.integers(3, 7))
        dst = np.zeros((bh, bw), np.uint8)
        lib.oracle_cdef_filter(
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), bw,
            ctypes.c_void_p(buf.ctypes.data + 2 * (2 * S + 2)), pri, sec, d,
            damp, damp, bw, bh)
        ours = np.clip(CD.filter_block(buf[:bh + 4, :bw + 4].astype(np.int32),
                                       pri, sec, d, damp, damp, bw, bh),
                       0, 255).astype(np.uint8)
        np.testing.assert_array_equal(ours, dst)


@pytest.mark.skipif(not (os.path.exists(AOMENC) and os.path.exists(AOMDEC)),
                    reason="aom oracle not built")
def test_cdef_stream_conformance(tmp_path):
    rng = np.random.default_rng(5)
    w, h = 128, 96
    frames = []
    base = (np.kron(rng.integers(0, 256, (20, 24)), np.ones((10, 10)))
            + rng.integers(-15, 15, (200, 240))).clip(0, 255).astype(np.uint8)
    for i in range(5):
        y = base[5 + i:5 + i + h, 6 + 2 * i:6 + 2 * i + w].copy()
        u = (128 + 30 * np.sin((np.mgrid[0:h // 2, 0:w // 2][0] + 4 * i)
                               / 13)).astype(np.uint8)
        v = base[:h // 2, i:i + w // 2]
        frames.append((y, u, v))
    src = str(tmp_path / "s.y4m")
    ivf = str(tmp_path / "c.ivf")
    out = str(tmp_path / "d.y4m")
    write_y4m(src, frames, w, h)
    subprocess.run(
        [AOMENC, "--codec=av1", "-w", str(w), "-h", str(h), "--ivf", "-o",
         ivf, "--cpu-used=5", "--end-usage=q", "--cq-level=40", "--passes=1",
         "--lag-in-frames=0", "--kf-max-dist=9999",
         "--enable-chroma-deltaq=0", "--aq-mode=0", "--enable-restoration=0",
         "--enable-obmc=0", "--enable-warped-motion=0",
         "--enable-global-motion=0", "--enable-dual-filter=0",
         "--enable-interintra-comp=0", "--enable-masked-comp=0",
         "--enable-dist-wtd-comp=0", "--enable-ref-frame-mvs=0",
         "--max-reference-frames=3", "--enable-filter-intra=0",
         "--enable-intrabc=0", "--enable-palette=0", "--enable-cfl-intra=0",
         "--enable-smooth-interintra=0", "--error-resilient=1",
         "--tile-columns=0", "--tile-rows=0", "--threads=1", src],
        check=True, capture_output=True)
    subprocess.run([AOMDEC, "-o", out, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(out)[0]
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"frame {i} plane {pi}")
