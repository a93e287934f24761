"""Inter-frame decode conformance: our decoder must reproduce stock
aomdec's output bit-exactly on aomenc-produced inter streams (key frame +
P-frames, single-reference toolset)."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

ROOT = os.path.join(os.path.dirname(__file__), "..")
AOMENC = os.path.join(ROOT, ".oracle", "build", "aomenc")
AOMDEC = os.path.join(ROOT, ".oracle", "build", "aomdec")
HAVE_ORACLE = os.path.exists(AOMENC) and os.path.exists(AOMDEC)

ENC_FLAGS = [
    "--cpu-used={cpu}", "--end-usage=q", "--cq-level={q}", "--passes=1",
    "--lag-in-frames=0", "--kf-max-dist=9999", "--enable-chroma-deltaq=0",
    "--aq-mode=0", "--enable-restoration=0",
    "--enable-obmc=0", "--enable-warped-motion=0",
    "--enable-global-motion=0",
    "--enable-interintra-comp=0", "--enable-masked-comp=0",
    "--enable-dist-wtd-comp=0", "--enable-ref-frame-mvs=0",
    "--max-reference-frames=3",
    "--enable-intrabc=0", "--enable-palette=0",
    "--error-resilient=1",
    "--tile-columns=0", "--tile-rows=0", "--threads=1",
]


def _moving_frames(w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    base = (np.kron(rng.integers(0, 256, ((h + 64) // 12 + 1,
                                          (w + 64) // 12 + 1)),
                    np.ones((12, 12)))
            + rng.integers(-20, 20, ((h + 64) // 12 * 12 + 12,
                                     (w + 64) // 12 * 12 + 12))) \
        .clip(0, 255).astype(np.uint8)
    frames = []
    for i in range(n):
        y = base[8 + i:8 + i + h, 4 + 2 * i:4 + 2 * i + w].copy()
        y[20 + 3 * i:40 + 3 * i, 10 + 4 * i:30 + 4 * i] = (60 + 25 * i) % 255
        u = (128 + 40 * np.sin((np.mgrid[0:h // 2, 0:w // 2][0] + 5 * i)
                               / 17)).astype(np.uint8)
        v = base[:h // 2, i:i + w // 2]
        frames.append((y, u, v))
    return frames


@pytest.mark.skipif(not HAVE_ORACLE, reason="aom oracle not built")
@pytest.mark.parametrize("cpu,q", [(6, 30), (3, 30), (6, 50)])
def test_inter_decode_conformance(tmp_path, cpu, q):
    _run_conformance(tmp_path, cpu, q, extra=[])


@pytest.mark.skipif(not HAVE_ORACLE, reason="aom oracle not built")
def test_inter_decode_non_error_resilient(tmp_path):
    """primary_ref_frame CDF carryover + counter resets."""
    _run_conformance(tmp_path, 5, 35, extra=None, error_resilient=False)


@pytest.mark.skipif(not HAVE_ORACLE, reason="aom oracle not built")
def test_inter_decode_motion_modes_compound(tmp_path):
    """OBMC + warped motion + masked/dist-wtd compound + TMVP + hidden
    ARF frames (lag-in-frames) + show_existing_frame, non-error-resilient.

    Exercises: setup_ref_mv_list compound stacks, motion_field_projection
    (mvref_common.c:1132), av1_warp_affine (warped_motion.c:538), OBMC
    blending (reconinter.c), wedge/diffwtd masks, dist-wtd averaging."""
    w, h = 128, 96
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "t.ivf")
    dec = str(tmp_path / "dec.y4m")
    write_y4m(src, _moving_frames(w, h, 8), w, h)
    flags = ["--cpu-used=4", "--end-usage=q", "--cq-level=32", "--passes=1",
             "--lag-in-frames=8", "--auto-alt-ref=1", "--kf-max-dist=9999",
             "--enable-obmc=1", "--enable-warped-motion=1",
             "--enable-masked-comp=1", "--enable-dist-wtd-comp=1",
             "--enable-ref-frame-mvs=1", "--enable-global-motion=0",
             "--enable-interintra-comp=0", "--enable-restoration=0",
             "--tile-columns=0", "--tile-rows=0", "--threads=1"]
    subprocess.run([AOMENC, "--codec=av1", "-w", str(w), "-h", str(h),
                    "--ivf", "-o", ivf] + flags + [src],
                   check=True, capture_output=True)
    subprocess.run([AOMDEC, "-o", dec, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(dec)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i} "
                                          f"plane {pi}")


@pytest.mark.skipif(not HAVE_ORACLE, reason="aom oracle not built")
def test_inter_decode_global_motion(tmp_path):
    """Non-identity global motion: per-ref warp model parse
    (read_global_motion, decodeframe.c:4335), gm_get_motion_vector MV
    derivation, GLOBALMV candidate substitution, and global-warp
    prediction.  Global pan+zoom content forces ROTZOOM models."""
    w, h = 160, 128
    rng = np.random.default_rng(3)
    base = (np.kron(rng.integers(0, 256, ((h + 96) // 8, (w + 96) // 8)),
                    np.ones((8, 8)))
            + rng.integers(-25, 25, (h + 96, w + 96))) \
        .clip(0, 255).astype(np.uint8)
    frames = []
    for i in range(6):
        y = base[4 + 3 * i:4 + 3 * i + h, 6 + 5 * i:6 + 5 * i + w].copy()
        u = base[2 + i:2 + i + h // 2, 3 + 2 * i:3 + 2 * i + w // 2].copy()
        v = base[10 + i:10 + i + h // 2, 1 + 3 * i:1 + 3 * i + w // 2].copy()
        frames.append((y, u, v))
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "t.ivf")
    dec = str(tmp_path / "dec.y4m")
    write_y4m(src, frames, w, h)
    subprocess.run([AOMENC, "--codec=av1", "-w", str(w), "-h", str(h),
                    "--ivf", "-o", ivf, "--cpu-used=3", "--passes=1",
                    "--threads=1", "--tile-columns=0", "--kf-max-dist=9999",
                    "--enable-global-motion=1", "--enable-restoration=0",
                    "--enable-palette=0", "--enable-intrabc=0",
                    "--end-usage=q", "--cq-level=30", src],
                   check=True, capture_output=True)
    subprocess.run([AOMDEC, "-o", dec, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(dec)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i} "
                                          f"plane {pi}")


@pytest.mark.skipif(not HAVE_ORACLE, reason="aom oracle not built")
@pytest.mark.parametrize("aq", [1, 2])
def test_inter_decode_segmentation(tmp_path, aq):
    """Segmentation (aq-mode): setup_segmentation parse with primary-ref
    inheritance (decodeframe.c:1419), spatial/temporal segment-id coding
    (decodemv.c:279-441), per-segment qindex and loop-filter deltas."""
    w, h = 176, 144
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "t.ivf")
    dec = str(tmp_path / "dec.y4m")
    write_y4m(src, _moving_frames(w, h, 6), w, h)
    subprocess.run([AOMENC, "--codec=av1", "-w", str(w), "-h", str(h),
                    "--ivf", "-o", ivf, "--cpu-used=5", "--passes=1",
                    "--threads=1", "--tile-columns=0", "--kf-max-dist=9999",
                    f"--aq-mode={aq}", "--end-usage=q", "--cq-level=35",
                    "--enable-palette=0", "--enable-intrabc=0", src],
                   check=True, capture_output=True)
    subprocess.run([AOMDEC, "-o", dec, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(dec)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i} "
                                          f"plane {pi}")


@pytest.mark.skipif(not HAVE_ORACLE, reason="aom oracle not built")
def test_inter_decode_interintra(tmp_path):
    """cpu-used=1 toolset: interintra (wedge + smooth) prediction
    (reconinter.c:1152), plus per-sub-block interp filters in the
    sub8x8 chroma path (reconinter_template.inc:144)."""
    w, h = 176, 144
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "t.ivf")
    dec = str(tmp_path / "dec.y4m")
    write_y4m(src, _moving_frames(w, h, 3), w, h)
    subprocess.run([AOMENC, "--codec=av1", "-w", str(w), "-h", str(h),
                    "--ivf", "-o", ivf, "--cpu-used=1", "--passes=1",
                    "--threads=1", "--tile-columns=0", "--kf-max-dist=9999",
                    "--enable-palette=0", "--enable-intrabc=0",
                    "--end-usage=q", "--cq-level=40", src],
                   check=True, capture_output=True)
    subprocess.run([AOMDEC, "-o", dec, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(dec)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i} "
                                          f"plane {pi}")


@pytest.mark.skipif(not HAVE_ORACLE, reason="aom oracle not built")
def test_inter_decode_two_pass_vbr(tmp_path):
    """Two-pass VBR encode: exercises the full GOP/ARF structure plus
    drl indices beyond the populated compound stack."""
    w, h = 176, 144
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "t.ivf")
    dec = str(tmp_path / "dec.y4m")
    write_y4m(src, _moving_frames(w, h, 8), w, h)
    subprocess.run([AOMENC, "--codec=av1", "-w", str(w), "-h", str(h),
                    "--ivf", "-o", ivf, "--cpu-used=5", "--passes=2",
                    "--target-bitrate=200", "--threads=1",
                    "--tile-columns=0", "--kf-max-dist=9999",
                    "--enable-palette=0", "--enable-intrabc=0", src],
                   check=True, capture_output=True)
    subprocess.run([AOMDEC, "-o", dec, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(dec)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i} "
                                          f"plane {pi}")


@pytest.mark.skipif(not HAVE_ORACLE, reason="aom oracle not built")
def test_inter_decode_default_flags(tmp_path):
    """Fully-default aomenc invocation (all tools at their defaults,
    including CDEF, dual filters, compound, OBMC/warp, TMVP, hidden
    frames): the stream a real user would produce."""
    w, h = 128, 96
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "t.ivf")
    dec = str(tmp_path / "dec.y4m")
    write_y4m(src, _moving_frames(w, h, 6), w, h)
    subprocess.run([AOMENC, "--codec=av1", "-w", str(w), "-h", str(h),
                    "--ivf", "-o", ivf, "--cpu-used=6", "--passes=1",
                    "--threads=1", "--tile-columns=0", "--kf-max-dist=9999",
                    src], check=True, capture_output=True)
    subprocess.run([AOMDEC, "-o", dec, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(dec)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i} "
                                          f"plane {pi}")


def _run_conformance(tmp_path, cpu, q, extra, error_resilient=True):
    w, h = 128, 96
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "t.ivf")
    dec = str(tmp_path / "dec.y4m")
    write_y4m(src, _moving_frames(w, h, 6), w, h)
    flags = [f.format(cpu=cpu, q=q) for f in ENC_FLAGS]
    if not error_resilient:
        flags = [f for f in flags if f != "--error-resilient=1"]
    subprocess.run([AOMENC, "--codec=av1", "-w", str(w), "-h", str(h),
                    "--ivf", "-o", ivf] + flags + [src],
                   check=True, capture_output=True)
    subprocess.run([AOMDEC, "-o", dec, ivf], check=True, capture_output=True)
    ours = decode_ivf(ivf)
    ref = read_y4m(dec)[0]
    assert len(ours) == len(ref)
    for i, (o, r) in enumerate(zip(ours, ref)):
        for pi, (a, b) in enumerate(zip(o, r)):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i} "
                                          f"plane {pi}")
