"""Extended benchmark: all shipped encode configs + per-stage timing.

Writes BENCH_DETAIL.json (list of config records) and prints it.  The
driver-facing single-line benchmark stays in bench.py; this script is
for tracking the full performance picture per round:

  * lossless all-intra (native walk + batched device analyze)
  * lossy all-intra, TPU wavefront path
  * inter GOP (KEY + ARF + P), TPU batched search path
  * per-stage breakdown of the lossless path (analyze vs walk)

vs_baseline compares against the reference aomenc (single thread,
cpu-used=6) on the same machine where the oracle binary exists.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H, N = 352, 288, 8


def make_frames(n=N, w=W, h=H):
    """Synthetic pan: textured luma AND chroma move coherently frame to
    frame (per-frame chroma noise would make inter prediction useless
    on two of three planes, which no real video does)."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h + n * 2, 0:w + n * 2]
    base = (128 + 60 * np.sin(yy / 17.0) * np.cos(xx / 23.0)
            + 40 * (xx % 97 < 40) + rng.normal(0, 3, yy.shape))
    base = base.clip(0, 255).astype(np.uint8)
    cyy, cxx = np.mgrid[0:(h + n * 2) // 2, 0:(w + n * 2) // 2]
    cb = (128 + 35 * np.sin(cyy / 11.0 + 1.0) * np.cos(cxx / 19.0)
          + rng.normal(0, 2, cyy.shape)).clip(0, 255).astype(np.uint8)
    cr = (128 + 30 * np.cos(cyy / 13.0) * np.sin(cxx / 7.0 + 2.0)
          + rng.normal(0, 2, cyy.shape)).clip(0, 255).astype(np.uint8)
    frames = []
    for i in range(n):
        y = np.ascontiguousarray(base[i:i + h, 2 * i:2 * i + w])
        u = np.ascontiguousarray(cb[i // 2:i // 2 + h // 2,
                                    i:i + w // 2])
        v = np.ascontiguousarray(cr[i // 2:i // 2 + h // 2,
                                    i:i + w // 2])
        frames.append((y, u, v))
    return frames


def timed(fn, *a, **kw):
    fn(*a, **kw)          # warm (jit compile)
    t0 = time.perf_counter()
    fn(*a, **kw)
    return time.perf_counter() - t0


def aomenc_fps(frames, tmpdir, args, w=W, h=H):
    from aom_av1_lavish_tpu.utils.y4m import write_y4m
    aomenc = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".oracle", "build", "aomenc")
    if not os.path.exists(aomenc):
        return None
    src = os.path.join(tmpdir, "src.y4m")
    write_y4m(src, frames, w, h)
    out = os.path.join(tmpdir, "ref.ivf")
    t0 = time.perf_counter()
    subprocess.run([aomenc, "--threads=1", "--passes=1"] + args
                   + ["-o", out, src], check=True, capture_output=True)
    return len(frames) / (time.perf_counter() - t0)


def main():
    import tempfile
    from bench import _ensure_backend
    backend = _ensure_backend()
    results = [dict(metric="backend", value=backend)]
    frames = make_frames()
    with tempfile.TemporaryDirectory() as td:
        # 1. lossless all-intra
        from aom_av1_lavish_tpu.encoder import encode_lossless_ivf
        out = os.path.join(td, "l.ivf")
        dt = timed(encode_lossless_ivf, out, frames, W, H)
        ref = aomenc_fps(frames, td, ["--enable-chroma-deltaq=0",
                                      "--aq-mode=0", "--lossless=1",
                                      "--cpu-used=6", "--kf-max-dist=1",
                                      "--kf-min-dist=1"])
        v = N / dt
        results.append(dict(metric="lossless_allintra_352x288", value=round(v, 3),
                            unit="frames/s",
                            vs_baseline=round(v / ref, 3) if ref else None))

        # per-stage split of the lossless path
        from aom_av1_lavish_tpu.encoder.encoder import (
            LosslessEncoder, make_lossless_frame_header,
            make_sequence_header)
        from aom_av1_lavish_tpu.ops.lossless import \
            analyze_frames_for_encoder
        sh = make_sequence_header(W, H)
        encs, srcs = [], []
        for f in frames:
            e = LosslessEncoder(sh, make_lossless_frame_header(sh))
            srcs.append(e.pad_planes(f))
            encs.append(e)
        dt_an = timed(analyze_frames_for_encoder, srcs)
        an = analyze_frames_for_encoder(srcs)
        t0 = time.perf_counter()
        for e, f, a in zip(encs, frames, an):
            e.encode_frame(f, analysis=a)
        dt_walk = time.perf_counter() - t0
        results.append(dict(metric="lossless_stage_analyze_ms_per_frame",
                            value=round(dt_an / N * 1000, 2), unit="ms"))
        results.append(dict(metric="lossless_stage_walk_ms_per_frame",
                            value=round(dt_walk / N * 1000, 2), unit="ms"))

        # 2. lossy all-intra (TPU wavefront)
        from aom_av1_lavish_tpu.encoder.tpu_intra import encode_tpu_ivf
        out2 = os.path.join(td, "ai.ivf")
        dt = timed(encode_tpu_ivf, out2, frames, W, H, 60)
        ref = aomenc_fps(frames, td, ["--cpu-used=6", "--end-usage=q",
                                      "--cq-level=40", "--kf-max-dist=1",
                                      "--kf-min-dist=1"])
        v = N / dt
        results.append(dict(metric="lossy_allintra_tpu_352x288",
                            value=round(v, 3), unit="frames/s",
                            vs_baseline=round(v / ref, 3) if ref else None))

        # 2b. lossy all-intra, device RDO (the quality path, trials on
        # device) — fps plus the equal-quality axis (PSNR at this rate)
        from aom_av1_lavish_tpu.encoder.tpu_rdo import encode_tpu_rdo_ivf
        out2b = os.path.join(td, "rdo.ivf")
        dt = timed(encode_tpu_rdo_ivf, out2b, frames, W, H, 80)
        ref = aomenc_fps(frames, td, ["--cpu-used=6", "--end-usage=q",
                                      "--cq-level=20", "--kf-max-dist=1",
                                      "--kf-min-dist=1"])
        v = N / dt
        results.append(dict(metric="lossy_allintra_rdo_352x288",
                            value=round(v, 3), unit="frames/s",
                            vs_baseline=round(v / ref, 3) if ref else None))
        # BD-rate pairing (tools/bdrate.py writes BDRATE.json)
        bd_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BDRATE.json")
        if os.path.exists(bd_path):
            with open(bd_path) as f:
                bd = json.load(f).get("aggregate", {})
            for k, val in bd.items():
                results.append(dict(metric=k, value=val, unit="percent",
                                    vs_baseline=None))

        # 3. inter GOP (TPU batched search, LAST+ALTREF)
        from aom_av1_lavish_tpu.encoder.gop import encode_gop_ivf
        out3 = os.path.join(td, "gop.ivf")

        def run_gop():
            encode_gop_ivf(out3, frames, W, H, qindex=60, gf_length=8,
                           use_tpu=True, enable_cdef=False)
        dt = timed(run_gop)
        ref = aomenc_fps(frames, td, ["--cpu-used=6", "--end-usage=q",
                                      "--cq-level=40", "--lag-in-frames=8"])
        v = N / dt
        results.append(dict(metric="inter_gop_tpu_352x288",
                            value=round(v, 3), unit="frames/s",
                            vs_baseline=round(v / ref, 3) if ref else None))

        # 4. RTC non-RD path (var partition + non-RD pickmode)
        from aom_av1_lavish_tpu.encoder.nonrd import encode_realtime_ivf
        out4 = os.path.join(td, "rt.ivf")
        dt = timed(encode_realtime_ivf, out4, frames, W, H, 90)
        ref = aomenc_fps(frames, td, ["--cpu-used=9", "--end-usage=q",
                                      "--cq-level=50", "--lag-in-frames=0",
                                      "--usage=1"])
        v = N / dt
        results.append(dict(metric="rtc_nonrd_352x288",
                            value=round(v, 3), unit="frames/s",
                            vs_baseline=round(v / ref, 3) if ref else None))

        # 5. decode throughput on the lossless stream
        from aom_av1_lavish_tpu.decoder import decode_ivf
        dt = timed(decode_ivf, out)
        aomdec = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".oracle", "build", "aomdec")
        refv = None
        if os.path.exists(aomdec):
            t0 = time.perf_counter()
            subprocess.run([aomdec, "-o", os.path.join(td, "d.y4m"), out],
                           check=True, capture_output=True)
            refv = N / (time.perf_counter() - t0)
        v = N / dt
        results.append(dict(metric="decode_lossless_352x288",
                            value=round(v, 3), unit="frames/s",
                            vs_baseline=round(v / refv, 3) if refv
                            else None))

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
