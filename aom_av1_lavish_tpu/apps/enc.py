"""aomenc-analog CLI: y4m in, AV1 IVF out.

Reference behavior being mirrored: apps/aomenc.c:2051 (driver loop) +
av1/arg_defs.c (flag registry), collapsed to the options the framework
supports today.

    python -m aom_av1_lavish_tpu.apps.enc in.y4m -o out.ivf \
        --target-bitrate 400 --gf-length 8
    python -m aom_av1_lavish_tpu.apps.enc in.y4m -o out.ivf --lossless 1
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="avl-enc", description="TPU-native AV1 encoder")
    p.add_argument("input", help="input .y4m file")
    p.add_argument("-o", "--output", required=True, help="output .ivf")
    p.add_argument("--limit", type=int, default=0,
                   help="max frames to encode (0 = all)")
    p.add_argument("--lossless", type=int, default=0)
    p.add_argument("--cq-level", type=int, default=60,
                   help="fixed qindex (rc mode Q)")
    p.add_argument("--target-bitrate", type=int, default=0,
                   help="target bitrate in kbit/s (enables CBR)")
    p.add_argument("--end-usage", choices=("q", "cbr", "vbr"), default=None)
    p.add_argument("--kf-max-dist", type=int, default=120)
    p.add_argument("--gf-length", type=int, default=8)
    p.add_argument("--no-arf", action="store_true")
    p.add_argument("--tile-columns", type=int, default=0,
                   help="log2 tile columns")
    p.add_argument("--tile-rows", type=int, default=0,
                   help="log2 tile rows")
    p.add_argument("--enable-cdef", type=int, default=1)
    p.add_argument("--cpu-used", type=int, default=None,
                   help="speed preset 0 (best) .. 9 (fastest)")
    p.add_argument("--tune",
                   choices=("psnr", "ssim", "butteraugli", "vmaf"),
                   default="psnr")
    p.add_argument("--luma-bias", type=float, default=0.0,
                   help="lavish dark-region rdmult bias strength")
    p.add_argument("--tpu", action="store_true",
                   help="use the batched device encode paths")
    p.add_argument("--fps", default=None, help="override fps as N/D")
    p.add_argument("--quiet", "-q", action="store_true")
    # special encode modes (bypass the GOP driver)
    p.add_argument("--usage", choices=("good", "realtime"),
                   default="good")
    p.add_argument("--tune-content", choices=("default", "screen"),
                   default="default")
    p.add_argument("--enable-intrabc", type=int, default=0)
    p.add_argument("--passes", type=int, choices=(1, 2, 3), default=1)
    p.add_argument("--svc-temporal-layers", type=int, default=1)
    p.add_argument("--enable-qm", type=int, default=0)
    p.add_argument("--qm-level", type=int, default=7)
    p.add_argument("--aq-mode", type=int, default=0,
                   help="1 = variance delta-q AQ")
    p.add_argument("--film-grain", type=int, default=0,
                   help="estimate + signal film grain")
    p.add_argument("--superres-denom", type=int, default=8,
                   help="9..16: encode at w*8/denom, signal upscale")
    return p


def _report(args, frames, fps, t0) -> int:
    import os
    dt = time.perf_counter() - t0
    if not args.quiet:
        total = os.path.getsize(args.output)
        kbps = total * 8 * (fps[0] / fps[1]) / max(len(frames), 1) / 1000
        print(f"{len(frames)} frames, {total} bytes ({kbps:.1f} kbit/s), "
              f"{len(frames) / dt:.2f} fps", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    from ..utils.backend import ensure_backend
    ensure_backend()
    args = build_parser().parse_args(argv)
    from ..api import Encoder, EncoderConfig
    from ..bitstream.ivf import write_ivf
    from ..encoder.ratectrl import MODE_CBR, MODE_Q, MODE_VBR
    from ..utils.y4m import read_y4m

    frames, width, height, sub = read_y4m(args.input)
    if args.limit:
        frames = frames[:args.limit]
    fps = (30, 1)
    if args.fps:
        n, d = args.fps.split("/")
        fps = (int(n), int(d))

    # special modes route to their dedicated drivers
    if args.usage == "realtime":
        from ..encoder.nonrd import encode_realtime_ivf
        t0 = time.perf_counter()
        encode_realtime_ivf(args.output, frames, width, height,
                            qindex=args.cq_level, fps=fps)
        return _report(args, frames, fps, t0)
    if args.tune_content == "screen":
        from ..encoder.lossy import encode_lossy_ivf
        t0 = time.perf_counter()
        encode_lossy_ivf(args.output, frames, width, height,
                         qindex=args.cq_level, fps=fps, screen=True,
                         intrabc=bool(args.enable_intrabc))
        return _report(args, frames, fps, t0)
    if args.svc_temporal_layers > 1:
        from ..encoder.svc import encode_svc_ivf
        t0 = time.perf_counter()
        encode_svc_ivf(args.output, frames, width, height,
                       temporal_layers=args.svc_temporal_layers,
                       qindex=args.cq_level, fps=fps)
        return _report(args, frames, fps, t0)
    if args.superres_denom != 8:
        from ..encoder.lossy import encode_superres_ivf
        t0 = time.perf_counter()
        encode_superres_ivf(args.output, frames, width, height,
                            qindex=args.cq_level, fps=fps,
                            denom=args.superres_denom)
        return _report(args, frames, fps, t0)
    if sub != "420" or args.enable_qm or args.aq_mode or args.film_grain:
        from ..encoder.lossy import encode_lossy_ivf
        t0 = time.perf_counter()
        encode_lossy_ivf(
            args.output, frames, width, height, qindex=args.cq_level,
            fps=fps, subsampling=sub, aq=bool(args.aq_mode),
            grain=bool(args.film_grain),
            qm=((args.qm_level,) * 3 if args.enable_qm else None))
        return _report(args, frames, fps, t0)
    if args.passes == 2:
        from ..encoder.gop import encode_twopass_ivf
        t0 = time.perf_counter()
        encode_twopass_ivf(args.output, frames, width, height, fps=fps,
                           qindex=args.cq_level,
                           kf_interval=args.kf_max_dist,
                           gf_length=args.gf_length)
        return _report(args, frames, fps, t0)
    if args.passes == 3:
        from ..encoder.thirdpass import encode_threepass_ivf
        t0 = time.perf_counter()
        encode_threepass_ivf(args.output, frames, width, height, fps=fps,
                             qindex=args.cq_level,
                             kf_interval=args.kf_max_dist,
                             gf_length=args.gf_length)
        return _report(args, frames, fps, t0)
    mode = MODE_Q
    if args.end_usage == "cbr" or (args.end_usage is None
                                   and args.target_bitrate):
        mode = MODE_CBR
    elif args.end_usage == "vbr":
        mode = MODE_VBR
    cfg = EncoderConfig(
        width=width, height=height, fps=fps[0] / fps[1],
        rc_mode=mode, target_bps=args.target_bitrate * 1000,
        qindex=args.cq_level, kf_interval=args.kf_max_dist,
        gf_length=args.gf_length, use_arf=not args.no_arf,
        lossless=bool(args.lossless), enable_cdef=bool(args.enable_cdef),
        tile_cols_log2=args.tile_columns, tile_rows_log2=args.tile_rows,
        use_tpu=args.tpu, tune=args.tune, luma_bias=args.luma_bias,
        cpu_used=args.cpu_used)
    enc = Encoder(cfg)
    t0 = time.perf_counter()
    for f in frames:
        enc.encode(f)
    payloads = enc.flush()
    dt = time.perf_counter() - t0
    write_ivf(args.output, [(p, i) for i, p in enumerate(payloads)],
              width, height, fps[0], fps[1])
    if not args.quiet:
        total = sum(len(p) for p in payloads)
        kbps = total * 8 * (fps[0] / fps[1]) / max(len(payloads), 1) / 1000
        print(f"{len(payloads)} frames, {total} bytes "
              f"({kbps:.1f} kbit/s), {len(payloads) / dt:.2f} fps",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
