"""OBU-structure dumper — the tools/dump_obu.cc analog.

Walks an .ivf / raw .obu / Annex-B stream and prints one line per OBU
(type, size, extension ids) plus decoded sequence/frame-header summaries,
the way the reference's dump_obu tool (tools/dump_obu.cc:100 +
tools/obu_parser.cc) reports stream structure.

Usage:  python tools/dump_obu.py stream.ivf [--headers]
"""

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OBU_NAMES = {
    0: "RESERVED", 1: "SEQUENCE_HEADER", 2: "TEMPORAL_DELIMITER",
    3: "FRAME_HEADER", 4: "TILE_GROUP", 5: "METADATA", 6: "FRAME",
    7: "REDUNDANT_FRAME_HEADER", 8: "TILE_LIST", 15: "PADDING",
}

FRAME_TYPES = {0: "KEY", 1: "INTER", 2: "INTRA_ONLY", 3: "S"}


def iter_tus(path: str):
    from aom_av1_lavish_tpu.bitstream.ivf import read_ivf
    from aom_av1_lavish_tpu.bitstream.obu import read_annexb, read_obu_file
    if path.endswith(".ivf"):
        for payload, pts in read_ivf(path):
            yield payload, pts
    elif path.endswith(".annexb"):
        for i, tu in enumerate(read_annexb(path)):
            yield tu, i
    else:
        for i, tu in enumerate(read_obu_file(path)):
            yield tu, i


def dump(path: str, show_headers: bool = False) -> int:
    from aom_av1_lavish_tpu.bitstream import headers as H
    from aom_av1_lavish_tpu.bitstream.bits import leb128_decode
    from aom_av1_lavish_tpu.bitstream.obu import _obu_spans
    sh = None
    n_obus = 0
    total = 0
    for payload, pts in iter_tus(path):
        print(f"TU pts={pts} size={len(payload)}")
        for t, full in _obu_spans(payload):
            hdr = full[0]
            has_ext = (hdr >> 2) & 1
            pos = 1 + has_ext
            size, pos = leb128_decode(full, pos)
            ext = ""
            if has_ext:
                eb = full[1]
                ext = f" tid={eb >> 5} sid={(eb >> 3) & 3}"
            name = OBU_NAMES.get(t, f"type{t}")
            print(f"  OBU {name:<18} size={size}{ext}")
            n_obus += 1
            total += len(full)
            pl = full[pos:pos + size]
            if t == 1:
                sh = H.parse_sequence_header(pl)
                if show_headers:
                    print(f"      profile={sh.profile} "
                          f"level={sh.seq_level_idx} "
                          f"{sh.max_frame_width}x{sh.max_frame_height} "
                          f"bitdepth={8 + 2 * (sh.high_bitdepth + sh.twelve_bit)} "
                          f"mono={sh.mono_chrome} "
                          f"order_hint={sh.enable_order_hint} "
                          f"cdef={sh.enable_cdef} lr={sh.enable_restoration} "
                          f"grain={sh.film_grain_params_present}")
            elif t in (3, 6) and sh is not None and show_headers:
                try:
                    fh, _bits = H.parse_frame_header(pl, sh)
                except Exception as e:  # inter headers can need ref state
                    print(f"      <frame header needs ref state: "
                          f"{type(e).__name__}>")
                    continue
                print(f"      {FRAME_TYPES.get(fh.frame_type, '?'):<5} "
                      f"show={fh.show_frame} q={fh.base_q_idx} "
                      f"er={fh.error_resilient_mode} "
                      f"tx_mode={fh.tx_mode} "
                      f"tiles={1 << fh.tile_cols_log2}x"
                      f"{1 << fh.tile_rows_log2} "
                      f"lf={fh.filter_level} cdef_damp={fh.cdef_damping}")
    print(f"{n_obus} OBUs, {total} bytes")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="AV1 OBU dumper")
    p.add_argument("stream", help=".ivf / .obu / .annexb input")
    p.add_argument("--headers", action="store_true",
                   help="decode + print header fields")
    args = p.parse_args(argv)
    return dump(args.stream, args.headers)


if __name__ == "__main__":
    sys.exit(main())
