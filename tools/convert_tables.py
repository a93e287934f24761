"""Convert tools/dump_tables.c output (av1_tables.bin) into data/av1_tables.npz.

Stores arrays flat (u16/i16); logical shapes are applied by
aom_av1_lavish_tpu/bitstream/tables.py at load time.
"""

import struct
import sys

import numpy as np


def main(src, dst):
    arrays = {}
    with open(src, "rb") as f:
        while True:
            hdr = f.read(4)
            if not hdr:
                break
            (nlen,) = struct.unpack("<I", hdr)
            name = f.read(nlen).decode()
            tag, n = struct.unpack("<II", f.read(8))
            dtype = {0: np.uint16, 1: np.int16}[tag]
            arrays[name] = np.frombuffer(f.read(2 * n), dtype=dtype).copy()
    np.savez_compressed(dst, **arrays)
    print(f"wrote {dst}: {len(arrays)} arrays")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".oracle/av1_tables.bin",
         sys.argv[2] if len(sys.argv) > 2 else "data/av1_tables.npz")
