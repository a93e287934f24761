"""Extract the normative film-grain gaussian sequence (2048 entries,
AV1 spec section 7.18.3.1) from the reference source into
data/gaussian_sequence.npy.

Like tools/dump_tables.c, this pulls normative constant data out of the
reference programmatically instead of transcribing it by hand.
"""

import re
import sys

import numpy as np

SRC = "/root/reference/av1/decoder/grain_synthesis.c"


def main(dst="data/gaussian_sequence.npy"):
    text = open(SRC).read()
    m = re.search(r"gaussian_sequence\[2048\]\s*=\s*\{(.*?)\};", text,
                  re.DOTALL)
    vals = [int(v) for v in re.findall(r"-?\d+", m.group(1))]
    assert len(vals) == 2048, len(vals)
    np.save(dst, np.array(vals, np.int32))
    print(f"wrote {dst}: {len(vals)} entries")


if __name__ == "__main__":
    main(*sys.argv[1:])
