"""Convert tools/dump_qm.c raw output to data/qm_tables.npz.

Stored as one uint8 array per (kind, level, plane-class, tx): keys
"iqm_{q}_{c}_{t}" / "qm_{q}_{c}_{t}", each flat of tx_size_2d[t] values,
only for tx sizes that equal their own adjusted size (others alias)."""

import sys

import numpy as np

# TX_WIDTH/TX_HEIGHT for TX_SIZES_ALL (enums.h order)
TXW = [4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32, 32, 64, 4, 16, 8, 32, 16, 64]
TXH = [4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16, 64, 32, 16, 4, 32, 8, 64, 16]
# av1_get_adjusted_tx_size: cap both dims at 32
ADJ = []
for t in range(19):
    w, h = min(TXW[t], 32), min(TXH[t], 32)
    ADJ.append(next(i for i in range(19) if TXW[i] == w and TXH[i] == h))


def main(raw_path, out_path):
    data = np.fromfile(raw_path, np.uint8)
    pos = 0
    out = {}
    for q in range(15):
        for c in range(2):
            for t in range(19):
                if ADJ[t] != t:
                    continue
                n = TXW[t] * TXH[t]
                out[f"iqm_{q}_{c}_{t}"] = data[pos:pos + n]
                pos += n
                out[f"qm_{q}_{c}_{t}"] = data[pos:pos + n]
                pos += n
    assert pos == len(data), (pos, len(data))
    np.savez_compressed(out_path, **out)
    print(f"wrote {out_path}: {len(out)} arrays")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
