"""Large-scale-tile analog: lightfield-style single-tile random access
(av1_ext_tile_test.cc / examples/lightfield_*.c behavior)."""

import numpy as np

from aom_av1_lavish_tpu.decoder.decoder import (decode_frame_obus,
                                                decode_single_tile)
from aom_av1_lavish_tpu.encoder.encoder import (LosslessEncoder,
                                                make_lossless_frame_header,
                                                make_sequence_header)


def _views(n, w, h):
    rng = np.random.default_rng(3)
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        y = (120 + 70 * np.sin((yy + 7 * i) / 11.0)
             * np.cos((xx - 5 * i) / 13.0)
             + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        out.append((y,
                    np.full((h // 2, w // 2), 100 + 9 * i, np.uint8),
                    np.full((h // 2, w // 2), 150 - 7 * i, np.uint8)))
    return out


def test_single_tile_random_access_matches_full_decode():
    n, vw, vh = 4, 64, 64
    views = _views(n, vw, vh)
    frame = tuple(np.concatenate([v[k] for v in views], axis=1)
                  for k in range(3))
    sh = make_sequence_header(vw * n, vh)
    fh = make_lossless_frame_header(
        sh, tile_cols_log2=(n - 1).bit_length())
    payload = LosslessEncoder(sh, fh).encode_frame(frame)
    full, _ = decode_frame_obus(payload, None, {"slots": [None] * 8})
    for k in range(n):
        (ty, tu, tv), (y0, x0), _ = decode_single_tile(payload, k)
        assert (y0, x0) == (0, k * vw)
        np.testing.assert_array_equal(ty, views[k][0])
        np.testing.assert_array_equal(tu, views[k][1])
        np.testing.assert_array_equal(tv, views[k][2])
        np.testing.assert_array_equal(
            full[0][0][:, k * vw:(k + 1) * vw], ty)
