"""Native (C) tile entropy encoder must match the Python sink byte-exactly."""

import numpy as np
import pytest

from aom_av1_lavish_tpu.encoder import (LosslessEncoder,
                                        make_lossless_frame_header,
                                        make_sequence_header)
from aom_av1_lavish_tpu.runtime import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native runtime unavailable")


@pytest.mark.parametrize("dims", [(64, 64), (100, 76), (176, 144)])
@pytest.mark.parametrize("seed", [0, 1])
def test_native_matches_python(dims, seed):
    w, h = dims
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8)
    v = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8)
    sh = make_sequence_header(w, h)
    d_native = LosslessEncoder(sh, make_lossless_frame_header(sh),
                               use_native=True).encode_frame((y, u, v))
    d_python = LosslessEncoder(sh, make_lossless_frame_header(sh),
                               use_native=False).encode_frame((y, u, v))
    assert d_native == d_python
