"""Variable-partition device inter path: {16, 32, 64} merge DP.

Covers the bottom-up partition merge (ops/inter_tpu.py _p_frame_core
merge stage — av1_rd_pick_partition analog, partition_search.c:5310),
the leaf-mask device deblock, the variable-size native C tile walker
(runtime/inter_tile.c), and the bitstream-debug analog
(utils/bitdebug.py, debug_util.h:30-40 analog).
"""

import numpy as np
import pytest


def _clip(W, H, N, seed, detail=True):
    rng = np.random.default_rng(seed)
    base = (128 + 60 * np.sin(np.arange(H + 2 * N)[:, None] / 17.0)
            * np.cos(np.arange(W + 2 * N)[None, :] / 23.0)
            + rng.normal(0, 4, (H + 2 * N, W + 2 * N))) \
        .clip(0, 255).astype(np.uint8)
    frames = []
    for i in range(N):
        y = np.ascontiguousarray(base[i:i + H, 2 * i:2 * i + W])
        if detail:
            y[:24, :24] = rng.integers(0, 255, (24, 24), dtype=np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 100, np.uint8)
        frames.append((y, u, v))
    return frames


def test_merge_dp_picks_mixed_leaves():
    """Smooth panned content merges to 32/64; a noisy corner stays 16."""
    frames = _clip(128, 96, 2, 3)
    from aom_av1_lavish_tpu.ops.inter_tpu import DeviceInterEncoder
    dev = DeviceInterEncoder(120)
    raw = dev.encode_frame_raw(list(frames[1]), [frames[0]])
    lvl = raw["lvl"]
    assert lvl.shape == (6, 8)
    assert (lvl == 1).any() or (lvl == 2).any(), "no merges on smooth pan"
    # the noisy 24x24 corner must keep at least one 16x16 leaf
    assert (lvl[:2, :2] == 0).any()


@pytest.mark.parametrize("q", [60, 120, 180])
def test_native_walker_matches_python_with_merges(q):
    """The variable-size C walker is byte-identical to the Python
    emitter on merged streams (single-ref low-delay)."""
    W, H = 128, 96
    frames = _clip(W, H, 4, 5)
    from aom_av1_lavish_tpu.encoder.tpu_inter import TpuLowDelayEncoder
    outs = {}
    for nat in (False, True):
        enc = TpuLowDelayEncoder(W, H, qindex=q, use_native=nat)
        outs[nat] = [enc.encode_frame(f) for f in frames]
    assert outs[False] == outs[True]


def test_native_walker_matches_python_gop_two_ref():
    """Byte identity through the GOP chain (LAST + ARF, deblock on)."""
    W, H = 160, 128
    frames = _clip(W, H, 6, 9)
    from aom_av1_lavish_tpu.encoder.gop import GopEncoder
    outs = {}
    for nat in (False, True):
        enc = GopEncoder(W, H, qindex=120, use_tpu=True, use_native=nat)
        outs[nat] = enc.encode_sequence(frames)
    assert outs[False] == outs[True]


def test_merged_gop_recon_matches_decode():
    """Chained device recon (incl. leaf-mask deblock) == decoder output
    byte-exactly at the end of a merged GF group."""
    W, H = 128, 96
    frames = _clip(W, H, 6, 7)
    from aom_av1_lavish_tpu.encoder.gop import GopEncoder
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    from aom_av1_lavish_tpu.decoder.decoder import decode_ivf
    import tempfile, os
    enc = GopEncoder(W, H, qindex=110, use_tpu=True)
    payloads = enc.encode_sequence(frames)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.ivf")
        write_ivf(path, [(p, i) for i, p in enumerate(payloads)],
                  W, H, 30, 1)
        dec = decode_ivf(path)
    last = enc.slots[enc.last_slot]
    for p in range(3):
        assert np.array_equal(np.asarray(last[p]), np.asarray(dec[-1][p]))


def test_bitdebug_identical_and_divergent():
    """diff_streams returns None for identical streams and a located
    ordinal for a corrupted one."""
    W, H = 128, 96
    frames = _clip(W, H, 3, 11)
    from aom_av1_lavish_tpu.encoder.tpu_inter import TpuLowDelayEncoder
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    from aom_av1_lavish_tpu.utils.bitdebug import diff_streams
    import tempfile, os
    enc = TpuLowDelayEncoder(W, H, qindex=120)
    payloads = [enc.encode_frame(f) for f in frames]
    with tempfile.TemporaryDirectory() as td:
        a = os.path.join(td, "a.ivf")
        b = os.path.join(td, "b.ivf")
        write_ivf(a, [(p, i) for i, p in enumerate(payloads)], W, H, 30, 1)
        mod = list(payloads)
        blob = bytearray(mod[-1])
        blob[len(blob) // 2] ^= 0x40     # corrupt a tile byte
        mod[-1] = bytes(blob)
        write_ivf(b, [(p, i) for i, p in enumerate(mod)], W, H, 30, 1)
        assert diff_streams(a, a) is None
        r = diff_streams(a, b)
        assert r is not None and r["ordinal"] >= 0


def test_device_interp_filter_search_conformance():
    """The device frame-filter pick (regular/smooth/sharp banks) keeps
    chained recon byte-identical to the decoder on subpel motion."""
    W, H = 128, 96
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:H * 2, 0:W * 2]
    field = (128 + 60 * np.sin(yy / 13.0) * np.cos(xx / 17.0)
             + rng.normal(0, 4, yy.shape)).clip(0, 255)
    frames = []
    for i in range(6):
        off = i * 1.5
        o0 = int(off)
        fr = off - o0
        y = ((1 - fr) * field[0:H, o0:o0 + W]
             + fr * field[0:H, o0 + 1:o0 + 1 + W]).clip(0, 255) \
            .astype(np.uint8)
        frames.append((y, np.full((H // 2, W // 2), 120, np.uint8),
                       np.full((H // 2, W // 2), 96, np.uint8)))
    from aom_av1_lavish_tpu.encoder.gop import GopEncoder
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    from aom_av1_lavish_tpu.decoder.decoder import decode_ivf
    import tempfile, os
    enc = GopEncoder(W, H, qindex=110, use_tpu=True)
    payloads = enc.encode_sequence(frames)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "f.ivf")
        write_ivf(path, [(p, i) for i, p in enumerate(payloads)],
                  W, H, 30, 1)
        dec = decode_ivf(path)
    last = enc.slots[enc.last_slot]
    for p in range(3):
        assert np.array_equal(np.asarray(last[p]), np.asarray(dec[-1][p]))
