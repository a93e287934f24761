"""Multi-chip sharding determinism: sharded encode == single-device.

The reference's concurrency contract is bit-exactness, not speed
(test/ethread_test.cc: N-thread encode == 1-thread; SURVEY §4.5).  Here:
the ('frame','tile') mesh-sharded lossless encoder must produce byte-
identical streams to the single-device multi-tile encoder, and those
streams must decode losslessly.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _frames(n, W, H, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.integers(0, 256, (H, W), dtype=np.uint8),
             rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8),
             rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8))
            for _ in range(n)]


def test_sharded_encode_matches_single_device():
    from aom_av1_lavish_tpu.encoder.encoder import (
        LosslessEncoder, make_lossless_frame_header, make_sequence_header)
    from aom_av1_lavish_tpu.parallel.sharding import (
        ShardedLosslessEncoder, make_mesh)

    W, H = 256, 128   # 4 SB-aligned tile columns
    n_frame, n_tile = 2, 4
    assert jax.device_count() >= n_frame * n_tile
    frames = _frames(n_frame, W, H)
    mesh = make_mesh(n_frame, n_tile)
    enc = ShardedLosslessEncoder(W, H, mesh)
    sharded = enc.encode_frames(frames)

    sh = make_sequence_header(W, H)
    single = []
    for f in frames:
        fh = make_lossless_frame_header(sh, tile_cols_log2=2)
        e = LosslessEncoder(sh, fh)
        single.append(e.encode_frame(f))
    assert [len(s) for s in sharded] == [len(s) for s in single]
    for s, t in zip(sharded, single):
        assert s == t, "sharded encode differs from single-device"


def test_sharded_stream_decodes_losslessly():
    from aom_av1_lavish_tpu.decoder.decoder import decode_frame_obus
    from aom_av1_lavish_tpu.parallel.sharding import (
        ShardedLosslessEncoder, make_mesh)

    W, H = 128, 64
    frames = _frames(4, W, H, seed=3)
    mesh = make_mesh(2, 2)
    enc = ShardedLosslessEncoder(W, H, mesh)
    payloads = enc.encode_frames(frames)
    assert len(payloads) == 4
    sh = None
    state = {"slots": [None] * 8}
    for i, p in enumerate(payloads):
        out, sh = decode_frame_obus(p, sh, state)
        for plane in range(3):
            assert np.array_equal(out[0][plane], frames[i][plane])


def test_dryrun_multichip_entry():
    import __graft_entry__ as g
    g.dryrun_multichip(jax.device_count())


def test_fpmt_inter_sharded_byte_identical():
    """FPMT analog: the 'frame'-axis sharded P-frame batch must produce
    byte-identical streams to the serial single-device encode of the
    same flat GOP (ethread.c:1224 determinism contract)."""
    import jax
    from jax.sharding import Mesh
    import numpy as np
    from aom_av1_lavish_tpu.bitstream import headers as HH
    from aom_av1_lavish_tpu.parallel.sharding import (
        ShardedInterGopEncoder)
    from aom_av1_lavish_tpu.encoder.tpu_inter import (
        TpuInterFrameEncoder, make_inter_frame_header)

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("frame",))
    W, H, N = 64, 48, 5
    rng = np.random.default_rng(8)
    yy, xx = np.mgrid[0:H + 16, 0:W + 16]
    base = (128 + 60 * np.sin(yy / 7.0) * np.cos(xx / 9.0)
            + rng.normal(0, 3, yy.shape)).clip(0, 255).astype(np.uint8)
    frames = [(np.ascontiguousarray(base[i:i + H, 2 * i:2 * i + W]),
               np.full((H // 2, W // 2), 120, np.uint8),
               np.full((H // 2, W // 2), 133, np.uint8))
              for i in range(N)]

    enc = ShardedInterGopEncoder(W, H, mesh, qindex=80)
    sharded = enc.encode_frames(frames)
    assert len(sharded) == N

    # serial reference: same anchor, each P frame device-encoded alone
    anchor_payload, anchor_rec = enc._encode_anchor(frames[0])
    assert anchor_payload == sharded[0]
    slots = [anchor_rec] + [None] * 7
    for i, f in enumerate(frames[1:]):
        fh = make_inter_frame_header(enc.sh, 80, refresh_frame_flags=0)
        se = TpuInterFrameEncoder(enc.sh, fh, slots)
        obu = se.encode_frame_obu(f)
        assert HH.temporal_delimiter() + obu == sharded[1 + i], \
            f"P frame {i} differs from serial encode"

    # and the stream must decode
    from aom_av1_lavish_tpu.decoder.decoder import decode_frame_obus
    sh = None
    state = {"slots": [None] * 8}
    shown = []
    for p in sharded:
        fr, sh = decode_frame_obus(p, sh, state)
        shown.extend(fr)
    assert len(shown) == N


def test_fpmt_real_gop_sharded_byte_identical():
    """FPMT on the REAL GopEncoder: GF-group P frames referencing only
    the fixed (anchor, ARF) pair shard over a 'frame' mesh and must be
    byte-identical to the single-device run (frame_parallel_enc_test.cc
    / fpmt_unit_test_cfg contract, av1/encoder/encoder.h:2607)."""
    import jax
    from jax.sharding import Mesh
    from aom_av1_lavish_tpu.encoder.gop import GopEncoder

    n = min(4, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n]), ("frame",))
    W2, H2 = 96, 64
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:H2 + 32, 0:W2 + 32]
    base = (128 + 60 * np.sin(yy / 9.0) * np.cos(xx / 13.0)
            + rng.normal(0, 2, yy.shape)).clip(0, 255).astype(np.uint8)
    frames = [(np.ascontiguousarray(base[i:i + H2, 2 * i:2 * i + W2]),
               np.ascontiguousarray(base[:H2 // 2, i:i + W2 // 2]),
               np.ascontiguousarray(base[1:1 + H2 // 2, i:i + W2 // 2]))
              for i in range(n + 2)]
    streams = []
    for mesh_arg in (mesh, None):
        enc = GopEncoder(W2, H2, qindex=80, gf_length=len(frames) - 1,
                         use_tpu=True, enable_cdef=False,
                         frame_parallel=True, mesh=mesh_arg)
        streams.append(b"".join(enc.encode_sequence(frames)))
    assert streams[0] == streams[1]

    from aom_av1_lavish_tpu.decoder.decoder import decode_frame_obus
    sh = None
    state = {"slots": [None] * 8}
    shown = []
    enc = GopEncoder(W2, H2, qindex=80, gf_length=len(frames) - 1,
                     use_tpu=True, enable_cdef=False,
                     frame_parallel=True, mesh=mesh)
    for p in enc.encode_sequence(frames):
        fr, sh = decode_frame_obus(p, sh, state)
        shown.extend(fr)
    assert len(shown) == len(frames)
