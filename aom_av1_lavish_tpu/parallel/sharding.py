"""Multi-chip sharding for the encoder (jax.sharding over a device Mesh).

TPU-native mapping of the reference's parallelism (SURVEY §2.7):
  * tile-parallel  → 'tile' mesh axis: frame columns are AV1 tiles; tiles
    are fully independent in AV1 (prediction + entropy state reset), so the
    analyze step shards with NO halo communication — the cross-chip traffic
    is only the final stats/bitstream gather.
  * frame-parallel (FPMT, ethread.c:1224) → 'frame' mesh axis: a batch of
    frames (e.g. a GOP's non-dependent layer) encodes concurrently.
Reductions (bit estimates for rate control) ride psum over both axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.lossless import lossless_plane_analyze


def make_mesh(n_frame: int, n_tile: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_frame * n_tile
    arr = np.array(devices[:n_frame * n_tile]).reshape(n_frame, n_tile)
    return Mesh(arr, ("frame", "tile"))


def batched_analyze_step(y_batch):
    """Analyze a batch of luma planes: (B, H, W) uint8 -> qcoeff + a global
    bit-cost proxy (psum-style reduction across the mesh)."""
    q, zero = jax.vmap(lossless_plane_analyze)(y_batch)
    # rate proxy: total nonzero coefficient magnitude (drives RC later);
    # float32 — int64 is emulated on TPU and int32 can overflow here
    bits_proxy = jnp.sum(jnp.abs(q).astype(jnp.float32))
    return q, zero, bits_proxy


def make_sharded_analyze(mesh: Mesh):
    """jit the batched analyze with frame-batch and tile (width) sharding.

    Width sharding corresponds to AV1 tile columns: each 'tile' device
    analyzes its columns independently; XLA inserts the cross-device
    reduction for the rate proxy.
    """
    in_shard = NamedSharding(mesh, P("frame", None, "tile"))
    out_shard = (NamedSharding(mesh, P("frame", None, "tile", None)),
                 NamedSharding(mesh, P("frame", None, "tile")),
                 NamedSharding(mesh, P()))
    return jax.jit(batched_analyze_step, in_shardings=(in_shard,),
                   out_shardings=out_shard)
