"""Shared helpers for the multi-device drivers (leaf module, no cycles)."""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from ..particles import ParticleState


def _state_spec(axis) -> ParticleState:
    """PartitionSpec pytree: every particle array sharded along the axis.

    `axis` may be a single mesh-axis name or a tuple (2D decompositions
    shard the lane dimension jointly over both axes).
    """
    nfields = len(ParticleState.__dataclass_fields__)
    return ParticleState(*([P(axis)] * nfields))


def combine_count_rows(c_rows) -> tuple[int, int]:
    """(nshards, 4) u32 [hi_f, lo_f, hi_c, lo_c] rows -> (nfacets, ncoll).

    In multi-process runs the row array spans non-addressable shards;
    process_allgather rebuilds the global (tiny) array on every host.
    """
    import numpy as np
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        c_rows = multihost_utils.process_allgather(c_rows, tiled=True)
    a = np.asarray(c_rows, dtype=np.uint64)
    nf = int((a[:, 0] << np.uint64(32) | a[:, 1]).sum())
    nc = int((a[:, 2] << np.uint64(32) | a[:, 3]).sum())
    return nf, nc
