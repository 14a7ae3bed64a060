"""Shared helpers for the multi-device drivers (leaf module, no cycles)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..particles import ParticleState

# Control-vector layout returned by the decomposed chunk programs: 8
# uint32 head slots followed by every shard's 64-bit event-count halves
# [hi_f, lo_f, hi_c, lo_c] (device all_gather — replicated, so ONE
# ~33 ms axon-tunnel round-trip per chunk reads every loop decision;
# separate int() pulls cost a round-trip EACH).
_CTRL_DONE, _CTRL_WORK, _CTRL_ERR, _CTRL_RINGLEFT = 0, 1, 2, 3
_CTRL_SPMAX, _CTRL_MAXLIVE, _CTRL_SCNTMAX, _CTRL_HEAD = 4, 5, 6, 8


def _pack_ctrl(axes, c, *, done, work, err, maxlive, scnt_max=None,
               sp_max=None, ringleft=None):
    """Replicated uint32 control vector (inside a shard_map body)."""
    u32 = jnp.uint32
    zero = jnp.zeros((), u32)

    def g(v):
        return zero if v is None else v.astype(u32)

    head = jnp.stack([g(done), g(work), g(err), g(ringleft), g(sp_max),
                      lax.pmax(maxlive.astype(jnp.int32), axes)
                         .astype(u32),
                      g(scnt_max), zero])
    cvec = jnp.stack([c.nfacets_hi, c.nfacets_lo,
                      c.ncollisions_hi, c.ncollisions_lo]).astype(u32)
    return jnp.concatenate([head, lax.all_gather(cvec, axes).reshape(-1)])


def _read_ctrl(ctrl_dev):
    """One host transfer -> (head ints, (nfacets, ncollisions) deltas)."""
    import numpy as np
    ctrl = np.asarray(ctrl_dev)
    crow = ctrl[_CTRL_HEAD:].astype(np.uint64).reshape(-1, 4)
    dnf = int((crow[:, 0] << np.uint64(32) | crow[:, 1]).sum())
    dnc = int((crow[:, 2] << np.uint64(32) | crow[:, 3]).sum())
    return [int(v) for v in ctrl[:_CTRL_HEAD]], dnf, dnc


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
