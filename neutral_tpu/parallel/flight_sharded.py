"""Multi-device free-flight engine: replicated mesh, sharded particles.

The flight engine (flight.py + raster.py) is embarrassingly parallel over
particles in the replicated-mesh mode: every shard traces its own lanes'
flight pieces against the same analytic rect geometry, buffers its own
flush entries and rasterizer segments, drains into its own private tally
row and full-domain raster buffer, and the partials sum at validation
time — the same zero-collective hot loop as ShardedSimulation's stepping
path (reference analog: per-rank transport + final MPI_Allreduce,
omp3/neutral.c:530).

Per-shard buffer capacities scale down with the shard count; the drain
budget gates are per shard, and a chunk round ends when ANY shard runs
out of buffer (pmax'd), keeping the SPMD program uniform.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..flight import flight_chunk_impl
from ..particles import ParticleState
from ..raster import raster_drain_impl, rasterize_xla
from ..transport import EventCounts, Geometry
from ..xs import CrossSection
from .sharding import _state_spec


@partial(jax.jit,
         static_argnames=("geom", "inv_ntotal", "mesh_axes", "max_sweeps",
                          "tile", "pair_cap"),
         donate_argnums=(0, 1, 2, 3))
def flight_chunk_sharded(state: ParticleState, fbuf_cell, fbuf_val,
                         segbuf, scatter_tab: CrossSection,
                         absorb_tab: CrossSection, geom: Geometry,
                         master_key, inv_ntotal: float, mesh_axes: Mesh,
                         max_sweeps: int, tile: int = 128,
                         pair_cap: int = 1 << 20):
    """One flight chunk per shard (single dispatch over the mesh).

    Buffers are sharded rows: fbuf_* (nshards*FCAP,), segbuf
    (nshards*SCAP, 8).  Returns (state, fbufs, segbuf, c_rows,
    fcnt_rows, scnt_rows, nsweeps_max, any_live_global).
    """
    axis = mesh_axes.axis_names[0]
    pspec = _state_spec(axis)

    def shard_fn(s, fc, fv, sb):
        z = jnp.zeros((), jnp.int32)
        (s, c, fc, fv, sb, fcnt, scnt, spairs, done,
         live) = flight_chunk_impl(
            s, EventCounts.zeros(), scatter_tab, fc, fv, sb, z, z, z,
            absorb_tab, geom, master_key, inv_ntotal, max_sweeps,
            tile=tile, pair_cap=pair_cap)
        live = lax.pmax(live.astype(jnp.int32), axis)
        done = lax.pmax(done, axis)
        c_row = jnp.stack([c.nfacets_hi, c.nfacets_lo,
                           c.ncollisions_hi, c.ncollisions_lo])[None, :]
        return (s, fc, fv, sb, c_row, fcnt[None], scnt[None], done, live)

    fn = shard_map(
        shard_fn, mesh=mesh_axes,
        in_specs=(pspec, P(axis), P(axis), P(axis, None)),
        out_specs=(pspec, P(axis), P(axis), P(axis, None), P(axis, None),
                   P(axis), P(axis), P(), P()),
        check_vma=False)
    return fn(state, fbuf_cell, fbuf_val, segbuf)


@partial(jax.jit, static_argnames=("mesh_axes",), donate_argnums=(0,))
def drain_flushes_sharded(tally_parts, fbuf_cell, fbuf_val, fcnt_rows,
                          mesh_axes: Mesh):
    """Scatter each shard's buffered flush entries into its tally row.

    Works on 1D and 2D device meshes (the leading dim of every operand is
    sharded jointly over all mesh axes) — the spatial decompositions'
    flight path shares this drain with the replicated-mesh path.
    """
    axis = mesh_axes.axis_names
    axis = axis[0] if len(axis) == 1 else axis

    def shard_fn(t_row, fc, fv, cnt):
        t = t_row[0]
        valid = jnp.arange(fc.shape[0]) < cnt[0]
        idx = jnp.where(valid, fc, t.shape[0])
        t = lax.cond(cnt[0] > 0,
                     lambda tt: tt.at[idx].add(fv.astype(tt.dtype),
                                               mode="drop"),
                     lambda tt: tt, t)
        return t[None, :]

    fn = shard_map(shard_fn, mesh=mesh_axes,
                   in_specs=(P(axis, None), P(axis), P(axis), P(axis)),
                   out_specs=P(axis, None), check_vma=False)
    return fn(tally_parts, fbuf_cell, fbuf_val, fcnt_rows)


@partial(jax.jit,
         static_argnames=("mesh_axes", "tile", "ntx", "nty", "pair_cap",
                          "nx", "ny", "use_pallas_raster", "interpret"),
         donate_argnums=(0,))
def raster_drain_sharded(rbufs, segbuf, scnt_rows, mesh_axes: Mesh, *,
                         tile: int, ntx: int, nty: int, pair_cap: int,
                         nx: int, ny: int, use_pallas_raster: bool,
                         interpret: bool = False):
    """Rasterize each shard's segment batch into its private buffer.

    rbufs: (nshards, nty*tile, ntx*tile) f32 on the Mosaic path, or
    (nshards, nx*ny) tally-dtype flats on the XLA DDA fallback (CPU).
    In spatial mode the buffers cover each shard's BLOCK (nx/ny/ntx/nty
    are block extents and segments are window-local).
    """
    axis = mesh_axes.axis_names
    axis = axis[0] if len(axis) == 1 else axis

    def shard_fn(rb, sb, cnt):
        if use_pallas_raster:
            out = raster_drain_impl(rb[0], sb, cnt[0], tile=tile, ntx=ntx,
                                    nty=nty, pair_cap=pair_cap,
                                    interpret=interpret)
        else:
            out = rasterize_xla(rb[0], sb, cnt[0], nx=nx, ny=ny,
                                max_steps=nx + ny + 2)
        return out[None]

    fn = shard_map(shard_fn, mesh=mesh_axes,
                   in_specs=(P(axis, None, None) if use_pallas_raster
                             else P(axis, None),
                             P(axis, None), P(axis)),
                   out_specs=(P(axis, None, None) if use_pallas_raster
                              else P(axis, None)),
                   check_vma=False)
    return fn(rbufs, segbuf, scnt_rows)


@partial(jax.jit,
         static_argnames=("mesh_axes", "nx", "ny", "use_pallas_raster"),
         donate_argnums=(0,))
def merge_raster_sharded(tally_parts, rbufs, mesh_axes: Mesh, *, nx: int,
                         ny: int, use_pallas_raster: bool):
    """Fold each shard's raster buffer into its private tally row."""
    axis = mesh_axes.axis_names
    axis = axis[0] if len(axis) == 1 else axis

    def shard_fn(t_row, rb):
        if use_pallas_raster:
            add = rb[0][:ny, :nx].reshape(-1)
        else:
            add = rb[0]
        return (t_row[0] + add.astype(t_row.dtype))[None, :]

    fn = shard_map(shard_fn, mesh=mesh_axes,
                   in_specs=(P(axis, None),
                             P(axis, None, None) if use_pallas_raster
                             else P(axis, None)),
                   out_specs=P(axis, None), check_vma=False)
    return fn(tally_parts, rbufs)
