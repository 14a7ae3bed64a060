"""Multi-device free-flight engine: one step path for every decomposition.

The flight engine (flight.py + raster.py + pallas_flight.py) runs under
every multi-device driver through ONE shared step implementation
(FlightDecomposedMixin) — the reference's uniform kernel interface
(neutral_interface.h:11-36) generalized to decompositions:

  * replicated mesh (ShardedSimulation): every shard traces its lanes
    against the whole-domain rect geometry, rasterizes into a private
    full-domain buffer, partials sum at validation — zero collectives,
    like per-rank transport + final MPI_Allreduce (omp3/neutral.c:530);
  * spatial slabs/blocks (SpatialSimulation/Spatial2DSimulation): the
    windowed flight_core clamps rect walls to each shard's block,
    rasters are block-sized (per-chip tally memory scales), and frozen
    out-of-window lanes migrate at chunk boundaries with the stepping
    engine's flow control.

On TPU the per-shard program is the fused Mosaic kernel with persistent
VMEM rings (pallas_flight.py); elsewhere the XLA flight loop.  Per-shard
buffer capacities scale down with the shard count; drain budget gates
are per shard.
"""

from __future__ import annotations

import time as _time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..flight import flight_chunk_impl
from ..raster import raster_drain_impl, rasterize_xla
from ..transport import EventCounts
from .common import _state_spec

# Control-vector pack/read shared by every decomposed chunk loop
# (one replicated fetch per chunk): parallel/common.py.
from .common import (_CTRL_HEAD, _CTRL_MAXLIVE,  # noqa: F401 (re-export)
                     _pack_ctrl, _read_ctrl)


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
                          "nx", "ny", "use_pallas_raster", "use_walker",
                          "interpret"),
         donate_argnums=(0,))
def raster_drain_sharded(rbufs, segbuf, scnt_rows, mesh_axes: Mesh, *,
                         tile: int, ntx: int, nty: int, pair_cap: int,
                         nx: int, ny: int, use_pallas_raster: bool,
                         use_walker: bool = False,
                         interpret: bool = False):
    """Rasterize each shard's segment batch into its private buffer.

    rbufs: (nshards, nty*tile, ntx*tile) f32 on the Mosaic paths
    (use_walker selects the VMEM-resident segment walker over the
    sorted-pair pipeline), or (nshards, nx*ny) tally-dtype flats on the
    XLA DDA fallback (CPU).  In spatial mode the buffers cover each
    shard's BLOCK (nx/ny/ntx/nty are block extents and segments are
    window-local).
    """
    from ..raster import band_rows, rasterize_walk_impl

    axis = mesh_axes.axis_names
    axis = axis[0] if len(axis) == 1 else axis
    _b = band_rows(ntx, nty) if use_walker else nty
    _band = None if _b >= nty else _b

    def shard_fn(rb, sb, cnt):
        if use_walker:
            out = rasterize_walk_impl(rb[0], sb, cnt[0], tile=tile,
                                      ntx=ntx, nty=nty,
                                      interpret=interpret, band_nty=_band)
        elif use_pallas_raster:
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


class FlightDecomposedMixin:
    """Shared flight-engine step for every multi-device driver.

    Subclasses supply the decomposition through four hooks:
      _axes_names()    mesh axis name(s) ("p", or ("py", "px")),
      _dyn_offsets()   traced window origin inside a shard_map body
                       ((None, None) = replicated whole-domain view),
      _migrate_shard() the migration round(s) (no-op when replicated),
      _flight_begin()  per-step reinit -> (state, nprocessed).
    Everything else — the XLA and fused-Mosaic chunk programs, drain
    structure, raster tiers, overflow recovery — is identical across
    decompositions, so it lives here once.
    """

    # -- default hooks: replicated mesh, no migration --------------------
    def _axes_names(self):
        return self.axis

    def _dyn_offsets(self):
        return None, None

    def _migrate_shard(self, s, x_off, y_off, gate=None):
        return s, jnp.zeros((), jnp.int32)

    def _flight_begin(self, mk):
        raise NotImplementedError

    # --------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self",),
             donate_argnums=(1, 2, 3, 4))
    def _flight_chunk(self, state, fcell, fval, segbuf, mk):
        """One (windowed) XLA flight chunk + migration round per shard.

        Buffers are sharded rows refilled from scratch each chunk (their
        counts return for the host-side drains).  Returns (state, fcell,
        fval, segbuf, fcnt_rows, scnt_rows, ctrl) where ctrl is the
        replicated uint32 control vector (see _pack_ctrl) — ONE host
        round-trip per chunk covers every loop decision.
        """
        from ..raster import TILE

        axes = self._axes_names()
        spec = _state_spec(axes)
        nshards = self.nshards
        PCAP = max(self.flight_pair_cap // nshards, 65536)
        geom = self.geom

        def shard_fn(s, fc, fv, sb):
            x_off, y_off = self._dyn_offsets()
            z = jnp.zeros((), jnp.int32)
            (s, c, fc, fv, sb, fcnt, scnt, spairs, done,
             _w) = flight_chunk_impl(
                s, EventCounts.zeros(), self.cs_scatter, fc, fv, sb,
                z, z, z, self.cs_absorb, geom, mk,
                1.0 / self.cfg.nparticles, self.chunk_sweeps,
                tile=TILE, pair_cap=PCAP, x_off=x_off, y_off=y_off)
            s, moved = self._migrate_shard(s, x_off, y_off)
            live = (~s.dead) & (s.dt_to_census > 0)
            inwin = live
            if x_off is not None:
                lx = s.cellx - x_off
                inwin = inwin & (lx >= 0) & (lx < geom.nx)
            if y_off is not None:
                ly = s.celly - y_off
                inwin = inwin & (ly >= 0) & (ly < geom.ny)
            pending = jnp.count_nonzero(live & (~inwin))
            work = lax.psum(jnp.count_nonzero(inwin).astype(jnp.uint32)
                            + pending.astype(jnp.uint32), axes)
            pending_g = lax.psum(pending.astype(jnp.int32), axes)
            moved_g = lax.psum(moved, axes)
            err = ((pending_g > 0) & (moved_g == 0)).astype(jnp.int32)
            ctrl = _pack_ctrl(axes, c, done=lax.pmax(done, axes),
                              work=work, err=err,
                              scnt_max=lax.pmax(scnt, axes),
                              maxlive=jnp.count_nonzero(live))
            return s, fc, fv, sb, fcnt[None], scnt[None], ctrl

        fn = shard_map(
            shard_fn, mesh=self.device_mesh,
            in_specs=(spec, P(axes), P(axes), P(axes, None)),
            out_specs=(spec, P(axes), P(axes), P(axes, None),
                       P(axes), P(axes), P()),
            check_vma=False)
        return fn(state, fcell, fval, segbuf)

    def _fresh_flight_rings(self, total=None, ring_slots: int = 8,
                            s_slots: int = 8):
        """Empty fused-path rings sharded alongside the lane slabs."""
        from ..pallas_flight import make_seg_ring
        from ..pallas_sweep import make_rings
        if total is None:
            total = self.state.x.shape[0]
        axes = self._axes_names()
        colspec = NamedSharding(self.device_mesh, P(None, axes))
        lane = NamedSharding(self.device_mesh, P(axes))
        fc, fv, fnr = make_rings(total, self.tally_parts.dtype,
                                 ring_slots=ring_slots)
        # 8 segment slots match the single-device walker path: deeper
        # rings amortize ring-pressure chunk exits on streaming decks.
        sfields, sn = make_seg_ring(total, self.dtype, s_slots=s_slots)
        return (jax.device_put(fc, colspec), jax.device_put(fv, colspec),
                jax.device_put(fnr, lane),
                tuple(jax.device_put(sf, colspec) for sf in sfields),
                jax.device_put(sn, lane))

    @partial(jax.jit, static_argnames=("self",),
             donate_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
    def _flight_chunk_fused(self, state, tally_parts, fc, fv, fn,
                            sfields, sn, segbuf, rbufs, mk):
        """Fused-Mosaic (windowed) flight chunk + migration (TPU path).

        Per-lane flush/segment rings persist across chunks (sharded
        alongside the lanes); each chunk ends with a forced ring drain —
        flushes scatter into the shard's tally row, segments go straight
        from the ring planes into the shard's BLOCK raster buffer via
        the VMEM-resident walker (rasterize_walk_rings_impl), or extract
        into the flat buffer for host-side rasterization when the block
        exceeds VMEM — then a migration round.  Ring entries are
        anonymous (they carry shard-local cell coordinates), so a husk's
        pending entries stay valid wherever the lane itself travels.
        Returns (state, tally_parts, fc, fv, fn, sfields, sn, segbuf,
        rbufs, sbase_rows, ctrl) with ctrl the replicated uint32
        control vector (_pack_ctrl) — one host round-trip per chunk.
        """
        from ..pallas_flight import (_extract_segments,
                                     pallas_flight_chunk_impl)
        from ..pallas_sweep import _drain_rings
        from ..raster import TILE, band_rows, grid_shape, walker_fits

        axes = self._axes_names()
        spec = _state_spec(axes)
        nshards = self.nshards
        _nty, _ntx = grid_shape(self.geom.nx, self.geom.ny, TILE)
        walker = walker_fits(_ntx, _nty)
        _bnty = band_rows(_ntx, _nty)
        band_nty = None if _bnty >= _nty else _bnty
        PCAP = ((1 << 30) if walker
                else max(self.flight_pair_cap // nshards, 65536))
        geom = self.geom
        per_shard = state.x.shape[0] // nshards
        big = per_shard > 262144
        max_calls = (getattr(self, "flight_max_calls", None)
                     or (32 if big else 128))
        k_pieces = (getattr(self, "flight_k_pieces", None)
                    or (8 if big else 16))
        interpret = getattr(self, "flight_fused_interpret", False)
        inv_tile = np.float32(1.0 / TILE)
        s_slots = sfields[0].shape[0]
        # Opt-in (set BEFORE the first step — `self` is a static jit key,
        # so later attr flips don't retrace): run the single-device
        # design in each shard — in-loop walker drains + piece-plane
        # rings.  Default off: embedding the walker in this program
        # measurably slowed the flight kernel in an earlier round
        # (shared program VMEM budget) — re-measure per hardware.
        in_loop = walker and getattr(self, "flight_sharded_inloop", False)
        if in_loop:
            k_pieces = min(k_pieces, s_slots)  # seg_plane: k <= s_slots

        def shard_fn(s, t_row, fcr, fvr, fnr, sf, snn, sb, rb):
            x_off, y_off = self._dyn_offsets()
            z = jnp.zeros((), jnp.int32)
            (s, t, c, fcr, fvr, fnr, sf, snn, sb, sbase, spairs, rb_out,
             done, _w, _npend) = pallas_flight_chunk_impl(
                s, t_row[0], EventCounts.zeros(), fcr, fvr, fnr, sf, snn,
                sb, z, z, self.cs_scatter, self.cs_absorb, geom, mk,
                1.0 / self.cfg.nparticles, max_calls, k_pieces=k_pieces,
                tile=TILE, pair_cap=PCAP, interpret=interpret,
                x_off=x_off, y_off=y_off, use_ring_walker=walker,
                rbuf=rb[0] if in_loop else None, ntx=_ntx, nty=_nty,
                seg_plane=in_loop,
                scatter_layout=self.scatter_layout,
                absorb_layout=self.absorb_layout, band_nty=band_nty)
            if in_loop:
                # Rings drained in-loop: rbuf carries the deposits and
                # ringwork below is identically 0 (no _walker_drain).
                rb = rb_out[None]
            # Forced end-of-chunk drain: without it a shard whose lanes
            # all finished would never empty its rings (the in-chunk
            # drain cadence is pause-pressure driven).
            t, fcr, fvr, fnr = lax.cond(
                jnp.any(fnr > 0),
                lambda op: _drain_rings(*op), lambda op: op,
                (t, fcr, fvr, fnr))

            if not walker:
                def ext(op):
                    sf, snn, sb, base, sp = op
                    sb, base, sp, (sf, snn), _left = _extract_segments(
                        sf, snn, sb, base, sp, inv_tile, PCAP)
                    return sf, snn, sb, base, sp

                nonempty = jnp.sum(jnp.minimum(snn, s_slots),
                                   dtype=jnp.int32) > 0
                sf, snn, sb, sbase, spairs = lax.cond(
                    nonempty, ext, lambda op: op,
                    (sf, snn, sb, sbase, spairs))
            # Walker mode: segment rings stay PENDING through migration
            # (entries are anonymous and shard-local) and drain in a
            # separate dispatch (_walker_drain) — embedding the
            # VMEM-resident walker in this program measurably slowed the
            # flight kernel (shared program VMEM budget).
            s, moved = self._migrate_shard(s, x_off, y_off)
            live = (~s.dead) & (s.dt_to_census > 0)
            inwin = live
            if x_off is not None:
                lx = s.cellx - x_off
                inwin = inwin & (lx >= 0) & (lx < geom.nx)
            if y_off is not None:
                ly = s.celly - y_off
                inwin = inwin & (ly >= 0) & (ly < geom.ny)
            pending = jnp.count_nonzero(live & (~inwin))
            # Budget-vetoed ring backlog counts as work: the host
            # rasterizes and the next chunk's fresh budget drains it.
            ringwork = jnp.count_nonzero(snn > 0)
            work = lax.psum((jnp.count_nonzero(inwin) + pending
                             + ringwork).astype(jnp.uint32), axes)
            pending_g = lax.psum(pending.astype(jnp.int32), axes)
            moved_g = lax.psum(moved, axes)
            err = ((pending_g > 0) & (moved_g == 0)).astype(jnp.int32)
            ringleft = lax.psum(ringwork.astype(jnp.int32), axes)
            ctrl = _pack_ctrl(axes, c, done=lax.pmax(done, axes),
                              work=work, err=err, ringleft=ringleft,
                              sp_max=lax.pmax(spairs, axes),
                              scnt_max=lax.pmax(sbase, axes),
                              maxlive=jnp.count_nonzero(live))
            return (s, t[None, :], fcr, fvr, fnr, sf, snn, sb, rb,
                    sbase[None], ctrl)

        ring_col = P(None, axes)
        rb_spec = P(axes, None, None)
        mapped = shard_map(
            shard_fn, mesh=self.device_mesh,
            in_specs=(spec, P(axes, None), ring_col, ring_col, P(axes),
                      (ring_col,) * 5, P(axes), P(axes, None), rb_spec),
            out_specs=(spec, P(axes, None), ring_col, ring_col, P(axes),
                       (ring_col,) * 5, P(axes), P(axes, None), rb_spec,
                       P(axes), P()),
            check_vma=False)
        return mapped(state, tally_parts, fc, fv, fn, sfields, sn, segbuf,
                      rbufs)

    @partial(jax.jit, static_argnames=("self", "target", "ring_slots",
                                       "s_slots"),
             donate_argnums=(1, 2, 3))
    def _compact_flight_sharded(self, full, part, sel, *, target: int,
                                ring_slots: int = 32, s_slots: int = 8):
        """Fused flight-ladder compaction: merge + arrival-safe reselect
        + fresh flush AND segment rings per shard, one dispatch (the
        unfused sequence paid per-dispatch submission cost plus
        host-allocated device_put ring transfers).  Caller must ensure
        rings are globally empty (ringleft == 0 — the fused chunk
        force-drains flushes and the walker drain empties segments).
        Returns (full', part'@target, sel', fc, fv, fn, sfields, sn).
        """
        from ..pallas_flight import make_seg_ring
        from ..pallas_sweep import make_rings
        from ..particles import merge_compacted, select_working_padded

        axes = self._axes_names()
        pspec = _state_spec(axes)
        tdt = self.tally_parts.dtype
        has_sel = sel is not None

        def shard_fn(f, p, se):
            if has_sel:
                f = merge_compacted(f, p, se)
            p2, se2 = select_working_padded(f, target)
            fc, fv, fn = make_rings(target, tdt, ring_slots)
            sf, sn = make_seg_ring(target, p2.x.dtype, s_slots)
            return f, p2, se2, fc, fv, fn, sf, sn

        ring_col = P(None, axes)
        fn2 = shard_map(
            shard_fn, mesh=self.device_mesh,
            in_specs=(pspec, pspec if has_sel else None,
                      P(axes) if has_sel else None),
            out_specs=(pspec, pspec, P(axes), ring_col, ring_col,
                       P(axes), (ring_col,) * 5, P(axes)),
            check_vma=False)
        return fn2(full, part, sel)

    @partial(jax.jit, static_argnames=("self",),
             donate_argnums=(1, 2, 3))
    def _walker_drain(self, rbufs, sfields, sn):
        """Drain every shard's segment rings into its block raster buffer
        via the VMEM-resident walker (separate dispatch — see
        _flight_chunk_fused).  Returns (rbufs, sfields, sn) with the
        rings emptied."""
        from ..raster import (TILE, band_rows, grid_shape,
                              rasterize_walk_rings_impl)

        axes = self._axes_names()
        _nty, _ntx = grid_shape(self.geom.nx, self.geom.ny, TILE)
        _b = band_rows(_ntx, _nty)
        _band = None if _b >= _nty else _b
        interpret = getattr(self, "flight_fused_interpret", False)

        def shard_fn(rb, sf, snn):
            rb0, (sf, snn) = rasterize_walk_rings_impl(
                rb[0], sf, snn, tile=TILE, ntx=_ntx, nty=_nty,
                interpret=interpret, band_nty=_band)
            return rb0[None], sf, snn

        ring_col = P(None, axes)
        fn = shard_map(
            shard_fn, mesh=self.device_mesh,
            in_specs=(P(axes, None, None), (ring_col,) * 5, P(axes)),
            out_specs=(P(axes, None, None), (ring_col,) * 5, P(axes)),
            check_vma=False)
        return fn(rbufs, sfields, sn)

    def _step_flight_decomposed(self, tt: int):
        """Flight-engine census step over the device mesh.

        Replicated mode: full-domain rasters, no migration.  Spatial
        modes: every shard traces pieces only inside its own window and
        rasterizes into a BLOCK-sized buffer — the per-chip tally memory
        actually scales; migration runs at chunk boundaries with the
        stepping engine's flow control and capacity recovery.
        """
        from ..raster import TILE, grid_shape

        cfg = self.cfg
        self.profile.start()
        mk = jnp.uint32(tt)
        self.state, nprocessed = self._flight_begin(mk)
        nshards = self.nshards
        axes = self._axes_names()
        bx, by = self.geom.nx, self.geom.ny      # shard block extent
        nty, ntx = grid_shape(bx, by, TILE)
        from ..raster import walker_fits
        use_fused = ((jax.default_backend() == "tpu"
                      and self.dtype == jnp.dtype(jnp.float32))
                     or getattr(self, "flight_fused_interpret", False))
        use_pallas_raster = (jax.default_backend() == "tpu"
                             or getattr(self, "flight_fused_interpret",
                                        False))
        use_walker = use_pallas_raster and walker_fits(ntx, nty)
        FCAP = max(self.flight_flush_cap // nshards, 8192)
        SCAP = max(self.flight_seg_cap // nshards, 4096)
        PCAP = max(self.flight_pair_cap // nshards, 65536)
        TIERS = [c for c in (1 << 18, 1 << 20) if c < PCAP] + [PCAP]
        tdt = self.tally_parts.dtype
        col = NamedSharding(self.device_mesh, P(axes))
        row = NamedSharding(self.device_mesh, P(axes, None))
        segbuf = jax.device_put(
            jnp.zeros((nshards * SCAP, 8), self.dtype), row)
        if use_fused:
            fcell = fval = None
            rings = self._fresh_flight_rings()
        else:
            fcell = jax.device_put(jnp.zeros(nshards * FCAP, jnp.int32),
                                   col)
            fval = jax.device_put(jnp.zeros(nshards * FCAP, tdt), col)
        if use_pallas_raster:
            rbufs = jax.device_put(
                jnp.zeros((nshards, nty * TILE, ntx * TILE), jnp.float32),
                NamedSharding(self.device_mesh, P(axes, None, None)))
        else:
            rbufs = jax.device_put(jnp.zeros((nshards, bx * by), tdt), row)
        nf = nc = nsweeps = 0
        grows = 0
        interp = getattr(self, "flight_fused_interpret", False)
        phases = {"sweep": 0.0, "drain": 0.0, "compact": 0.0}
        # Per-shard live-lane compaction ladder (same machinery as the
        # stepping spatial path): late-census tails run at small static
        # widths instead of full shard capacity.  Reorder-safe because
        # the fused chunk force-drains the flush rings every chunk and
        # the walker drain empties the segment rings whenever ringleft>0,
        # so rings are globally empty at every loop-bottom with
        # ringleft == 0; non-fused chunks refill their buffers from
        # scratch each round.
        from .sharding import (merge_compacted_sharded,
                               select_working_padded_sharded)
        part, sel = self.state, None
        full = part
        min_cap = self.compact_min
        while True:
            t0 = _time.perf_counter()
            if use_fused:
                fc, fv, fnr, sfields, sn = rings
                (part, self.tally_parts, fc, fv, fnr, sfields, sn,
                 segbuf, rbufs, scnt_rows,
                 ctrl_dev) = self._flight_chunk_fused(
                    part, self.tally_parts, fc, fv, fnr, sfields,
                    sn, segbuf, rbufs, mk)
                rings = (fc, fv, fnr, sfields, sn)
            else:
                (part, fcell, fval, segbuf, fcnt_rows,
                 scnt_rows, ctrl_dev) = self._flight_chunk(
                    part, fcell, fval, segbuf, mk)
            head, dnf, dnc = _read_ctrl(ctrl_dev)
            done, work, err, ringleft = head[:4]
            sp_max, maxlive, scnt_max = head[4:7]
            if use_fused and use_walker and ringleft > 0:
                # Ring-direct drain in its own dispatch (see
                # _flight_chunk_fused): segments go straight from
                # the ring planes to the block raster buffers.
                rbufs, sfields, sn = self._walker_drain(
                    rbufs, sfields, sn)
                rings = (fc, fv, fnr, sfields, sn)
                ringleft = 0
            if sel is None:
                full = part
            nf += dnf
            nc += dnc
            nsweeps += done
            t1 = _time.perf_counter()
            if not use_fused:
                self.tally_parts = drain_flushes_sharded(
                    self.tally_parts, fcell, fval, fcnt_rows,
                    self.device_mesh)
            if scnt_max > 0:
                pcap = (next(c for c in TIERS if sp_max <= c)
                        if use_fused and not use_walker else PCAP)
                rbufs = raster_drain_sharded(
                    rbufs, segbuf, scnt_rows, self.device_mesh, tile=TILE,
                    ntx=ntx, nty=nty, pair_cap=pcap, nx=bx, ny=by,
                    use_pallas_raster=use_pallas_raster,
                    use_walker=use_walker, interpret=interp)
            phases["sweep"] += t1 - t0
            phases["drain"] += _time.perf_counter() - t1
            if err and ringleft == 0:
                # Repartition only with globally empty rings (the chunk
                # force-drains them; a budget-vetoed backlog keeps
                # ringleft > 0 and clears within a round or two) — a
                # lane reorder must never discard pending ring entries.
                grows += 1
                if grows > 6:
                    raise RuntimeError(
                        "particle migration overflow persists after "
                        f"{grows - 1} capacity doublings — aborting")
                self._print(f"migration overflow: growing shard capacity "
                            f"{self.cap} -> {2 * self.cap}, "
                            "repartitioning")
                if sel is not None:
                    full = merge_compacted_sharded(full, part, sel,
                                                   self.device_mesh)
                self.state = full
                self._repartition(2 * self.cap)
                part, sel = self.state, None
                full = part
                if use_fused:
                    rings = self._fresh_flight_rings()
                continue
            if work == 0:
                break
            per_shard_w = part.x.shape[0] // nshards
            if (self.compact_enabled and per_shard_w > min_cap
                    and ringleft == 0):
                t2 = _time.perf_counter()
                # maxlive rode the chunk's control vector — the ladder
                # costs no extra dispatch or host round-trip.
                # 2x headroom over the worst shard keeps migration's
                # free-slot supply healthy while compacted.
                target = max(min_cap,
                             2 << (max(maxlive, 1) - 1).bit_length())
                if target <= per_shard_w // 2:
                    if use_fused:
                        # Fused merge + reselect + fresh rings (deeper
                        # 32-slot flush rings at tail widths amortize
                        # the chunk exits over more pieces).
                        (full, part, sel, fc, fv, fnr, sfields,
                         sn) = self._compact_flight_sharded(
                            full, part if sel is not None else None,
                            sel, target=target, ring_slots=32)
                        rings = (fc, fv, fnr, sfields, sn)
                    else:
                        if sel is not None:
                            full = merge_compacted_sharded(
                                full, part, sel, self.device_mesh)
                        else:
                            full = part
                        part, sel = select_working_padded_sharded(
                            full, target, self.device_mesh)
                phases["compact"] += _time.perf_counter() - t2
        if sel is not None:
            full = merge_compacted_sharded(full, part, sel,
                                           self.device_mesh)
        else:
            full = part
        self.state = full
        self.tally_parts = merge_raster_sharded(
            self.tally_parts, rbufs, self.device_mesh, nx=bx, ny=by,
            use_pallas_raster=use_pallas_raster)
        jax.block_until_ready(self.tally_parts)
        step_time = self.profile.stop(f"step{tt}")
        from .. import driver as driver_mod
        m = driver_mod.StepMetrics(
            step=tt, step_time=step_time, nfacets=nf, ncollisions=nc,
            nprocessed=int(nprocessed), nsweeps=nsweeps, phases=phases)
        self.step_metrics.append(m)
        return m
