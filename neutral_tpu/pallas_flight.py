"""Pallas (Mosaic) fused multi-piece flight kernel.

The XLA flight loop (flight.flight_chunk) pays per-sweep dispatch and
full-width buffer-append scatters for every piece — fine for pure
streaming decks (a handful of pieces per lane) but dispatch-bound for
collision-heavy mixed decks (csp/split: hundreds of collisions per lane).
This kernel keeps a block of lanes VMEM-resident and advances it through
K flight pieces per grid step, exactly like pallas_sweep does for facet
events:

  * tally flushes (up to TWO per piece: first-cell exit + death/census,
    flight.flight_core) push into a per-lane pending ring — identical
    structure to pallas_sweep's rings, drained by the same
    pallas_sweep._drain_rings scatter;
  * rasterizer segments push into a 5-field per-lane segment ring,
    extracted into the flat segment buffer between kernel calls and
    rasterized by raster.raster_drain at chunk boundaries.

Lanes whose rings cannot take one more piece pause in place (in-kernel
gate, bitwise-frozen), so overflow is impossible by construction.
Physics comes from flight.flight_core — the same code the XLA path runs.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flight import flight_core, u64_sum_u32
from .particles import ParticleState
from .pallas_table import BandedTable, TableLayout, energy_band
from .transport import EventCounts, Geometry
from .xs import CrossSection
from . import rng

_ROWS = 64
_LANES = 128

_FIELDS = ("x", "y", "omega_x", "omega_y", "energy", "weight",
           "dt_to_census", "mfp_to_collision", "deposit", "cellx", "celly",
           "dead", "pid", "counter")
_NF = len(_FIELDS)
_SEGF = 5          # gx0, gy0, gx1, gy1, kk


def _block_rows(n: int) -> int:
    for rows in (_ROWS, 32, 8, 1):
        if n % (rows * _LANES) == 0:
            return rows
    raise ValueError(f"lane count {n} not a multiple of {_LANES}")


def _kernel(geom: Geometry, scatter_tab: CrossSection,
            absorb_tab: CrossSection, inv_ntotal: float, k_pieces: int,
            f_slots: int, s_slots: int, tally_dtype, windowed, seg_plane,
            table_mode: bool, mk_ref, *refs):
    if table_mode:
        # Arbitrary-table decks: band scalars + VMEM table tiles replace
        # the closed-form evaluation (pallas_table.py; same machinery as
        # pallas_sweep._kernel).
        band_ref = refs[0]
        ntab = 4 if geom.same_xs else 8
        tab_refs = refs[1:1 + ntab]
        refs = refs[1 + ntab:]
        scatter_tab = BandedTable(*tab_refs[:4], band_ref[0], band_ref[1])
        absorb_tab = (scatter_tab if geom.same_xs
                      else BandedTable(*tab_refs[4:8],
                                       band_ref[2], band_ref[3]))
    in_refs = refs[:_NF]
    fc_in, fv_in, fn_in = refs[_NF:_NF + 3]
    sring_in = refs[_NF + 3:_NF + 3 + _SEGF]
    sn_in = refs[_NF + 3 + _SEGF]
    o = _NF + 4 + _SEGF
    out_refs = refs[o:o + _NF]
    fc_out, fv_out, fn_out = refs[o + _NF:o + _NF + 3]
    sring_out = refs[o + _NF + 3:o + _NF + 3 + _SEGF]
    sn_out, nfac_ref, ncol_ref = refs[o + _NF + 3 + _SEGF:]

    vals = {f: r[:] for f, r in zip(_FIELDS, in_refs)}
    vals["dead"] = vals["dead"] != 0
    mk = mk_ref[0, 0]
    if windowed:
        # Spatial-decomposition window origin (flight_core clamps rect
        # walls to it and freezes out-of-window lanes bitwise).
        x_off = mk_ref[0, 1].astype(jnp.int32)
        y_off = mk_ref[0, 2].astype(jnp.int32)
    else:
        x_off = y_off = None

    # Block early-out: compaction front-packs working lanes, so trailing
    # blocks can be entirely dead/censused/out-of-window — they skip the
    # k-piece physics and copy through (see pallas_sweep._kernel).
    blk_w = (~vals["dead"]) & (vals["dt_to_census"] > 0)
    if windowed:
        lx = vals["cellx"] - x_off
        ly = vals["celly"] - y_off
        blk_w = blk_w & (lx >= 0) & (lx < geom.nx)
        blk_w = blk_w & (ly >= 0) & (ly < geom.ny)
    any_work = jnp.any(blk_w)

    @pl.when(jnp.logical_not(any_work))
    def _skip_block():
        for r_in, r in zip(in_refs, out_refs):
            r[:] = r_in[:]
        fc_out[:] = fc_in[:]
        fv_out[:] = fv_in[:]
        fn_out[:] = fn_in[:]
        for f in range(_SEGF):
            sring_out[f][:] = sring_in[f][:]
        sn_out[:] = sn_in[:]
        nfac_ref[:] = jnp.zeros(nfac_ref.shape, nfac_ref.dtype)
        ncol_ref[:] = jnp.zeros(ncol_ref.shape, ncol_ref.dtype)

    @pl.when(any_work)
    def _run_block():
        _kernel_body(geom, scatter_tab, absorb_tab, inv_ntotal, k_pieces,
                     f_slots, s_slots, tally_dtype, seg_plane, vals, mk,
                     x_off, y_off, fc_in, fv_in, fn_in, sring_in, sn_in,
                     out_refs, fc_out, fv_out, fn_out, sring_out, sn_out,
                     nfac_ref, ncol_ref)


def _kernel_body(geom, scatter_tab, absorb_tab, inv_ntotal, k_pieces,
                 f_slots, s_slots, tally_dtype, seg_plane, vals, mk,
                 x_off, y_off, fc_in, fv_in, fn_in, sring_in, sn_in,
                 out_refs, fc_out, fv_out, fn_out, sring_out, sn_out,
                 nfac_ref, ncol_ref):
    state = ParticleState(**vals)
    fc_rows = [fc_in[s] for s in range(f_slots)]
    fv_rows = [fv_in[s] for s in range(f_slots)]
    fslot = fn_in[:]
    sg_rows = [[sring_in[f][s] for s in range(s_slots)]
               for f in range(_SEGF)]
    sslot = sn_in[:]

    nfac = jnp.zeros(state.x.shape, jnp.uint32)
    ncol = jnp.zeros(state.x.shape, jnp.int32)
    for p in range(k_pieces):
        # A piece needs up to 2 flush slots and (count mode) 1 segment
        # slot; piece-plane segment rings always have room (plane p is
        # piece p's own), so only the flush ring gates.
        gate = fslot < f_slots - 1
        if not seg_plane:
            gate = gate & (sslot < s_slots)
        (state, f1, c1, v1, f2, c2, v2, emit, gx0, gy0, gx1, gy1, kk,
         nf_lane, is_coll) = flight_core(state, geom, scatter_tab,
                                         absorb_tab, mk, inv_ntotal,
                                         tally_dtype, gate=gate,
                                         x_off=x_off, y_off=y_off)
        # Zero-valued flushes (vacuum pieces: K = 0, deposit exactly
        # +0.0) skip the ring: on streaming decks they are nearly ALL
        # flushes — appending them fills the ring and forces full S x N
        # drain scatters for tally no-ops.
        f1 = f1 & (v1 != 0)
        f2 = f2 & (v2 != 0)
        for s in range(f_slots):
            hit = f1 & (fslot == s)
            fc_rows[s] = jnp.where(hit, c1, fc_rows[s])
            fv_rows[s] = jnp.where(hit, v1, fv_rows[s])
        fslot = fslot + f1.astype(jnp.int32)
        for s in range(f_slots):
            hit = f2 & (fslot == s)
            fc_rows[s] = jnp.where(hit, c2, fc_rows[s])
            fv_rows[s] = jnp.where(hit, v2, fv_rows[s])
        fslot = fslot + f2.astype(jnp.int32)
        seg_vals = (gx0, gy0, gx1, gy1, kk)
        if seg_plane:
            # Piece-plane append: piece p owns plane p outright — the
            # coords are stored unconditionally (kk == 0 is the walker's
            # skip sentinel, so stale coords are inert), replacing the
            # s_slots x 5 where-ladder with a single masked write.  The
            # caller MUST drain the rings after every kernel call (the
            # next call overwrites plane p).
            for f in range(_SEGF - 1):
                sg_rows[f][p] = seg_vals[f]
            sg_rows[_SEGF - 1][p] = jnp.where(
                emit, kk, jnp.zeros_like(kk))
        else:
            for s in range(s_slots):
                hit = emit & (sslot == s)
                for f in range(_SEGF):
                    sg_rows[f][s] = jnp.where(hit, seg_vals[f],
                                              sg_rows[f][s])
        sslot = sslot + emit.astype(jnp.int32)
        nfac = nfac + nf_lane
        ncol = ncol + is_coll.astype(jnp.int32)

    for f, r in zip(_FIELDS, out_refs):
        v = getattr(state, f)
        if f == "dead":
            v = v.astype(jnp.int32)
        r[:] = v
    for s in range(f_slots):
        fc_out[s] = fc_rows[s]
        fv_out[s] = fv_rows[s]
    fn_out[:] = fslot
    for f in range(_SEGF):
        for s in range(s_slots):
            sring_out[f][s] = sg_rows[f][s]
    sn_out[:] = sslot
    nfac_ref[:] = nfac
    ncol_ref[:] = ncol


def pallas_flight_multi(state: ParticleState, fring, sring,
                        scatter_tab: CrossSection,
                        absorb_tab: CrossSection, geom: Geometry,
                        master_key, inv_ntotal: float, tally_dtype_arr,
                        k_pieces: int = 8, interpret: bool = False,
                        x_off=None, y_off=None, seg_plane: bool = False,
                        scatter_layout: TableLayout | None = None,
                        absorb_layout: TableLayout | None = None, band=None):
    """Advance every lane through k_pieces flight pieces in one kernel.

    fring = (cells (Sf,N) i32, vals (Sf,N), count (N,) i32) — pending
    tally flushes, drained with pallas_sweep._drain_rings.
    sring = (5 x (Ss,N) f32 fields, count (N,) i32) — pending segments.
    `x_off`/`y_off` (traced int32 scalars) enable the spatial window
    (see flight_core) — shipped to the kernel through the SMEM scalar row.
    `seg_plane`: piece p writes segment plane p directly (no slot-count
    ladder; kk == 0 marks empty entries); requires k_pieces <= s_slots,
    rings empty on entry, and a drain after EVERY call.
    Returns (state', fring', sring', nfacets (hi,lo), ncollisions_u32).
    """
    if geom.rects is None or not geom.dx:
        raise ValueError("pallas flight requires fast_math rect geometry")
    table_mode = scatter_layout is not None
    if not table_mode and not (scatter_tab.analytic
                               and absorb_tab.analytic):
        raise ValueError("pallas flight requires analytic cross-sections "
                         "or a TableLayout (pallas_table.build_layout)")
    windowed = x_off is not None or y_off is not None
    n = state.x.shape[0]
    rows = _block_rows(n)
    grid = n // rows // _LANES
    tally_dtype = tally_dtype_arr.dtype
    fc, fv, fn = fring
    sfields, sn = sring
    f_slots = fc.shape[0]
    s_slots = sfields[0].shape[0]
    if seg_plane and k_pieces > s_slots:
        raise ValueError(f"seg_plane needs k_pieces ({k_pieces}) <= "
                         f"s_slots ({s_slots})")

    def shape2(a):
        return a.reshape(n // _LANES, _LANES)

    def shape3(a, s):
        return a.reshape(s, n // _LANES, _LANES)

    ins = []
    for f in _FIELDS:
        v = getattr(state, f)
        if f == "dead":
            v = v.astype(jnp.int32)
        ins.append(shape2(v))
    ins += [shape3(fc, f_slots), shape3(fv, f_slots), shape2(fn)]
    ins += [shape3(sf, s_slots) for sf in sfields]
    ins.append(shape2(sn))

    state_spec = pl.BlockSpec((rows, _LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    fring_spec = pl.BlockSpec((f_slots, rows, _LANES), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    sring_spec = pl.BlockSpec((s_slots, rows, _LANES), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)

    def dt_of(f):
        if f in ("cellx", "celly", "dead"):
            return jnp.int32
        if f in ("pid", "counter"):
            return jnp.uint32
        return state.dtype

    out_shape = (
        tuple(jax.ShapeDtypeStruct((n // _LANES, _LANES), dt_of(f))
              for f in _FIELDS)
        + (jax.ShapeDtypeStruct((f_slots, n // _LANES, _LANES), jnp.int32),
           jax.ShapeDtypeStruct((f_slots, n // _LANES, _LANES),
                                tally_dtype),
           jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.int32))
        + tuple(jax.ShapeDtypeStruct((s_slots, n // _LANES, _LANES),
                                     state.dtype) for _ in range(_SEGF))
        + (jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.int32),
           jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.uint32),
           jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.int32)))

    # Table-mode extras between the SMEM scalar row and the state refs
    # (invariant whole-array operands, same scheme as pallas_sweep).
    extra_ins = []
    extra_specs = []
    if table_mode:
        extra_ins.append(jnp.asarray(band, jnp.int32))
        extra_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        tabs = [scatter_layout.k0, scatter_layout.k1,
                scatter_layout.v0, scatter_layout.v1]
        if not geom.same_xs:
            tabs += [absorb_layout.k0, absorb_layout.k1,
                     absorb_layout.v0, absorb_layout.v1]
        extra_ins += tabs
        extra_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(tabs)

    n_io = _NF + 4 + _SEGF
    prefix = 1 + len(extra_ins)
    aliases = {i + prefix: i for i in range(n_io)}

    mk = jnp.asarray(master_key, jnp.uint32).reshape(1, 1)
    if windowed:
        xo = (jnp.zeros((), jnp.uint32) if x_off is None
              else x_off.astype(jnp.uint32))
        yo = (jnp.zeros((), jnp.uint32) if y_off is None
              else y_off.astype(jnp.uint32))
        mk = jnp.concatenate(
            [mk, xo.reshape(1, 1), yo.reshape(1, 1)], axis=1)

    out = pl.pallas_call(
        partial(_kernel, geom, scatter_tab, absorb_tab, inv_ntotal,
                k_pieces, f_slots, s_slots, tally_dtype, windowed,
                seg_plane, table_mode),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + extra_specs
        + [state_spec] * _NF + [fring_spec, fring_spec, state_spec]
        + [sring_spec] * _SEGF + [state_spec],
        out_specs=tuple([state_spec] * _NF)
        + (fring_spec, fring_spec, state_spec)
        + tuple([sring_spec] * _SEGF)
        + (state_spec, state_spec, state_spec),
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(mk, *extra_ins, *ins)

    new_vals = {}
    for f, arr in zip(_FIELDS, out[:_NF]):
        v = arr.reshape(n)
        if f == "dead":
            v = v != 0
        new_vals[f] = v
    new_state = ParticleState(**new_vals)
    fring = (out[_NF].reshape(f_slots, n), out[_NF + 1].reshape(f_slots, n),
             out[_NF + 2].reshape(n))
    sfields = tuple(out[_NF + 3 + f].reshape(s_slots, n)
                    for f in range(_SEGF))
    sn = out[_NF + 3 + _SEGF].reshape(n)
    nfac = out[_NF + 4 + _SEGF].reshape(n)
    ncol = out[_NF + 5 + _SEGF].reshape(n)
    return new_state, fring, (sfields, sn), nfac, ncol


@partial(jax.jit, static_argnames=("target", "ring_slots", "s_slots"),
         donate_argnums=(0, 1, 3, 4, 5, 6))
def compact_flight(full: ParticleState, part, sel, tally, fc, fv, fn, *,
                   target: int, ring_slots: int = 32, s_slots: int = 8):
    """Fused flight compaction: flush-ring drain + merge + reselect +
    fresh flush AND segment rings, in ONE dispatch (see
    pallas_sweep.compact_with_rings; each separate dispatch through the
    axon tunnel carries fixed submission cost).  Caller must ensure the
    SEGMENT rings are already empty (walker mode guarantees this at
    every chunk exit; the sorted-pair fallback drains them host-side
    first).  Returns (full', part'@target, sel', tally', fc, fv, fn,
    sfields, sn).
    """
    from .pallas_sweep import compact_core

    full, part, sel, tally, fc, fv, fn = compact_core(
        full, part, sel, tally, fc, fv, fn, target=target,
        ring_slots=ring_slots)
    sfields, sn = make_seg_ring(target, part.dtype, s_slots)
    return full, part, sel, tally, fc, fv, fn, sfields, sn


def make_seg_ring(n: int, dtype, s_slots: int = 4):
    """Fresh (empty) segment ring: 5 field planes + per-lane count."""
    return (tuple(jnp.zeros((s_slots, n), dtype) for _ in range(_SEGF)),
            jnp.zeros((n,), jnp.int32))


def _extract_segments(sfields, sn, segbuf, sbase, spairs, inv_tile,
                      pair_cap):
    """Move pending ring segments into the flat buffer, budget-gated.

    Per-lane all-or-nothing: a lane's ring entries move together (its
    count resets to 0) if the row AND (segment x tile) pair budgets still
    fit; later lanes stay ring-pending and retry at the next drain, so
    the statically-shaped rasterizer batch can never overflow.

    Returns (segbuf, sbase, spairs, (sfields, sn'), left_over_mask_any).
    """
    s_slots, n = sfields[0].shape
    scap = segbuf.shape[0]
    valid = (jnp.arange(s_slots, dtype=jnp.int32)[:, None] < sn[None, :])
    tx0 = jnp.floor(sfields[0] * inv_tile).astype(jnp.int32)
    ty0 = jnp.floor(sfields[1] * inv_tile).astype(jnp.int32)
    tx1 = jnp.floor(sfields[2] * inv_tile).astype(jnp.int32)
    ty1 = jnp.floor(sfields[3] * inv_tile).astype(jnp.int32)
    m = jnp.where(valid,
                  jnp.abs(tx1 - tx0) + jnp.abs(ty1 - ty0) + 1, 0)
    lane_rows = jnp.sum(valid, axis=0, dtype=jnp.int32)
    lane_pairs = jnp.sum(m, axis=0, dtype=jnp.int32)
    ok = ((sbase + jnp.cumsum(lane_rows) <= scap)
          & (spairs + jnp.cumsum(lane_pairs) <= pair_cap))
    take = (valid & ok[None, :]).reshape(-1)
    flat = [f.reshape(-1) for f in sfields]
    idx = sbase + jnp.cumsum(take.astype(jnp.int32)) - 1
    idx = jnp.where(take, idx, scap)
    zero = jnp.zeros_like(flat[0])
    rows = jnp.stack(flat + [zero, zero, zero], axis=1)
    segbuf = segbuf.at[idx].set(rows.astype(segbuf.dtype), mode="drop")
    sbase = sbase + jnp.sum(take, dtype=jnp.int32)
    spairs = spairs + jnp.sum(
        jnp.where(ok[None, :], m, 0), dtype=jnp.int32)
    sn_new = jnp.where(ok, 0, sn)
    left_over = jnp.any((~ok) & (lane_rows > 0))
    return segbuf, sbase, spairs, (sfields, sn_new), left_over


@partial(jax.jit, static_argnames=("tile", "pair_cap"), donate_argnums=(2,))
def extract_ring_segments(sfields, sn, segbuf, sbase, spairs,
                          tile: int = 128,
                          pair_cap: int = 8 * 1024 * 1024):
    """Host-callable ring->buffer extraction (for compaction/step end).

    Budget-gated like the in-chunk extraction; `left_over` tells the
    caller to rasterize and call again.  Returns
    (segbuf, sbase, spairs, (sfields, sn'), left_over).
    """
    inv_tile = np.float32(1.0 / tile)
    return _extract_segments(sfields, sn, segbuf, sbase, spairs, inv_tile,
                             pair_cap)


def pallas_flight_chunk_impl(state: ParticleState, tally,
                             counts: EventCounts,
                             fc, fv, fn, sfields, sn, segbuf, sbase,
                             spairs, scatter_tab: CrossSection,
                             absorb_tab: CrossSection, geom: Geometry,
                             master_key, inv_ntotal: float, max_calls: int,
                             k_pieces: int = 8, tile: int = 128,
                             pair_cap: int = 8 * 1024 * 1024,
                             interpret: bool = False,
                             x_off=None, y_off=None,
                             use_ring_walker: bool = False,
                             rbuf=None, ntx: int = 0, nty: int = 0,
                             seg_plane: bool = False,
                             scatter_layout: TableLayout | None = None,
                             absorb_layout: TableLayout | None = None,
                             band_nty: int | None = None,
                             exit_live: int = 0, exit_collapse: int = 4,
                             seg_repeat: int = 1):
    """Fused flight chunk: kernel calls + in-loop ring drains.

    Flush rings drain straight into the tally (pallas_sweep._drain_rings).
    Segment rings either extract into `segbuf` (sorted-pair raster path)
    until it or the pair budget fills, or — with `use_ring_walker` — stay
    ring-resident entirely: the chunk just returns when segment-ring
    pressure stalls progress and the caller feeds the rings straight to
    raster.rasterize_walk_rings (no extraction scatter, no flat buffer).
    Rings persist across chunks via the caller-owned arrays.

    With `rbuf` (the padded (nty*tile, ntx*tile) f32 raster buffer) the
    walker drain moves INSIDE the chunk loop: whenever a kernel call
    leaves ring pressure that would otherwise stall progress, the
    VMEM-resident walker kernel (raster._walk_call) rasterizes the rings
    in the same XLA program — segment pressure then never forces a chunk
    exit (each exit costs a ~33 ms host round trip through the axon
    tunnel plus a separate drain dispatch), so the chunk runs until
    census/migration work is exhausted or max_calls.  Rings are empty at
    every chunk exit by construction.

    Unjitted (shard_map-composable); `x_off`/`y_off` activate the
    spatial window (out-of-window lanes freeze and don't count as work).
    Returns (..., rbuf_or_None, ncalls*k_pieces, n_work, nseg_pending) —
    n_work the workable-lane count (compaction live count for unwindowed
    callers).

    `seg_repeat` M > 1 (seg_plane + in-loop walker only): each
    while-iteration runs M kernel sub-calls, sub-call j owning the
    k-plane slice [j*k, (j+1)*k) of an (M*k, n) segment ring, and the
    walker drain fires once per ITERATION instead of once per kernel
    call.  The drain's fixed cost (plane-stack dispatch + the padded
    accumulation buffer's VMEM round trip, ~1.4 ms) dominates
    compacted-tail chunks (measured ~2.4 ms per 65k-lane call on csp,
    of which the kernel itself is ~0.4 ms), so amortizing it over M
    calls is a direct tail speedup; flush-ring drains and event-count
    reductions keep their per-sub-call cadence, so the u32 width
    bounds are unchanged.

    `exit_live` > 0: in-kernel census-cliff exit — the while_loop stops
    once the workable-lane count BOTH drops below exit_live AND
    collapses `exit_collapse`x against the chunk-entry count, so the
    host compacts at a cliff's onset instead of paying max_calls of
    mostly-dead pieces (and, conversely, max_calls can be set LARGE so
    steady-state chunks stop exiting just to let the host poll the live
    count: each exit is a blocking ctrl fetch, a full tunnel round
    trip).  The collapse guard keeps gradual decay on the full-chunk
    cadence — without it every ~1.33x ladder level exits and compacts,
    and a mere halving guard still thrashes on sharp census tails (see
    pallas_sweep_chunk's docstring for the measured costs).  Callers
    must pick exit_live low enough that their compaction ladder fires
    on exit.
    """
    from .pallas_sweep import _drain_rings
    from .raster import rasterize_walk_rings_impl

    SCAP = segbuf.shape[0]
    n = state.x.shape[0]
    s_slots = sfields[0].shape[0]
    pause_budget = max(n // 2048, 1)
    inv_tile = np.float32(1.0 / tile)
    in_loop = rbuf is not None
    if in_loop and not use_ring_walker:
        raise ValueError("rbuf (in-loop walker drain) requires "
                         "use_ring_walker")
    if seg_plane and not in_loop:
        # Piece-plane rings are overwritten by the NEXT kernel call, so
        # they are only sound with the guaranteed in-loop drain cadence.
        raise ValueError("seg_plane requires the in-loop walker (rbuf)")
    if seg_repeat > 1:
        if not (seg_plane and in_loop):
            raise ValueError("seg_repeat > 1 requires seg_plane + the "
                             "in-loop walker")
        if s_slots != seg_repeat * k_pieces:
            raise ValueError(f"seg_repeat ring needs s_slots == "
                             f"seg_repeat*k_pieces ({seg_repeat}*"
                             f"{k_pieces}), got {s_slots}")

    def working(s):
        w = (~s.dead) & (s.dt_to_census > 0)
        if x_off is not None:
            lx = s.cellx - x_off
            w = w & (lx >= 0) & (lx < geom.nx)
        if y_off is not None:
            ly = s.celly - y_off
            w = w & (ly >= 0) & (ly < geom.ny)
        return w

    def seg_drain(op):
        rb, sf, sn = op
        rb, (sf, sn) = rasterize_walk_rings_impl(
            rb, sf, sn, tile=tile, ntx=ntx, nty=nty, interpret=interpret,
            kk_authoritative=seg_plane, band_nty=band_nty)
        return rb, sf, sn

    live0 = (jnp.count_nonzero(working(state)).astype(jnp.int32)
             if exit_live else jnp.asarray(n, jnp.int32))

    def cond(carry):
        (s, t, c, fc, fv, fn, sf, sn, sb, base, sp, rb, it, full,
         live_c) = carry
        ok = jnp.any(working(s)) & (it < max_calls) & (~full)
        if exit_live:
            ok = ok & ((live_c >= exit_live)
                       | (exit_collapse * live_c >= live0))
        return ok

    def _one_call(s, t, c, fc, fv, fn, sfr, sn):
        """One fused kernel sub-call on the k-plane ring slice it owns:
        energy band + physics + flush-ring pressure drain + event-count
        accumulation (seg_plane semantics — flush rings are the only
        lane gate).  Keeping the count reduction per sub-call preserves
        the u64_sum_u32 width-2048 overflow bound (k_pieces <= 32)."""
        band = None
        if scatter_layout is not None:
            w0 = working(s)
            srlo, srhi = energy_band(s.energy, w0, scatter_layout.keys,
                                     k_pieces)
            if geom.same_xs:
                band = jnp.stack([srlo, srhi, srlo, srhi])
            else:
                arlo, arhi = energy_band(s.energy, w0, absorb_layout.keys,
                                         k_pieces)
                band = jnp.stack([srlo, srhi, arlo, arhi])
        s, (fc, fv, fn), (sfr, sn), nfac, ncol = pallas_flight_multi(
            s, (fc, fv, fn), (sfr, sn), scatter_tab, absorb_tab, geom,
            master_key, inv_ntotal, t, k_pieces=k_pieces,
            interpret=interpret, x_off=x_off, y_off=y_off,
            seg_plane=True, scatter_layout=scatter_layout,
            absorb_layout=absorb_layout, band=band)
        w = working(s)
        f_full = fn >= fc.shape[0] - 1
        do_drain = ((jnp.count_nonzero(w & f_full) > pause_budget)
                    | (jnp.any(w) & ~jnp.any(w & ~f_full)))
        t, fc, fv, fn = lax.cond(
            do_drain & jnp.any(fn > 0),
            lambda op: _drain_rings(*op), lambda op: op,
            (t, fc, fv, fn))
        nf_hi, nf_lo = u64_sum_u32(nfac, width=2048)
        fh, fl = rng._add64(c.nfacets_hi, c.nfacets_lo, nf_hi, nf_lo)
        nc_hi, nc_lo = u64_sum_u32(ncol.astype(jnp.uint32), width=2048)
        ch, cl = rng._add64(c.ncollisions_hi, c.ncollisions_lo,
                            nc_hi, nc_lo)
        return s, t, EventCounts(fh, fl, ch, cl), fc, fv, fn, sfr, sn, w

    def body(carry):
        (s, t, c, fc, fv, fn, sf, sn, sb, base, sp, rb, it, full,
         live_c) = carry
        if seg_repeat > 1:
            # M sub-calls, each writing its own k-plane slice; ONE
            # walker drain per iteration (see the seg_repeat docstring).
            # The slice round trip is a ~k*n*5-word copy per sub-call —
            # negligible at the compacted-tail widths this mode targets.
            for j in range(seg_repeat):
                sfr = tuple(lax.slice_in_dim(
                    f, j * k_pieces, (j + 1) * k_pieces, axis=0)
                    for f in sf)
                s, t, c, fc, fv, fn, sfr, sn, w = _one_call(
                    s, t, c, fc, fv, fn, sfr, sn)
                sf = tuple(lax.dynamic_update_slice_in_dim(
                    f, fj, j * k_pieces, 0) for f, fj in zip(sf, sfr))
            if exit_live:
                live_c = jnp.count_nonzero(w).astype(jnp.int32)
            rb, sf, sn = lax.cond(
                jnp.any(sn > 0), seg_drain, lambda op: op,
                (rb, sf, sn))
            return (s, t, c, fc, fv, fn, sf, sn, sb, base, sp, rb,
                    it + 1, full, live_c)
        band = None
        if scatter_layout is not None:
            # Live-energy row band, re-derived before every kernel call;
            # a flight piece has at most one collision, so k_pieces is
            # the scatter-decay exponent (pallas_table.energy_band).
            w0 = working(s)
            srlo, srhi = energy_band(s.energy, w0, scatter_layout.keys,
                                     k_pieces)
            if geom.same_xs:
                band = jnp.stack([srlo, srhi, srlo, srhi])
            else:
                arlo, arhi = energy_band(s.energy, w0, absorb_layout.keys,
                                         k_pieces)
                band = jnp.stack([srlo, srhi, arlo, arhi])
        s, (fc, fv, fn), (sf, sn), nfac, ncol = pallas_flight_multi(
            s, (fc, fv, fn), (sf, sn), scatter_tab, absorb_tab, geom,
            master_key, inv_ntotal, t, k_pieces=k_pieces,
            interpret=interpret, x_off=x_off, y_off=y_off,
            seg_plane=seg_plane, scatter_layout=scatter_layout,
            absorb_layout=absorb_layout, band=band)
        w = working(s)
        if exit_live:
            live_c = jnp.count_nonzero(w).astype(jnp.int32)
        f_full = fn >= fc.shape[0] - 1
        s_full = sn >= s_slots
        # Piece-plane rings never gate a lane (plane p is piece p's own),
        # so s_full must not count as "paused" — it would force a full
        # S x N flush-drain scatter after every call on streaming decks.
        blocked = f_full if seg_plane else (f_full | s_full)
        paused = w & blocked
        npaused = jnp.count_nonzero(paused)
        stuck = jnp.any(w) & ~jnp.any(w & ~blocked)
        do_drain = (npaused > pause_budget) | stuck

        t, fc, fv, fn = lax.cond(
            do_drain & jnp.any(fn > 0),
            lambda op: _drain_rings(*op),
            lambda op: op,
            (t, fc, fv, fn))

        if use_ring_walker:
            if seg_plane:
                # Piece-plane rings are overwritten by the next call:
                # ANY emission this call forces the drain (the cond
                # below already gates on jnp.any(sn > 0)).
                seg_pressure = jnp.ones((), bool)
            else:
                seg_paused = jnp.count_nonzero(w & s_full)
                seg_pressure = ((seg_paused > pause_budget)
                                | (jnp.any(w) & ~jnp.any(w & ~s_full)))
            if in_loop:
                # In-loop walker drain: rasterize the rings in the SAME
                # XLA program whenever ring pressure would stall
                # progress; segment pressure then never forces a chunk
                # exit (each exit is a ~33 ms host round trip plus a
                # separate drain dispatch through the axon tunnel).
                rb, sf, sn = lax.cond(
                    seg_pressure & jnp.any(sn > 0),
                    seg_drain, lambda op: op, (rb, sf, sn))
            else:
                # Segment rings are the caller's: exit when they are the
                # thing stalling progress (flush rings just drained).  A
                # ring-full lane just idles its kernel slots, so the
                # exit threshold is much lazier than the drain cadence.
                full = ((seg_paused > jnp.maximum(n // 8, 1))
                        | (jnp.any(w) & ~jnp.any(w & ~s_full)))
            nf_hi, nf_lo = u64_sum_u32(nfac, width=2048)
            fh, fl = rng._add64(c.nfacets_hi, c.nfacets_lo, nf_hi, nf_lo)
            nc_hi, nc_lo = u64_sum_u32(ncol.astype(jnp.uint32),
                                       width=2048)
            ch, cl = rng._add64(c.ncollisions_hi, c.ncollisions_lo,
                                nc_hi, nc_lo)
            c = EventCounts(fh, fl, ch, cl)
            return (s, t, c, fc, fv, fn, sf, sn, sb, base, sp, rb, it + 1,
                    full, live_c)

        def extract(op):
            sf, sn, sb, base, sp = op
            sb, base, sp, (sf, sn), left = _extract_segments(
                sf, sn, sb, base, sp, inv_tile, pair_cap)
            return sf, sn, sb, base, sp, left

        n_pending = jnp.sum(jnp.minimum(sn, s_slots), dtype=jnp.int32)
        sf, sn, sb, base, sp, left = lax.cond(
            do_drain & (n_pending > 0),
            extract,
            lambda op: op + (jnp.zeros((), bool),),
            (sf, sn, sb, base, sp))
        # Some lanes didn't fit the batch budget: stop the chunk so the
        # host rasterizes the buffer and re-enters (they stay ring-gated).
        full = left

        # width 2048: per-lane facet counts over k_pieces fused pieces can
        # reach k * (global_nx + global_ny + 1); 2048 * that stays < 2^31
        # for k <= 32 on meshes up to ~16k cells a side.
        nf_hi, nf_lo = u64_sum_u32(nfac, width=2048)
        fh, fl = rng._add64(c.nfacets_hi, c.nfacets_lo, nf_hi, nf_lo)
        nc_hi, nc_lo = u64_sum_u32(ncol.astype(jnp.uint32), width=2048)
        ch, cl = rng._add64(c.ncollisions_hi, c.ncollisions_lo, nc_hi,
                            nc_lo)
        c = EventCounts(fh, fl, ch, cl)
        return (s, t, c, fc, fv, fn, sf, sn, sb, base, sp, rb, it + 1,
                full, live_c)

    rb0 = rbuf if in_loop else jnp.zeros((), jnp.float32)
    carry = (state, tally, counts, fc, fv, fn, sfields, sn, segbuf, sbase,
             spairs, rb0, jnp.zeros((), jnp.int32), jnp.zeros((), bool),
             live0)
    (state, tally, counts, fc, fv, fn, sfields, sn, segbuf, sbase, spairs,
     rbuf, ncalls, _, _) = lax.while_loop(cond, body, carry)
    if in_loop:
        # Final drain so rings are ALWAYS empty at chunk exit (the
        # pressure-gated in-loop cadence can leave a partial ring when
        # the census finishes or max_calls hits).
        rbuf, sfields, sn = lax.cond(
            jnp.any(sn > 0), seg_drain, lambda op: op,
            (rbuf, sfields, sn))
    else:
        rbuf = None
    # Working-lane COUNT: in windowed mode, workable lanes on THIS shard
    # (frozen out-of-window lanes are the caller's migration work);
    # single-device callers reuse it as the compaction live count,
    # saving a live_count dispatch per chunk.
    n_work = jnp.count_nonzero(working(state)).astype(jnp.int32)
    nseg_pending = jnp.sum(jnp.minimum(sn, s_slots), dtype=jnp.int32)
    return (state, tally, counts, fc, fv, fn, sfields, sn, segbuf, sbase,
            spairs, rbuf, ncalls * (k_pieces * seg_repeat), n_work,
            nseg_pending)


@partial(jax.jit, static_argnames=("geom", "inv_ntotal", "max_calls",
                                   "k_pieces", "tile", "pair_cap",
                                   "interpret", "use_ring_walker",
                                   "ntx", "nty", "seg_plane", "band_nty",
                                   "exit_live", "exit_collapse",
                                   "seg_repeat"),
         donate_argnums=(0, 1, 3, 4, 5, 6, 7, 8, 11))
def pallas_flight_chunk(state: ParticleState, tally, counts: EventCounts,
                        fc, fv, fn, sfields, sn, segbuf, sbase, spairs,
                        rbuf, scatter_tab: CrossSection,
                        absorb_tab: CrossSection, geom: Geometry,
                        master_key, inv_ntotal: float, max_calls: int,
                        k_pieces: int = 8, tile: int = 128,
                        pair_cap: int = 8 * 1024 * 1024,
                        interpret: bool = False, x_off=None, y_off=None,
                        use_ring_walker: bool = False,
                        ntx: int = 0, nty: int = 0,
                        seg_plane: bool = False,
                        scatter_layout: TableLayout | None = None,
                        absorb_layout: TableLayout | None = None,
                        band_nty: int | None = None,
                        exit_live: int = 0, exit_collapse: int = 4,
                        seg_repeat: int = 1):
    """Jitted single-device wrapper of pallas_flight_chunk_impl.

    `rbuf` — the padded (nty*tile, ntx*tile) f32 raster buffer, or None
    — activates the in-loop walker drain (walker mode only); rings are
    then empty at every chunk exit.  The five control scalars come back
    PACKED as one i32 vector
    [nsweeps, sbase, spairs, n_work, nseg_pending] so the host chains on
    a single small fetch per chunk (each separate scalar fetch is its
    own round trip through the axon tunnel).
    """
    (state, tally, counts, fc, fv, fn, sfields, sn, segbuf, sbase, spairs,
     rbuf, done, n_work, npend) = pallas_flight_chunk_impl(
        state, tally, counts, fc, fv, fn, sfields, sn, segbuf, sbase,
        spairs, scatter_tab, absorb_tab, geom, master_key, inv_ntotal,
        max_calls, k_pieces=k_pieces, tile=tile, pair_cap=pair_cap,
        interpret=interpret, x_off=x_off, y_off=y_off,
        use_ring_walker=use_ring_walker, rbuf=rbuf, ntx=ntx, nty=nty,
        seg_plane=seg_plane, scatter_layout=scatter_layout,
        absorb_layout=absorb_layout, band_nty=band_nty,
        exit_live=exit_live, exit_collapse=exit_collapse,
        seg_repeat=seg_repeat)
    ctrl = jnp.stack([done.astype(jnp.int32), sbase, spairs, n_work,
                      npend])
    return (state, tally, counts, fc, fv, fn, sfields, sn, segbuf, rbuf,
            ctrl)
