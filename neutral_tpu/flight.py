"""Free-flight transport engine: one closed-form flight piece per sweep.

The facet-stepping engines (transport.sweep_core / pallas_sweep) advance a
particle ONE CELL at a time, paying a tally flush — a serialized ~10ns
HBM scatter entry — for every cell crossed.  Facet-dominated problems
(stream: ~7000 facet events per particle per step) are therefore bound by
the scatter unit, not by compute.

This engine exploits the reference's own stream structure: RNG draws occur
ONLY at collisions (omp3/neutral.c:234,294 — facet_event and census_event
draw nothing), so free flight between collisions is fully deterministic.
The deck's material field is piecewise-constant on cell-aligned rectangles
(arch shared_data builds density from problem_N boxes — main.c:67-68), so
within one rectangle the optical depth is linear in distance and the next
event is closed-form:

    one *flight piece* = trace the ray to the nearest of
      rect exit | boundary reflection | collision | census
    in O(1) vector math, crossing ANY number of cells at once.

Per-cell energy deposition along the piece is K * pathlength(cell) with a
single per-piece constant K (weight/energy/direction/density all constant
— calculate_energy_deposition, omp3/neutral.c:474-495), so the piece emits
ONE line-segment record; the dense tile rasterizer (raster.py) turns the
segment batch into per-cell tally deposits on the VPU with no per-cell
scatter.  Partial head/tail cells keep the reference's flush-on-cell-exit
accounting exactly (deposit accumulator + flush entries).

Event-count parity: facet events = cell-boundary crossings, computed
analytically per piece (|dcellx| + |dcelly|, +1 for a reflection — the
reference counts the reflecting facet event too, omp3/neutral.c:171).
Collision physics, RNG streams and draw counters are shared verbatim with
the facet-stepping engines (transport.collision_physics), so per-history
collision sequences are identical; tallies agree to float rounding.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import rng
from .constants import BARNS, OPEN_BOUND_CORRECTION
from .particles import ParticleState
from .transport import (EventCounts, Geometry, _c, _heating_response,
                        _INV_MOLAR, _speed_of, collision_physics)
from .xs import CrossSection


# ---------------------------------------------------------------------------
# Host-side geometry: disjoint constant-density rectangles
# ---------------------------------------------------------------------------

def disjoint_rects(regions: tuple, nx: int, ny: int) -> tuple:
    """Partition the domain into disjoint cell-index rectangles.

    `regions` are the deck's problem_N boxes as cell-index rects
    (mesh.region_cell_bounds) with LAST-WINS overwrite semantics, exactly
    like the reference density builder; uncovered cells have density 0.
    Returns ((ix0, ix1, iy0, iy1, density), ...) covering every cell once.
    Adjacent same-density strips are merged so the count stays small
    (<= a handful for the shipped decks).
    """
    xs = sorted({0, nx, *(r[0] for r in regions), *(r[1] for r in regions)})
    ys = sorted({0, ny, *(r[2] for r in regions), *(r[3] for r in regions)})
    xs = [v for v in xs if 0 <= v <= nx]
    ys = [v for v in ys if 0 <= v <= ny]

    def slab_density(x0, x1, y0, y1):
        d = 0.0
        for (ix0, ix1, iy0, iy1, dd) in regions:
            if ix0 <= x0 and x1 <= ix1 and iy0 <= y0 and y1 <= iy1:
                d = dd
        return d

    # Row bands of x-merged runs, then merge vertically-adjacent bands
    # whose run structure is identical.
    bands = []
    for j in range(len(ys) - 1):
        runs = []
        for i in range(len(xs) - 1):
            d = slab_density(xs[i], xs[i + 1], ys[j], ys[j + 1])
            if runs and runs[-1][2] == d:
                runs[-1] = (runs[-1][0], xs[i + 1], d)
            else:
                runs.append((xs[i], xs[i + 1], d))
        bands.append([ys[j], ys[j + 1], runs])
    merged = []
    for band in bands:
        if merged and merged[-1][2] == band[2] and merged[-1][1] == band[0]:
            merged[-1] = [merged[-1][0], band[1], merged[-1][2]]
        else:
            merged.append(band)
    out = []
    for (y0, y1, runs) in merged:
        for (x0, x1, d) in runs:
            out.append((int(x0), int(x1), int(y0), int(y1), float(d)))
    return tuple(out)


def split_rects(rects: tuple, xcuts, ycuts) -> tuple:
    """Split disjoint rects along global cell-index grid lines.

    A spatial decomposition with shard boundaries at `xcuts`/`ycuts`
    clamps every rect wall to the shard window (flight_core's windowed
    mode), so its per-piece arithmetic equals a single-device run over
    this pre-split partition — which makes the decomposed engine
    bitwise-testable against the single-device engine (the same
    physically-invisible-decomposition claim the stepping engine's
    spatial tests pin).
    """
    out = []
    for (ix0, ix1, iy0, iy1, d) in rects:
        xs = [ix0] + [int(c) for c in sorted(set(xcuts))
                      if ix0 < c < ix1] + [ix1]
        ys = [iy0] + [int(c) for c in sorted(set(ycuts))
                      if iy0 < c < iy1] + [iy1]
        for j in range(len(ys) - 1):
            for i in range(len(xs) - 1):
                out.append((xs[i], xs[i + 1], ys[j], ys[j + 1], float(d)))
    return tuple(out)


# ---------------------------------------------------------------------------
# uint64-safe reductions without x64
# ---------------------------------------------------------------------------

def u64_sum_u32(v: jnp.ndarray, width: int = 4096
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(hi, lo) uint32 pair = sum of a uint32 vector, overflow-safe.

    Valid when width * max(v) < 2^31 and len(v)/width < 2^15 — e.g. the
    default width 4096 covers elements < 2^19 (per-piece facet counts are
    bounded by global_nx + global_ny + 1; multi-piece kernel calls pass a
    smaller width).  Two-level split: bounded row sums, then their 16-bit
    halves summed separately and recombined with explicit carries.
    """
    n = v.shape[0]
    pad = (-n) % width
    if pad:
        v = jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
    rows = v.reshape(-1, width).sum(axis=1, dtype=jnp.uint32)
    lo16 = (rows & jnp.uint32(0xFFFF)).sum(dtype=jnp.uint32)
    hi16 = (rows >> jnp.uint32(16)).sum(dtype=jnp.uint32)
    # total = lo16 + hi16 * 2^16, assembled as a (hi, lo) u64 pair.
    hi = hi16 >> jnp.uint32(16)
    lo_part = hi16 << jnp.uint32(16)
    return rng._add64(hi, lo_part, jnp.uint32(0), lo16)


# ---------------------------------------------------------------------------
# One flight piece per lane
# ---------------------------------------------------------------------------

def flight_core(state: ParticleState, geom: Geometry,
                scatter_tab: CrossSection, absorb_tab: CrossSection,
                master_key, inv_ntotal: float, tally_dtype, gate=None,
                x_off=None, y_off=None):
    """Advance every live lane through exactly ONE flight piece.

    Pure math, no tally scatter; the caller owns buffer appends and may
    veto lanes after the fact (candidate-select), which is bitwise-safe
    because vetoed lanes keep their old state including the RNG counter.

    Requires geom.rects (disjoint_rects) and the uniform-pitch fast path
    (geom.dx/dy); positions are GLOBAL coordinates (flight pieces span
    many cells, so the f32 cell-local representation does not apply; cell
    membership is decided once per piece by floor division, not by
    per-facet edge comparisons, so the f32 spurious-facet problem of the
    stepping engines does not arise either).

    Spatial-decomposition mode: `x_off`/`y_off` (traced int32 scalars)
    place this shard's window [x_off, x_off+geom.nx) x [y_off,
    y_off+geom.ny) on the global mesh.  Rect walls clamp to the window
    (a piece ends at the shard boundary exactly as it would at a rect
    wall — the same closed-form math, reference facet semantics
    omp3/neutral.c:303-380 with the cell edge generalized), lanes whose
    cell lies outside the window freeze bitwise until migrated, and
    flush cells / rasterizer segments are emitted in window-local
    coordinates (the shard's private tally slab).  The equivalent
    single-device geometry is split_rects over the shard grid lines:
    identical wall integers => identical per-piece arithmetic.

    Returns (new_state, flush1, cell1, val1, flush2, cell2, val2,
             emit, seg(gx0, gy0, gx1, gy1, kk), nf_lane_u32, is_coll):
      flush1 — deposit flushed on leaving the piece's first cell
               (reference flush site: omp3/neutral.c:325-327),
      flush2 — death/census flush in the final cell (:247-250, :400-402),
      seg    — interior full-cell segment in CELL units for the
               rasterizer (empty unless >= 2 boundary crossings),
      nf_lane — facet events this piece (crossings + reflection).
    """
    if geom.rects is None or not geom.dx:
        raise ValueError("flight engine requires fast_math geometry with "
                         "disjoint rects")
    dtype = state.dtype
    zero = _c(0.0, dtype)
    win_x = x_off is not None
    win_y = y_off is not None
    i32 = jnp.int32
    xo = i32(geom.x_off) if not win_x else x_off.astype(i32)
    yo = i32(geom.y_off) if not win_y else y_off.astype(i32)
    live = (~state.dead) & (state.dt_to_census > zero)
    if win_x:
        live = live & (state.cellx >= xo) & (state.cellx < xo + geom.nx)
    if win_y:
        live = live & (state.celly >= yo) & (state.celly < yo + geom.ny)
    if gate is not None:
        # Paused lanes (full rings / exhausted buffers) freeze bitwise,
        # exactly like the Mosaic ring engine's pause semantics.
        live = live & gate

    dx = _c(geom.dx, dtype)
    dy = _c(geom.dy, dtype)
    inv_dx = _c(1.0 / geom.dx, dtype)
    inv_dy = _c(1.0 / geom.dy, dtype)

    # ---- current rect by cell membership (exact: integer tests) ----------
    i32 = jnp.int32
    rho = jnp.zeros_like(state.x)
    rix0 = jnp.zeros(state.x.shape, i32)
    rix1 = jnp.full(state.x.shape, geom.global_nx, i32)
    riy0 = jnp.zeros(state.x.shape, i32)
    riy1 = jnp.full(state.x.shape, geom.global_ny, i32)
    for (ix0, ix1, iy0, iy1, d) in geom.rects:
        inside = ((state.cellx >= ix0) & (state.cellx < ix1) &
                  (state.celly >= iy0) & (state.celly < iy1))
        rho = jnp.where(inside, _c(d, dtype), rho)
        rix0 = jnp.where(inside, i32(ix0), rix0)
        rix1 = jnp.where(inside, i32(ix1), rix1)
        riy0 = jnp.where(inside, i32(iy0), riy0)
        riy1 = jnp.where(inside, i32(iy1), riy1)
    if win_x:
        # Shard walls behave exactly like rect walls (split_rects parity).
        rix0 = jnp.maximum(rix0, xo)
        rix1 = jnp.minimum(rix1, xo + geom.nx)
    if win_y:
        riy0 = jnp.maximum(riy0, yo)
        riy1 = jnp.minimum(riy1, yo + geom.ny)

    # ---- material state (same formulas as sweep_core) ---------------------
    sig_s = scatter_tab.lookup(state.energy)
    sig_a = sig_s if geom.same_xs else absorb_tab.lookup(state.energy)
    sig_t = sig_s + sig_a
    number_density = rho * _c(_INV_MOLAR, dtype)
    mac_s = number_density * sig_s * _c(BARNS, dtype)
    mac_a = number_density * sig_a * _c(BARNS, dtype)
    mac_t = mac_s + mac_a
    cell_mfp = 1.0 / mac_t
    speed = _speed_of(state.energy)

    # ---- distances to the rect walls (same convention as the reference's
    # calc_distance_to_facet, omp3/neutral.c:423-471, with the cell edge
    # replaced by the rect wall) --------------------------------------------
    obc = _c(OPEN_BOUND_CORRECTION, dtype)
    u_x_inv = 1.0 / (state.omega_x * speed)
    u_y_inv = 1.0 / (state.omega_y * speed)
    wx_pos = rix1.astype(dtype) * dx
    wx_neg = rix0.astype(dtype) * dx - obc
    wy_pos = riy1.astype(dtype) * dy
    wy_neg = riy0.astype(dtype) * dy - obc
    dt_x = jnp.where(state.omega_x >= zero, (wx_pos - state.x) * u_x_inv,
                     (wx_neg - state.x) * u_x_inv)
    dt_y = jnp.where(state.omega_y >= zero, (wy_pos - state.y) * u_y_inv,
                     (wy_neg - state.y) * u_y_inv)
    x_wall = dt_x < dt_y
    d_exit = jnp.where(x_wall, dt_x, dt_y) * speed

    d_coll = state.mfp_to_collision * cell_mfp
    d_census = speed * state.dt_to_census

    is_coll = (d_coll < d_exit) & (d_coll < d_census) & live
    is_exit = (~is_coll) & (d_exit < d_census) & live
    is_census = live & (~is_coll) & (~is_exit)

    d = jnp.where(is_coll, d_coll, jnp.where(is_exit, d_exit, d_census))
    d = jnp.maximum(d, zero)

    # ---- endpoint & new cell ----------------------------------------------
    x1 = state.x + jnp.where(live, d * state.omega_x, zero)
    y1 = state.y + jnp.where(live, d * state.omega_y, zero)

    pos_x = state.omega_x > zero
    pos_y = state.omega_y > zero
    exit_x = is_exit & x_wall
    exit_y = is_exit & (~x_wall)
    # Reflection: the exited wall is the global boundary
    # (omp3/neutral.c:333-369).  (Logical ops, not where-on-bool: Mosaic
    # has no i8->i1 select truncation.)
    refl_x = exit_x & ((pos_x & (rix1 == geom.global_nx))
                       | ((~pos_x) & (rix0 == 0)))
    refl_y = exit_y & ((pos_y & (riy1 == geom.global_ny))
                       | ((~pos_y) & (riy0 == 0)))
    is_refl = refl_x | refl_y

    fcx = jnp.floor(x1 * inv_dx).astype(i32)
    fcy = jnp.floor(y1 * inv_dy).astype(i32)
    in_cx = jnp.clip(fcx, rix0, rix1 - 1)
    in_cy = jnp.clip(fcy, riy0, riy1 - 1)
    # x-exit: step across the wall (or stay in the boundary cell if
    # reflecting); the other axis clips into the rect.
    cx1 = jnp.where(
        exit_x,
        jnp.where(refl_x, jnp.where(pos_x, rix1 - 1, rix0),
                  jnp.where(pos_x, rix1, rix0 - 1)),
        in_cx)
    cy1 = jnp.where(
        exit_y,
        jnp.where(refl_y, jnp.where(pos_y, riy1 - 1, riy0),
                  jnp.where(pos_y, riy1, riy0 - 1)),
        in_cy)
    cx1 = jnp.where(live, cx1, state.cellx)
    cy1 = jnp.where(live, cy1, state.celly)

    # ---- facet-event count: boundary crossings (+1 for the reflection) ----
    nfx = jnp.abs(cx1 - state.cellx)
    nfy = jnp.abs(cy1 - state.celly)
    ncross = nfx + nfy
    nf_lane = jnp.where(live, ncross + is_refl.astype(i32), 0)

    # ---- deposit bookkeeping ----------------------------------------------
    # K = deposit per unit path (constant along the piece): the reference's
    # calculate_energy_deposition integrand (omp3/neutral.c:474-495).
    K = (state.weight * (sig_t * _c(BARNS, dtype))
         * _heating_response(state.energy, sig_a, sig_t) * number_density)

    # Exit distance of the FIRST cell (cell-edge version of the wall math).
    ex_pos = (state.cellx + 1).astype(dtype) * dx
    ex_neg = state.cellx.astype(dtype) * dx - obc
    ey_pos = (state.celly + 1).astype(dtype) * dy
    ey_neg = state.celly.astype(dtype) * dy - obc
    cdt_x = jnp.where(state.omega_x >= zero, (ex_pos - state.x) * u_x_inv,
                      (ex_neg - state.x) * u_x_inv)
    cdt_y = jnp.where(state.omega_y >= zero, (ey_pos - state.y) * u_y_inv,
                      (ey_neg - state.y) * u_y_inv)
    d_head = jnp.clip(jnp.minimum(cdt_x, cdt_y) * speed, zero, d)

    # Entry distance of the FINAL cell along the ray.
    d_inx = jnp.where(
        cx1 > state.cellx, (cx1.astype(dtype) * dx - state.x) * u_x_inv,
        jnp.where(cx1 < state.cellx,
                  ((cx1 + 1).astype(dtype) * dx - state.x) * u_x_inv, zero))
    d_iny = jnp.where(
        cy1 > state.celly, (cy1.astype(dtype) * dy - state.y) * u_y_inv,
        jnp.where(cy1 < state.celly,
                  ((cy1 + 1).astype(dtype) * dy - state.y) * u_y_inv, zero))
    d_in = jnp.clip(jnp.maximum(d_inx, d_iny) * speed, zero, d)
    d_in = jnp.maximum(d_in, d_head)

    crossed = live & (ncross > 0)
    emit = live & (ncross >= 2)
    # Pieces with exactly one crossing have no interior cells: fold the
    # (float-noise) gap between head and final-cell entry into the head so
    # the total deposited is exactly K*d.
    d_head_eff = jnp.where(emit, d_head, d_in)

    # first cell: accumulate then flush on exit
    acc1 = state.deposit + jnp.where(
        live, K * jnp.where(crossed, d_head_eff, d), zero)
    flush1 = crossed
    cell1 = (state.celly - yo) * geom.nx + (state.cellx - xo)
    val1 = (jnp.where(flush1, acc1, zero).astype(tally_dtype)
            * _c(inv_ntotal, tally_dtype))

    # final cell: tail accumulates; flushed on death/census
    acc2 = jnp.where(crossed, K * (d - d_in), acc1)

    # ---- collision physics (shared with sweep_core) ------------------------
    (omega_x, omega_y, energy, weight, died, coll_alive, mfp,
     counter) = collision_physics(state, geom, scatter_tab, master_key,
                                  is_coll, mac_a, mac_t, number_density)
    omega_x = jnp.where(refl_x, -omega_x, omega_x)
    omega_y = jnp.where(refl_y, -omega_y, omega_y)

    flush2 = live & (died | is_census)
    cell2 = (cy1 - yo) * geom.nx + (cx1 - xo)
    val2 = (jnp.where(flush2, acc2, zero).astype(tally_dtype)
            * _c(inv_ntotal, tally_dtype))
    deposit = jnp.where(flush2, zero, jnp.where(live, acc2, state.deposit))

    # ---- interior segment for the rasterizer (CELL units; window-local
    # in spatial mode — the integer shift is exact, so a localized DDA
    # walk reproduces the global walk's arithmetic bitwise) -----------------
    p0x = (state.x + d_head_eff * state.omega_x) * inv_dx
    p0y = (state.y + d_head_eff * state.omega_y) * inv_dy
    p1x = (state.x + d_in * state.omega_x) * inv_dx
    p1y = (state.y + d_in * state.omega_y) * inv_dy
    if win_x:
        xo_f = xo.astype(dtype)
        p0x = p0x - xo_f
        p1x = p1x - xo_f
    if win_y:
        yo_f = yo.astype(dtype)
        p0y = p0y - yo_f
        p1y = p1y - yo_f
    seg_len = jnp.maximum(d_in - d_head_eff, zero)
    kk = (K * seg_len).astype(tally_dtype) * _c(inv_ntotal, tally_dtype)

    # ---- mean free paths & census clock (omp3/neutral.c:317-318,396-404) --
    mfp = jnp.where(is_exit | is_census, mfp - d / cell_mfp, mfp)
    dt_to_census = state.dt_to_census - jnp.where(live, d / speed, zero)
    dt_to_census = jnp.where(is_census, zero, dt_to_census)

    new_state = ParticleState(
        x=x1, y=y1, omega_x=omega_x, omega_y=omega_y, energy=energy,
        weight=weight, dt_to_census=dt_to_census, mfp_to_collision=mfp,
        deposit=deposit, cellx=cx1, celly=cy1, dead=state.dead | died,
        pid=state.pid, counter=counter)
    return (new_state, flush1, cell1, val1, flush2, cell2, val2,
            emit, p0x, p0y, p1x, p1y, kk,
            nf_lane.astype(jnp.uint32), is_coll)


def _tree_select(mask, a, b):
    return jax.tree_util.tree_map(
        lambda u, v: jnp.where(mask, u, v), a, b)


def flight_chunk_impl(state: ParticleState, counts: EventCounts,
                      scatter_tab: CrossSection, fbuf_cell, fbuf_val,
                      segbuf, fcnt, scnt, spairs,
                      absorb_tab: CrossSection, geom: Geometry,
                      master_key, inv_ntotal: float, max_sweeps: int,
                      tile: int = 128, pair_cap: int = 8 * 1024 * 1024,
                      x_off=None, y_off=None):
    """Run flight sweeps until buffers fill, max_sweeps, or no work left.

    Buffers (caller-owned, drained between chunks):
      fbuf_cell (FCAP,) i32 + fbuf_val (FCAP,) — tally flush entries,
      segbuf (SCAP, 8) f32 — rasterizer segments
        rows [gx0, gy0, gx1, gy1, kk, 0, 0, 0] in cell units.
    `spairs` tracks the total (segment x tile) pair count so the drain's
    statically-shaped rasterizer batch can never overflow: lanes whose
    emission would blow a budget are vetoed for this sweep (kept bitwise
    intact — they simply retry after the drain).

    `x_off`/`y_off` activate the spatial-decomposition window (see
    flight_core): out-of-window lanes freeze and don't count as work —
    the caller migrates them between chunks.

    Returns (state, counts, fbuf_cell, fbuf_val, segbuf, fcnt, scnt,
    spairs, nsweeps, any_live).
    """
    FCAP = fbuf_cell.shape[0]
    SCAP = segbuf.shape[0]
    PCAP = pair_cap  # drain sizes its statically-shaped expansion to this
    inv_tile = 1.0 / tile

    def live_mask(s):
        w = (~s.dead) & (s.dt_to_census > 0)
        if x_off is not None:
            lx = s.cellx - x_off
            w = w & (lx >= 0) & (lx < geom.nx)
        if y_off is not None:
            ly = s.celly - y_off
            w = w & (ly >= 0) & (ly < geom.ny)
        return w

    def cond(carry):
        s, _, _, _, _, fc, sc, sp, it, stalled = carry
        return jnp.any(live_mask(s)) & (it < max_sweeps) & (~stalled)

    def body(carry):
        s, c, fcell, fval, seg, fc, sc, sp, it, _ = carry
        (cand, f1, c1, v1, f2, c2, v2, emit, gx0, gy0, gx1, gy1, kk,
         nf_lane, is_coll) = flight_core(s, geom, scatter_tab, absorb_tab,
                                         master_key, inv_ntotal,
                                         fbuf_val.dtype, x_off=x_off,
                                         y_off=y_off)
        # (segment x tile) pair count for the drain budget
        tx0 = jnp.floor(gx0 * inv_tile).astype(jnp.int32)
        tx1 = jnp.floor(gx1 * inv_tile).astype(jnp.int32)
        ty0 = jnp.floor(gy0 * inv_tile).astype(jnp.int32)
        ty1 = jnp.floor(gy1 * inv_tile).astype(jnp.int32)
        m = jnp.where(emit,
                      jnp.abs(tx1 - tx0) + jnp.abs(ty1 - ty0) + 1, 0)

        nf1 = f1.astype(jnp.int32)
        nf2 = f2.astype(jnp.int32)
        nfl = jnp.sum(nf1 + nf2, dtype=jnp.int32)
        nse = jnp.count_nonzero(emit).astype(jnp.int32)
        npr = jnp.sum(m, dtype=jnp.int32)

        over = ((fc + nfl > FCAP) | (sc + nse > SCAP) | (sp + npr > PCAP))

        def budget_gate(_):
            cum_f = jnp.cumsum(nf1 + nf2)
            cum_s = jnp.cumsum(emit.astype(jnp.int32))
            cum_m = jnp.cumsum(m)
            return ((fc + cum_f <= FCAP) & (sc + cum_s <= SCAP)
                    & (sp + cum_m <= PCAP))

        ok = lax.cond(over, budget_gate,
                      lambda _: jnp.ones(s.x.shape, bool), None)
        # All-vetoed (a single lane over budget at a fresh buffer cannot
        # happen: FCAP/SCAP >> per-lane worst case) => drain needed.
        stalled = over & (~jnp.any(ok & live_mask(s)
                                   & (f1 | f2 | emit | is_coll
                                      | (nf_lane > 0))))

        s = _tree_select(ok, cand, s)
        f1 &= ok
        f2 &= ok
        emit &= ok
        is_coll &= ok
        nf_lane = jnp.where(ok, nf_lane, 0)
        m = jnp.where(ok, m, 0)

        # ---- append flush entries (both flush sites in one scatter) ------
        nf1 = f1.astype(jnp.int32)
        nf2 = f2.astype(jnp.int32)
        base2 = fc + jnp.sum(nf1, dtype=jnp.int32)
        idx1 = fc + jnp.cumsum(nf1) - 1
        idx2 = base2 + jnp.cumsum(nf2) - 1
        allidx = jnp.concatenate([jnp.where(f1, idx1, FCAP),
                                  jnp.where(f2, idx2, FCAP)])
        fcell = fcell.at[allidx].set(jnp.concatenate([c1, c2]), mode="drop")
        fval = fval.at[allidx].set(jnp.concatenate([v1, v2]), mode="drop")
        fc = base2 + jnp.sum(nf2, dtype=jnp.int32)

        # ---- append segment rows ------------------------------------------
        sidx = sc + jnp.cumsum(emit.astype(jnp.int32)) - 1
        rows = jnp.stack([gx0, gy0, gx1, gy1,
                          kk.astype(segbuf.dtype),
                          jnp.zeros_like(gx0), jnp.zeros_like(gx0),
                          jnp.zeros_like(gx0)], axis=1)
        seg = lax.cond(
            jnp.any(emit),
            lambda sg: sg.at[jnp.where(emit, sidx, SCAP)].set(
                rows.astype(sg.dtype), mode="drop"),
            lambda sg: sg,
            seg)
        sc = sc + jnp.count_nonzero(emit).astype(jnp.int32)
        sp = sp + jnp.sum(m, dtype=jnp.int32)

        nf_hi, nf_lo = u64_sum_u32(nf_lane)
        fh, fl = rng._add64(c.nfacets_hi, c.nfacets_lo, nf_hi, nf_lo)
        ch, cl = rng._add64(c.ncollisions_hi, c.ncollisions_lo,
                            jnp.uint32(0),
                            jnp.count_nonzero(is_coll).astype(jnp.uint32))
        c = EventCounts(fh, fl, ch, cl)
        return (s, c, fcell, fval, seg, fc, sc, sp, it + 1,
                stalled)

    carry = (state, counts, fbuf_cell, fbuf_val, segbuf, fcnt, scnt,
             spairs, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    (state, counts, fbuf_cell, fbuf_val, segbuf, fcnt, scnt, spairs,
     nsweeps, _) = lax.while_loop(cond, body, carry)
    # Working-lane COUNT: in windowed (spatial) mode this counts workable
    # lanes on THIS shard (frozen out-of-window lanes are the caller's
    # migration work); single-device callers reuse it as the compaction
    # live count, saving a live_count dispatch per chunk.
    n_work = jnp.count_nonzero(live_mask(state)).astype(jnp.int32)
    return (state, counts, fbuf_cell, fbuf_val, segbuf, fcnt, scnt,
            spairs, nsweeps, n_work)


@partial(jax.jit, static_argnames=("geom", "inv_ntotal", "max_sweeps",
                                   "tile", "pair_cap"),
         donate_argnums=(0, 3, 4, 5))
def flight_chunk(state: ParticleState, counts: EventCounts,
                 scatter_tab: CrossSection, fbuf_cell, fbuf_val, segbuf,
                 fcnt, scnt, spairs, absorb_tab: CrossSection,
                 geom: Geometry, master_key, inv_ntotal: float,
                 max_sweeps: int, tile: int = 128,
                 pair_cap: int = 8 * 1024 * 1024):
    """Jitted single-device wrapper of flight_chunk_impl (see its doc)."""
    return flight_chunk_impl(state, counts, scatter_tab, fbuf_cell,
                             fbuf_val, segbuf, fcnt, scnt, spairs,
                             absorb_tab, geom, master_key, inv_ntotal,
                             max_sweeps, tile=tile, pair_cap=pair_cap)


@jax.jit
def drain_flushes(tally, fbuf_cell, fbuf_val, fcnt):
    """Scatter the buffered flush entries into the flat tally."""
    valid = jnp.arange(fbuf_cell.shape[0]) < fcnt
    idx = jnp.where(valid, fbuf_cell, tally.shape[0])
    return lax.cond(
        fcnt > 0,
        lambda t: t.at[idx].add(fbuf_val.astype(t.dtype), mode="drop"),
        lambda t: t,
        tally)
