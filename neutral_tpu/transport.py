"""Event-based Monte Carlo transport: the TPU-native compute core.

The reference tracks each particle history in an unbounded, divergent
per-thread `while` loop (omp3/neutral.c:134-197, cuda/neutral.k:148-494).
That formulation is hostile to wide SIMD; its own README points at the
`event-based` branches as the data-parallel reformulation.  This module IS
that reformulation, built for XLA:

  one *event sweep* advances every live particle through exactly one event
  (facet crossing / collision / census) simultaneously, with masked lanes,
  and a `lax.while_loop` repeats sweeps until every particle has reached
  census or died.

Physics per event is behaviorally identical to the reference (all formulas
cited inline).  Reproducibility comes from the counter-based RNG: each lane
advances its own draw counter exactly as the sequential history loop would,
so tallies and event counts match the reference semantics bit-for-bit in
float64 and to statistical tolerance in float32.

Structure-of-arrays state; cross-sections/edges/density evaluated in
closed form on the fast path (gather fallbacks for arbitrary tables and
non-uniform meshes); scatter-add for tallies — no atomics, no data races,
by construction.  The TPU production path runs this module's sweep_core
inside the fused Pallas kernel (pallas_sweep.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import rng
from .constants import (AVOGADROS, BARNS, EV_TO_J, MASS_NO,
                        MIN_ENERGY_OF_INTEREST, MOLAR_MASS,
                        OPEN_BOUND_CORRECTION, PARTICLE_MASS)
from .mesh import Mesh2D
from .particles import ParticleState
from .xs import CrossSection

# Derived scalar constants (float64 python values; cast at use sites).
_INV_MOLAR = AVOGADROS / MOLAR_MASS
_A = MASS_NO
_AVG_SCATTER_FRAC = (_A * _A + _A + 1.0) / ((_A + 1.0) * (_A + 1.0))
_SPEED_COEF = 2.0 * EV_TO_J / PARTICLE_MASS


@dataclass(frozen=True)
class Geometry:
    """Static geometry of this shard's view of the problem.

    For the replicated-mesh mode every shard sees the whole domain
    (x_off = y_off = 0, nx/ny = global).  The spatially-sharded mode sets
    offsets so tally/density indexing is shard-local while reflection still
    happens at the *global* boundary (reference: omp3/neutral.c:333-369).

    Fast-math fields (TPU has no hardware vector gather, so every avoided
    table read is a big win — see xs.CrossSection.analytic):

    * ``dx``/``dy`` — uniform cell pitches; when nonzero, facet distances
      use ``edge = cell * pitch`` instead of edge-array gathers.
    * ``regions`` — tuple of ``(ix0, ix1, iy0, iy1, density)`` global
      cell-index rectangles (later entries overwrite earlier, background
      0); when set, per-particle density is evaluated by integer range
      tests instead of a gather from the (ny, nx) density grid.  The
      integer bounds are precomputed on host with the exact same
      cell-center float64 math as mesh.build_density, so both paths see
      identical material fields.
    """
    global_nx: int
    global_ny: int
    nx: int            # local density/tally extent
    ny: int
    x_off: int = 0
    y_off: int = 0
    dx: float = 0.0
    dy: float = 0.0
    regions: tuple | None = None
    # RNG stream scheme: "threefry" (omp3/omp4/cuda backends' Threefry-2x64)
    # or "pcg64si" (oacc/raja backends' per-draw-seeded PCG).
    rng_scheme: str = "threefry"
    # Disjoint constant-density cell rectangles covering the whole domain
    # (flight.disjoint_rects) — required by the free-flight engine.
    rects: tuple | None = None
    # The reference's capture.cs and elastic_scatter.cs are byte-identical
    # (SURVEY §2.11); when the loaded tables match, the absorb lookup is
    # the scatter lookup (bitwise — same deterministic function) and the
    # kernels skip one of their three per-event table evaluations.
    same_xs: bool = False


@dataclass(frozen=True)
class EventCounts:
    """u64 event counters carried as uint32 (hi, lo) pairs (TPU-native)."""
    nfacets_hi: jnp.ndarray
    nfacets_lo: jnp.ndarray
    ncollisions_hi: jnp.ndarray
    ncollisions_lo: jnp.ndarray

    @classmethod
    def zeros(cls) -> "EventCounts":
        z = jnp.zeros((), jnp.uint32)
        return cls(z, z, z, z)

    def add(self, nfacets_u32, ncollisions_u32) -> "EventCounts":
        fh, fl = rng._add64(self.nfacets_hi, self.nfacets_lo,
                            jnp.uint32(0), nfacets_u32)
        ch, cl = rng._add64(self.ncollisions_hi, self.ncollisions_lo,
                            jnp.uint32(0), ncollisions_u32)
        return EventCounts(fh, fl, ch, cl)

    def totals(self) -> tuple[int, int]:
        """Host-side (nfacets, ncollisions)."""
        return (int(self.nfacets_hi) * (1 << 32) + int(self.nfacets_lo),
                int(self.ncollisions_hi) * (1 << 32) + int(self.ncollisions_lo))


jax.tree_util.register_pytree_node(
    EventCounts,
    lambda c: ((c.nfacets_hi, c.nfacets_lo, c.ncollisions_hi,
                c.ncollisions_lo), None),
    lambda aux, ch: EventCounts(*ch))



def _c(v, dtype):
    """Scalar literal of the given dtype (numpy scalar).

    Inside Pallas kernels, `jnp.asarray(v, dtype)` materializes a captured
    array constant (rejected by pallas_call); numpy scalars inline as
    jaxpr literals in both XLA and Mosaic tracing.  Traced values pass
    through with a cast (only the Pallas path requires true literals, and
    it passes Python scalars).
    """
    if isinstance(v, (bool, int, float, np.generic)):
        return np.dtype(dtype).type(v)
    return jnp.asarray(v, dtype)

def _macroscopic(density, sig):
    return density * _INV_MOLAR * sig * BARNS


def _density_of(state: ParticleState, mesh: Mesh2D, geom: Geometry,
                lx=None, ly=None):
    """Per-particle material density: analytic region tests or grid gather.

    `lx`/`ly` override the local cell coordinates (spatial decomposition:
    mesh.density is this shard's slab and the offsets are dynamic; the
    caller guarantees out-of-slab lanes are masked, so the clip only
    keeps the gather in bounds).
    """
    if geom.regions is not None:
        dtype = state.dtype
        density = jnp.zeros_like(state.x)
        for (ix0, ix1, iy0, iy1, d) in geom.regions:
            inside = ((state.cellx >= ix0) & (state.cellx < ix1) &
                      (state.celly >= iy0) & (state.celly < iy1))
            density = jnp.where(inside, _c(d, dtype), density)
        return density
    if lx is None:
        lx = state.cellx - geom.x_off
    if ly is None:
        ly = state.celly - geom.y_off
    flat_cell = jnp.clip(ly * geom.nx + lx, 0, geom.nx * geom.ny - 1)
    return mesh.density.reshape(-1)[flat_cell]


def use_local_coords(geom: Geometry, dtype) -> bool:
    """Whether particle x/y are CELL-LOCAL offsets instead of global.

    float32 positions measured from the domain origin resolve a 4000-cell
    mesh to only ~1e-3 of a cell near the far edge, which near-facet
    collisions turn into spurious facet crossings (~100x inflation on the
    scatter problem).  Storing the position relative to the particle's own
    cell keeps resolution at ~1e-7 of a cell everywhere, matching the
    f64/global facet statistics to a few counts.  Enabled for the
    float32 + uniform-mesh fast path; the float64 path keeps global
    coordinates (bit-compatible with the sequential oracle).
    """
    return bool(geom.dx) and jnp.dtype(dtype) == jnp.dtype(jnp.float32)


def _facet_edges(state: ParticleState, mesh: Mesh2D, geom: Geometry):
    """(ex_lo, ex_hi, ey_lo, ey_hi) bounding edges of each particle's cell."""
    if geom.dx:
        dtype = state.dtype
        dx = _c(geom.dx, dtype)
        dy = _c(geom.dy, dtype)
        if use_local_coords(geom, dtype):
            zero = _c(0.0, dtype)
            return zero, dx, zero, dy
        cx = state.cellx.astype(dtype)
        cy = state.celly.astype(dtype)
        return cx * dx, (cx + 1.0) * dx, cy * dy, (cy + 1.0) * dy
    ex_lo = mesh.edgex[jnp.clip(state.cellx, 0, geom.global_nx - 1)]
    ex_hi = mesh.edgex[jnp.clip(state.cellx + 1, 0, geom.global_nx)]
    ey_lo = mesh.edgey[jnp.clip(state.celly, 0, geom.global_ny - 1)]
    ey_hi = mesh.edgey[jnp.clip(state.celly + 1, 0, geom.global_ny)]
    return ex_lo, ex_hi, ey_lo, ey_hi


def _speed_of(energy):
    return jnp.sqrt(_c(_SPEED_COEF, energy.dtype) * energy)


def _heating_response(energy, sig_a, sig_t):
    """Energy deposited per unit (weight * path * macro_total).

    reference: calculate_energy_deposition, omp3/neutral.c:474-495 — the
    average absorption exit energy is 0, so only the scattering term remains.
    """
    absorb_frac = sig_a / sig_t
    avg_exit_scatter = energy * _c(_AVG_SCATTER_FRAC, energy.dtype)
    return energy - (1.0 - absorb_frac) * avg_exit_scatter


@partial(jax.jit, static_argnames=("geom",))
def begin_timestep(state: ParticleState, mesh: Mesh2D, geom: Geometry,
                   scatter_tab: CrossSection, dt: float,
                   master_key, y_off_dyn=None,
                   x_off_dyn=None) -> ParticleState:
    """Per-timestep (re)initialisation.

    Resets the census clock and samples fresh mean-free-paths for every
    surviving particle — the reference does this at the top of every
    handle_particles call with draw counter 0 (omp3/neutral.c:127-131).
    `y_off_dyn`/`x_off_dyn` localize the density gather for spatially
    sharded density slabs (every live lane is on its owner shard at step
    start — censused lanes never cross the slab boundary).
    """
    dtype = state.dtype
    live = ~state.dead

    lx = None if x_off_dyn is None else state.cellx - x_off_dyn
    ly = None if y_off_dyn is None else state.celly - y_off_dyn
    density = _density_of(state, mesh, geom, lx=lx, ly=ly)
    sig_s = scatter_tab.lookup(state.energy)
    mac_s = _macroscopic(density, sig_s)

    r0, _ = rng.uniform2_scheme(state.pid, master_key, jnp.uint32(0),
                                dtype, geom.rng_scheme)
    mfp = -jnp.log(r0) / mac_s

    return ParticleState(
        x=state.x, y=state.y, omega_x=state.omega_x, omega_y=state.omega_y,
        energy=state.energy, weight=state.weight,
        dt_to_census=jnp.where(live, jnp.asarray(dt, dtype),
                               jnp.zeros_like(state.dt_to_census)),
        mfp_to_collision=jnp.where(live, mfp, state.mfp_to_collision),
        deposit=state.deposit,
        cellx=state.cellx, celly=state.celly, dead=state.dead,
        pid=state.pid,
        counter=jnp.ones_like(state.counter),
    )


def event_sweep(state: ParticleState, tally: jnp.ndarray, mesh: Mesh2D,
                geom: Geometry, scatter_tab: CrossSection,
                absorb_tab: CrossSection, master_key,
                inv_ntotal: float,
                y_off_dyn=None,
                x_off_dyn=None) -> tuple[ParticleState, jnp.ndarray,
                                         jnp.ndarray, jnp.ndarray]:
    """Advance every live particle through exactly one event.

    `y_off_dyn` (traced int32 scalar) activates spatial-decomposition mode:
    the tally is a shard-local slab of geom.ny rows starting at global row
    y_off_dyn, and lanes outside the slab are frozen (not live) until the
    chunk-boundary migration exchange moves them to their owner shard
    (parallel/spatial.py).  With y_off_dyn=None (replicated-mesh modes) the
    static geom offsets apply and no lane is ever out of slab.

    Returns (state', tally', nfacets_u32, ncollisions_u32).
    """
    state, flush, flat_cell, contrib, is_facet, is_coll = sweep_core(
        state, mesh, geom, scatter_tab, absorb_tab, master_key, inv_ntotal,
        tally.dtype, y_off_dyn=y_off_dyn, x_off_dyn=x_off_dyn)

    # ---- tally flush (reference flush sites: omp3/neutral.c:248-250,
    # 325-327, 400-402; scatter-add replaces the reference's atomics).
    # Collision-dominated sweeps often have ZERO flushing lanes (collisions
    # don't flush), and XLA's TPU scatter costs the same whether or not
    # values are zero — so the whole scatter is skipped when nothing
    # flushes.
    tally = lax.cond(
        jnp.any(flush),
        lambda t: t.at[flat_cell].add(contrib, mode="promise_in_bounds"),
        lambda t: t,
        tally)

    nfacets = jnp.count_nonzero(is_facet).astype(jnp.uint32)
    ncollisions = jnp.count_nonzero(is_coll).astype(jnp.uint32)
    return state, tally, nfacets, ncollisions


def collision_physics(state: ParticleState, geom: Geometry,
                      scatter_tab: CrossSection, master_key, is_coll,
                      mac_a, mac_t, number_density):
    """Collision event physics (reference: omp3/neutral.c:209-300).

    Shared verbatim by the facet-stepping sweep (sweep_core) and the
    free-flight engine (flight.flight_core) so the two cannot drift:
    absorption (weight reduction + MIN_ENERGY death), elastic scatter
    (CoM angle, MASS_NO kinematics, lab-frame rotation), cross-section
    refresh at the new energy, and the mean-free-path re-sample — with
    the per-lane RNG counter advancing exactly as the reference's
    sequential history loop would (2 draws per collision:
    omp3/neutral.c:234,294).

    Returns (omega_x, omega_y, energy, weight, died, coll_alive, mfp,
    counter); mfp is re-sampled where coll_alive else passed through.
    """
    dtype = state.dtype
    zero = _c(0.0, dtype)
    p_absorb = mac_a / mac_t
    rn1a, rn1b = rng.uniform2_scheme(state.pid, master_key, state.counter,
                                     dtype, geom.rng_scheme)
    absorbed = rn1a < p_absorb
    weight = jnp.where(is_coll & absorbed,
                       state.weight * (1.0 - p_absorb), state.weight)
    died = is_coll & absorbed & (state.energy
                                 < _c(MIN_ENERGY_OF_INTEREST, dtype))

    a = _c(_A, dtype)
    mu_cm = 1.0 - 2.0 * rn1b
    e_new = state.energy * (a * a + 2.0 * a * mu_cm + 1.0) / ((a + 1.0)
                                                              * (a + 1.0))
    cos_t = 0.5 * ((a + 1.0) * jnp.sqrt(e_new / state.energy)
                   - (a - 1.0) * jnp.sqrt(state.energy / e_new))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, zero))
    scattered = is_coll & (~absorbed)
    omega_x = jnp.where(scattered,
                        state.omega_x * cos_t - state.omega_y * sin_t,
                        state.omega_x)
    omega_y = jnp.where(scattered,
                        state.omega_x * sin_t + state.omega_y * cos_t,
                        state.omega_y)
    energy = jnp.where(scattered, e_new, state.energy)

    counter = state.counter + is_coll.astype(jnp.uint32)

    # Re-sample mean free paths for surviving collisions, using the
    # post-collision energy's scattering cross-section in the same cell.
    sig_s2 = scatter_tab.lookup(energy)
    mac_s2 = number_density * sig_s2 * _c(BARNS, dtype)
    rn2a, _ = rng.uniform2_scheme(state.pid, master_key, counter, dtype,
                                  geom.rng_scheme)
    coll_alive = is_coll & (~died)
    counter = counter + coll_alive.astype(jnp.uint32)
    mfp = jnp.where(coll_alive, -jnp.log(rn2a) / mac_s2,
                    state.mfp_to_collision)
    return omega_x, omega_y, energy, weight, died, coll_alive, mfp, counter


def sweep_core(state: ParticleState, mesh, geom: Geometry,
               scatter_tab: CrossSection, absorb_tab: CrossSection,
               master_key, inv_ntotal: float, tally_dtype,
               y_off_dyn=None, gate=None, x_off_dyn=None, density=None):
    """One event per live lane — pure math, no tally scatter.

    Shape-agnostic over the lane arrays (works on (N,) in XLA-land and on
    (rows, 128) VMEM tiles inside the Pallas kernel — pallas_sweep.py).
    `gate` (optional bool mask) pauses lanes externally — e.g. lanes whose
    pending-flush ring is full; paused lanes are bitwise-frozen, exactly
    like out-of-slab lanes in spatial mode.
    `density` (optional per-lane array) overrides the material lookup —
    the Mosaic grid mode carries each lane's cell density into the kernel
    instead of gathering from the (ny, nx) grid (pallas_sweep grid mode).
    Returns (state', flush_mask, flat_cell, tally_contrib, is_facet,
    is_coll); the caller owns the tally update and count reductions.
    """
    dtype = state.dtype
    zero = _c(0.0, dtype)
    live = (~state.dead) & (state.dt_to_census > zero)
    if gate is not None:
        live = live & gate

    # ---- local material state (pure function of particle state) ----------
    if x_off_dyn is None:
        lx = state.cellx - geom.x_off
    else:
        lx = state.cellx - x_off_dyn
        live = live & (lx >= 0) & (lx < geom.nx)
    if y_off_dyn is None:
        ly = state.celly - geom.y_off
    else:
        ly = state.celly - y_off_dyn
        live = live & (ly >= 0) & (ly < geom.ny)
    flat_cell = jnp.clip(ly * geom.nx + lx, 0, geom.nx * geom.ny - 1)
    if density is None:
        density = _density_of(state, mesh, geom, lx=lx, ly=ly)
    sig_s = scatter_tab.lookup(state.energy)
    sig_a = sig_s if geom.same_xs else absorb_tab.lookup(state.energy)
    sig_t = sig_s + sig_a
    number_density = density * _c(_INV_MOLAR, dtype)
    mac_s = number_density * sig_s * _c(BARNS, dtype)
    mac_a = number_density * sig_a * _c(BARNS, dtype)
    mac_t = mac_s + mac_a
    cell_mfp = 1.0 / mac_t
    speed = _speed_of(state.energy)

    # ---- three candidate distances (reference: omp3/neutral.c:423-471) ----
    ex_lo, ex_hi, ey_lo, ey_hi = _facet_edges(state, mesh, geom)
    obc = _c(OPEN_BOUND_CORRECTION, dtype)
    u_x_inv = 1.0 / (state.omega_x * speed)
    u_y_inv = 1.0 / (state.omega_y * speed)
    dt_x = jnp.where(state.omega_x >= zero,
                     (ex_hi - state.x) * u_x_inv,
                     (ex_lo - obc - state.x) * u_x_inv)
    dt_y = jnp.where(state.omega_y >= zero,
                     (ey_hi - state.y) * u_y_inv,
                     (ey_lo - obc - state.y) * u_y_inv)
    x_facet = dt_x < dt_y
    d_facet = jnp.where(x_facet, dt_x, dt_y) * speed

    d_coll = state.mfp_to_collision * cell_mfp
    d_census = speed * state.dt_to_census

    is_coll = (d_coll < d_facet) & (d_coll < d_census) & live
    is_facet = (~is_coll) & (d_facet < d_census) & live
    is_census = live & (~is_coll) & (~is_facet)

    dist = jnp.where(is_coll, d_coll, jnp.where(is_facet, d_facet, d_census))

    # ---- segment energy deposition (pre-event state) ----------------------
    ed = (state.weight * dist * (sig_t * _c(BARNS, dtype))
          * _heating_response(state.energy, sig_a, sig_t) * number_density)
    deposit = state.deposit + jnp.where(live, ed, zero)

    # ---- move to the event site -------------------------------------------
    x = state.x + jnp.where(live, dist * state.omega_x, zero)
    y = state.y + jnp.where(live, dist * state.omega_y, zero)

    # ---- collision branch (reference: omp3/neutral.c:209-300) -------------
    (omega_x, omega_y, energy, weight, died, coll_alive, mfp,
     counter) = collision_physics(state, geom, scatter_tab, master_key,
                                  is_coll, mac_a, mac_t, number_density)
    dt_to_census = state.dt_to_census - jnp.where(is_coll, d_coll / speed,
                                                  zero)

    # ---- facet branch (reference: omp3/neutral.c:303-380) ------------------
    mfp = jnp.where(is_facet, mfp - d_facet / cell_mfp, mfp)
    dt_to_census = dt_to_census - jnp.where(is_facet, d_facet / speed, zero)

    # ---- census branch (reference: omp3/neutral.c:383-405) -----------------
    mfp = jnp.where(is_census, mfp - d_census / cell_mfp, mfp)
    dt_to_census = jnp.where(is_census, zero, dt_to_census)

    # ---- tally flush: leaving a cell, dying, or reaching census ------------
    flush = is_facet | is_census | died
    contrib = jnp.where(flush, deposit, zero).astype(tally_dtype)
    contrib = contrib * _c(inv_ntotal, tally_dtype)
    deposit = jnp.where(flush, zero, deposit)

    # ---- facet cell transition / boundary reflection ------------------------
    fx = is_facet & x_facet
    fy = is_facet & (~x_facet)
    pos_x = omega_x > zero
    neg_x = omega_x < zero
    pos_y = omega_y > zero
    neg_y = omega_y < zero
    refl_x = (fx & pos_x & (state.cellx >= geom.global_nx - 1)) | \
             (fx & neg_x & (state.cellx <= 0))
    refl_y = (fy & pos_y & (state.celly >= geom.global_ny - 1)) | \
             (fy & neg_y & (state.celly <= 0))
    step_x = (fx & pos_x & (state.cellx < geom.global_nx - 1)).astype(jnp.int32) \
        - (fx & neg_x & (state.cellx > 0)).astype(jnp.int32)
    step_y = (fy & pos_y & (state.celly < geom.global_ny - 1)).astype(jnp.int32) \
        - (fy & neg_y & (state.celly > 0)).astype(jnp.int32)
    omega_x = jnp.where(refl_x, -omega_x, omega_x)
    omega_y = jnp.where(refl_y, -omega_y, omega_y)
    cellx = state.cellx + step_x
    celly = state.celly + step_y
    if use_local_coords(geom, dtype):
        # Re-base the cell-local position onto the new cell.
        x = x - step_x.astype(dtype) * _c(geom.dx, dtype)
        y = y - step_y.astype(dtype) * _c(geom.dy, dtype)

    dead = state.dead | died

    new_state = ParticleState(
        x=x, y=y, omega_x=omega_x, omega_y=omega_y, energy=energy,
        weight=weight, dt_to_census=dt_to_census, mfp_to_collision=mfp,
        deposit=deposit, cellx=cellx, celly=celly, dead=dead,
        pid=state.pid, counter=counter)
    return new_state, flush, flat_cell, contrib, is_facet, is_coll


def working_mask(state: ParticleState, geom: Geometry, y_off_dyn=None,
                 x_off_dyn=None):
    """Lanes with events left to process on THIS shard this chunk."""
    w = (~state.dead) & (state.dt_to_census > 0)
    if y_off_dyn is not None:
        ly = state.celly - y_off_dyn
        w = w & (ly >= 0) & (ly < geom.ny)
    if x_off_dyn is not None:
        lx = state.cellx - x_off_dyn
        w = w & (lx >= 0) & (lx < geom.nx)
    return w


@partial(jax.jit, static_argnames=("geom", "max_sweeps", "events_per_sweep"))
def sweep_chunk(state: ParticleState, tally: jnp.ndarray,
                counts: EventCounts, mesh: Mesh2D,
                scatter_tab: CrossSection, absorb_tab: CrossSection,
                geom: Geometry, master_key, inv_ntotal: float,
                max_sweeps: int, events_per_sweep: int = 1,
                y_off_dyn=None, x_off_dyn=None):
    """Run up to `max_sweeps` event sweeps in ONE device dispatch.

    Bounding the while_loop per dispatch keeps each XLA execution short —
    long censuses (stream needs thousands of sweeps) are then host-chained
    chunks instead of one multi-minute device program, giving progress
    visibility and robustness against RPC deadlines on remote TPU links.
    In spatial mode (y_off_dyn set) lanes that leave the shard's slab
    freeze and the chunk ends when only frozen lanes remain; the caller
    migrates them.  Returns (state, tally, counts, nsweeps_done, n_work)
    — n_work the working-lane count (saves the caller a live_count
    dispatch; >0 means more chunks are needed).
    """
    def cond(carry):
        s, _, _, it = carry
        return (jnp.any(working_mask(s, geom, y_off_dyn, x_off_dyn))
                & (it < max_sweeps))

    def body(carry):
        s, t, c, it = carry
        for _ in range(events_per_sweep):
            s, t, nf, nc = event_sweep(s, t, mesh, geom, scatter_tab,
                                       absorb_tab, master_key, inv_ntotal,
                                       y_off_dyn=y_off_dyn,
                                       x_off_dyn=x_off_dyn)
            c = c.add(nf, nc)
        return (s, t, c, it + 1)

    carry = (state, tally, counts, jnp.zeros((), jnp.int32))
    state, tally, counts, nsweeps = lax.while_loop(cond, body, carry)
    n_work = jnp.count_nonzero(
        working_mask(state, geom, y_off_dyn, x_off_dyn)).astype(jnp.int32)
    return state, tally, counts, nsweeps * events_per_sweep, n_work


@partial(jax.jit, static_argnames=("geom", "max_sweeps", "events_per_sweep"))
def run_timestep(state: ParticleState, tally: jnp.ndarray, mesh: Mesh2D,
                 scatter_tab: CrossSection, absorb_tab: CrossSection,
                 geom: Geometry, dt: float, master_key, inv_ntotal: float,
                 max_sweeps: int = 1_000_000, events_per_sweep: int = 1):
    """One full census timestep in a single dispatch (small problems/tests).

    Equivalent of the reference's solve_transport_2d/handle_particles
    (omp3/neutral.c:19-206) for one batch.  Returns
    (state, tally, counts, nprocessed, nsweeps).  Production paths chunk
    instead: begin_timestep + host-looped sweep_chunk (driver.py).
    """
    state = begin_timestep(state, mesh, geom, scatter_tab, dt, master_key)
    nprocessed = jnp.count_nonzero(~state.dead).astype(jnp.uint32)
    state, tally, counts, nsweeps, _ = sweep_chunk(
        state, tally, EventCounts.zeros(), mesh, scatter_tab, absorb_tab,
        geom, master_key, inv_ntotal, max_sweeps, events_per_sweep)
    return state, tally, counts, nprocessed, nsweeps
