"""Particle state (SoA pytree) and source injection.

The reference's Particle struct (AoS and SoA variants,
/root/reference/neutral_data.h:45-81) maps to a pytree of (N,) arrays — the
TPU-native SoA layout.  Extra fields relative to the reference:

  * pid      — immutable global particle id; the RNG stream key.  Making it
               explicit (instead of "array index") keeps histories bitwise
               stable under compaction, sorting and sharding.
  * counter  — per-history RNG draw counter for the current timestep.  Each
               lane consumes a different number of draws, so the counter must
               be per-lane state for vectorized sweeps to reproduce the
               reference's sequential streams (omp3/neutral.c:122-131).
  * deposit  — energy deposition accumulated since the last tally flush
               (the reference keeps this in a thread-local scalar,
               omp3/neutral.c:118).
"""

from __future__ import annotations

from dataclasses import dataclass, fields
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import rng
from .mesh import Mesh2D


@jax.tree_util.register_pytree_node_class
@dataclass
class ParticleState:
    x: jnp.ndarray
    y: jnp.ndarray
    omega_x: jnp.ndarray
    omega_y: jnp.ndarray
    energy: jnp.ndarray
    weight: jnp.ndarray
    dt_to_census: jnp.ndarray
    mfp_to_collision: jnp.ndarray
    deposit: jnp.ndarray
    cellx: jnp.ndarray          # int32, global cell index
    celly: jnp.ndarray          # int32
    dead: jnp.ndarray           # bool
    pid: jnp.ndarray            # uint32
    counter: jnp.ndarray        # uint32

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @property
    def dtype(self):
        return self.x.dtype


@jax.jit
def live_count(state: ParticleState) -> jnp.ndarray:
    """Number of lanes still alive AND short of census (work remaining)."""
    return jnp.count_nonzero((~state.dead) & (state.dt_to_census > 0))


@partial(jax.jit, static_argnames=("new_size",))
def select_working(state: ParticleState, new_size: int):
    """Pack still-working lanes into a `new_size` slice; returns (part, sel).

    Monte Carlo histories are keyed by the immutable `pid`, not the lane
    index (the counter-based RNG scheme), so reordering/slicing lanes
    changes NOTHING physically — tallies and event counts stay bitwise
    identical.  This is the load-balancing move the reference's
    history-based loop gets implicitly from dynamic thread scheduling:
    without it, dead/censused lanes cost full sweep bandwidth forever.

    Caller must ensure new_size >= live_count(state); culled lanes keep
    their state in the caller's full copy and are merged back with
    merge_compacted before the next timestep.
    """
    n = state.dead.shape[0]
    working = (~state.dead) & (state.dt_to_census > 0)
    # Packed working-lane indices (cumsum-based; ~5x cheaper than the
    # argsort partition at 10M lanes).  Unfilled slots get the sentinel n:
    # their lanes gather lane n-1's state but are forced dead, and
    # merge_compacted drops sentinel writes, so they are inert padding.
    sel = jnp.nonzero(working, size=new_size, fill_value=n)[0]
    part = jax.tree_util.tree_map(
        lambda a: a[jnp.minimum(sel, n - 1)], state)
    part = ParticleState(**{**{f: getattr(part, f)
                               for f in part.__dataclass_fields__},
                            "dead": part.dead | (sel >= n)})
    return part, sel


@partial(jax.jit, static_argnames=("new_size",))
def select_working_padded(state: ParticleState, new_size: int):
    """select_working variant whose padding slots map to real dead lanes.

    The spatial decompositions receive MIGRATED particles into free (dead)
    slots while compacted; plain select_working pads with a sentinel that
    merge_compacted drops, which would silently lose such arrivals.  Here
    every part slot maps to a distinct full lane: working lanes first,
    then dead lanes as the free pool — so merge_compacted writes arrivals
    back losslessly.  Requires new_size >= working count (caller ensures
    via the compaction target) and new_size <= n.
    """
    n = state.dead.shape[0]
    working = (~state.dead) & (state.dt_to_census > 0)
    nwork = jnp.count_nonzero(working).astype(jnp.int32)
    ndead = jnp.count_nonzero(state.dead).astype(jnp.int32)
    sel_work = jnp.nonzero(working, size=new_size, fill_value=n)[0]
    sel_dead = jnp.nonzero(state.dead, size=new_size, fill_value=n)[0]
    slot = jnp.arange(new_size, dtype=jnp.int32)
    is_work = slot < nwork
    # Free pool: real dead husks only (censused-but-alive lanes must stay
    # intact in `full`).  Slots past the husk supply become INERT: neither
    # working (dt=0) nor free (dead=False), and their sentinel index is
    # dropped by merge_compacted.
    fill_ok = (slot - nwork) < ndead
    fill = sel_dead[jnp.clip(slot - nwork, 0, new_size - 1)]
    sel = jnp.where(is_work, sel_work,
                    jnp.where(fill_ok, fill, n)).astype(jnp.int32)
    part = jax.tree_util.tree_map(
        lambda a: a[jnp.minimum(sel, n - 1)], state)
    inert = (~is_work) & (~fill_ok)
    fields = {f: getattr(part, f) for f in part.__dataclass_fields__}
    fields["dead"] = jnp.where(inert, False, part.dead)
    fields["dt_to_census"] = jnp.where(inert,
                                       jnp.zeros_like(part.dt_to_census),
                                       part.dt_to_census)
    return ParticleState(**fields), sel


@jax.jit
def merge_compacted(full: ParticleState, part: ParticleState,
                    sel_idx) -> ParticleState:
    """Write a compacted slice's lanes back into the full state.

    Sentinel indices (== full lane count, from select_working's padding)
    are dropped.
    """
    return jax.tree_util.tree_map(
        lambda f, p: f.at[sel_idx].set(p, mode="drop"), full, part)


def _find_cell(edges, pos, ncells: int, extent: float, uniform: bool):
    """Index i with edges[i] <= pos < edges[i+1], clipped to [0, ncells-1].

    Semantics of the reference's edge scan (omp3/neutral.c:589-607) /
    jnp.searchsorted(side="right") - 1.  `uniform` selects the O(1)
    floor-division path (exact: the +-1 fixup compares against the stored
    edge values, so builder rounding cannot shift the result).
    """
    if not uniform:
        return jnp.clip(jnp.searchsorted(edges, pos, side="right") - 1,
                        0, ncells - 1).astype(jnp.int32)
    dtype = pos.dtype
    inv = np.dtype(dtype).type(np.float64(ncells) / np.float64(extent))
    cand = jnp.clip(jnp.floor(pos * inv).astype(jnp.int32), 0, ncells - 1)
    lo = edges[cand]
    hi = edges[cand + 1]
    cand = cand + (pos >= hi).astype(jnp.int32) - (pos < lo).astype(jnp.int32)
    return jnp.clip(cand, 0, ncells - 1)


def source_cells(mesh: Mesh2D, pid, *, source_x0: float, source_y0: float,
                 source_width: float, source_height: float, dtype,
                 rng_scheme: str = "threefry"):
    """(x, y, cellx, celly) of the injection draws for the given pids.

    Pure function of pid (the RNG stream key), so ANY shard can re-derive
    where any particle is born without communicating — the device-side
    answer to the reference's per-rank source-window arithmetic
    (neutral_data.c:64-95).  Position from draw (pid, 0, counter=0); cell
    from the edge search (omp3/neutral.c:589-607 semantics).
    """
    dtype = jnp.dtype(dtype)
    # Draws use master_key=0: injection happens before the first timestep.
    # (Under pcg64si the pair at counter c maps to per-draw seeds 2c, 2c+1,
    # so position/angle use seeds 0,1,2 — exactly the oacc/raja backends'
    # injection counters, oacc/neutral.c:644-675.)
    r0a, r0b = rng.uniform2_scheme(pid, jnp.uint32(0), jnp.uint32(0), dtype,
                                   rng_scheme)
    x = jnp.asarray(source_x0, dtype) + r0a * jnp.asarray(source_width, dtype)
    y = jnp.asarray(source_y0, dtype) + r0b * jnp.asarray(source_height, dtype)

    # Cell search over the (possibly non-uniform) edge arrays — equivalent to
    # the reference's linear scan with [edge[i], edge[i+1]) membership.
    # Uniform meshes take an O(1) path: floor-divide to a candidate, then
    # one gather of the candidate's bounding edges corrects any float
    # rounding against the STORED edge values — bitwise identical to the
    # searchsorted result (12 gather rounds -> 2) and ~6x faster at 10M.
    cellx = _find_cell(mesh.edgex, x, mesh.nx, mesh.width, mesh.uniform)
    celly = _find_cell(mesh.edgey, y, mesh.ny, mesh.height, mesh.uniform)
    return x, y, cellx, celly


def inject_fields(mesh: Mesh2D, pid, alive, *, source_x0: float,
                  source_y0: float, source_width: float,
                  source_height: float, initial_energy: float, dt: float,
                  dtype=jnp.float32, rng_scheme: str = "threefry",
                  local_coords: tuple[float, float] | None = None,
                  zero_padding: bool = False) -> ParticleState:
    """Injection state for an explicit pid vector + alive mask.

    The pid-keyed core shared by the global injector (inject_particles)
    and the per-shard partitioned injector (parallel.spatial): histories
    are keyed by pid alone, so WHICH lanes hold WHICH pids is free to vary
    by decomposition without changing any physics.  `zero_padding` zeroes
    every field of dead lanes (matching the packed-buffer convention of
    the spatial drivers' partition layout).
    """
    dtype = jnp.dtype(dtype)
    x, y, cellx, celly = source_cells(
        mesh, pid, source_x0=source_x0, source_y0=source_y0,
        source_width=source_width, source_height=source_height,
        dtype=dtype, rng_scheme=rng_scheme)

    if local_coords is not None:
        dx, dy = local_coords
        x = jnp.clip(x - cellx.astype(dtype) * np.dtype(dtype).type(dx),
                     0.0, np.dtype(dtype).type(dx))
        y = jnp.clip(y - celly.astype(dtype) * np.dtype(dtype).type(dy),
                     0.0, np.dtype(dtype).type(dy))

    r1a, _ = rng.uniform2_scheme(pid, jnp.uint32(0), jnp.uint32(1), dtype,
                                 rng_scheme)
    theta = jnp.asarray(2.0 * np.pi, dtype) * r1a
    omega_x = jnp.cos(theta)
    omega_y = jnp.sin(theta)

    zeros = jnp.zeros(pid.shape, dtype)
    if zero_padding:
        x = jnp.where(alive, x, zeros)
        y = jnp.where(alive, y, zeros)
        omega_x = jnp.where(alive, omega_x, zeros)
        omega_y = jnp.where(alive, omega_y, zeros)
        cellx = jnp.where(alive, cellx, 0)
        celly = jnp.where(alive, celly, 0)
        pid = jnp.where(alive, pid, jnp.uint32(0))
    return ParticleState(
        x=x, y=y, omega_x=omega_x, omega_y=omega_y,
        energy=jnp.where(alive, jnp.asarray(initial_energy, dtype), zeros),
        weight=jnp.where(alive, jnp.ones(pid.shape, dtype), zeros),
        dt_to_census=jnp.where(alive, jnp.asarray(dt, dtype), zeros),
        mfp_to_collision=zeros,
        deposit=zeros,
        cellx=cellx, celly=celly,
        dead=~alive,
        pid=pid,
        counter=jnp.zeros(pid.shape, jnp.uint32),
    )


@partial(jax.jit,
         static_argnames=("nparticles", "source_x0", "source_y0",
                          "source_width", "source_height", "initial_energy",
                          "dt", "dtype", "pid_offset", "pad_to",
                          "rng_scheme", "local_coords"))
def inject_particles(mesh: Mesh2D, *, nparticles: int, source_x0: float,
                     source_y0: float, source_width: float,
                     source_height: float, initial_energy: float, dt: float,
                     dtype=jnp.float32, pid_offset: int = 0,
                     pad_to: int | None = None,
                     rng_scheme: str = "threefry",
                     local_coords: tuple[float, float] | None = None
                     ) -> ParticleState:
    """Vectorized source injection.

    Reproduces the reference's init (omp3/neutral.c:576-625): position from
    draw (pid, 0, counter=0), cell from an edge search, isotropic angle
    theta = 2*pi*rn from draw (pid, 0, counter=1), unit weight, zero mean
    free paths.  `pad_to` grows the arrays with dead padding lanes so shard
    sizes can be made equal across devices.

    Source geometry arguments are in *physical* coordinates (the caller
    multiplies the deck's fractional box by the domain extent).
    `local_coords=(dx, dy)` stores x/y as cell-local offsets (the f32
    fast-path representation — transport.use_local_coords).
    """
    n = int(nparticles)
    total = int(pad_to) if pad_to is not None else n
    if total < n:
        raise ValueError("pad_to must be >= nparticles")

    pid = (jnp.arange(total, dtype=jnp.uint32) + np.uint32(pid_offset))
    alive = jnp.arange(total) < n
    return inject_fields(
        mesh, pid, alive, source_x0=source_x0, source_y0=source_y0,
        source_width=source_width, source_height=source_height,
        initial_energy=initial_energy, dt=dt, dtype=dtype,
        rng_scheme=rng_scheme, local_coords=local_coords)
