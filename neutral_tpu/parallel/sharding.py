"""Particle-parallel transport over a JAX device mesh.

The reference scales over MPI ranks with a spatially-decomposed mesh but (on
`master`) tracks every particle against the *global* mesh and never migrates
particles — its distribution reduces to: shard particles, replicate the mesh,
sum tallies at the end (reference: main.c:62-75, stubbed send_and_mark_particle
at cuda/neutral.cu:133, global reduce at omp3/neutral.c:530).

The TPU-native formulation makes that explicit and collective-minimal:

  * particle SoA arrays are sharded over the mesh axis "p" (pure data
    parallelism over ICI-connected chips),
  * mesh edges / density / cross-section tables are replicated (they are
    read-only and small relative to particle state),
  * each shard owns a private partial tally row — shape (nshards, ncells)
    sharded on axis 0 — so the hot loop runs with ZERO collectives; the
    single `psum`-equivalent reduction happens once, at validation/output
    time, exactly like the reference's final MPI_Allreduce.

Each shard's `lax.while_loop` also terminates independently: a shard whose
particles all hit census early stops sweeping without waiting for stragglers
on other chips — free load-balancing slack the lockstep reference never had.

Built on `shard_map` so the per-shard program is the *same* single-chip
`run_timestep` used everywhere else (one code path to test).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import driver as driver_mod
from .. import transport
from ..config import SimConfig
from ..mesh import Mesh2D
from ..particles import ParticleState, inject_particles
from ..transport import Geometry, run_timestep
from ..xs import CrossSection


from .common import (_CTRL_MAXLIVE, _read_ctrl,  # noqa: F401  (re-export)
                     _state_spec, combine_count_rows)
from .flight_sharded import FlightDecomposedMixin


def make_device_mesh(n_devices: int | None = None,
                     axis_name: str = "p") -> Mesh:
    """1D device mesh over all (or the first n) visible devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


@partial(jax.jit,
         static_argnames=("geom", "mesh_axes", "events_per_sweep",
                          "max_sweeps"))
def run_timestep_sharded(state: ParticleState, tally_parts: jnp.ndarray,
                         mesh2d: Mesh2D, scatter_tab: CrossSection,
                         absorb_tab: CrossSection, geom: Geometry,
                         dt: float, master_key, inv_ntotal: float,
                         mesh_axes: Mesh, events_per_sweep: int = 1,
                         max_sweeps: int = 1_000_000):
    """One full census timestep over the device mesh (single dispatch).

    `tally_parts` has shape (nshards, ncells), sharded on axis 0; row i is
    shard i's private partial tally.  Returns (state', tally_parts', counts,
    nprocessed, nsweeps) with counts/nprocessed/nsweeps globally reduced.
    Production paths chunk instead (sweep_chunk_sharded via
    ShardedSimulation.step) to bound dispatch length.
    """
    axis = mesh_axes.axis_names[0]
    pspec = _state_spec(axis)

    def shard_fn(s: ParticleState, t_row, m2d, stab, atab):
        # t_row: (1, ncells) — this shard's private partial tally.
        s, t, counts, nproc, nsweeps = run_timestep(
            s, t_row[0], m2d, stab, atab, geom, dt, master_key,
            inv_ntotal, max_sweeps=max_sweeps,
            events_per_sweep=events_per_sweep)
        nproc = jax.lax.psum(nproc.astype(jnp.uint32), axis)
        nsweeps = jax.lax.pmax(nsweeps, axis)
        counts = jax.tree_util.tree_map(
            lambda c: jax.lax.psum(c.astype(jnp.uint32), axis), counts)
        return s, t[None, :], counts, nproc, nsweeps

    fn = shard_map(
        shard_fn, mesh=mesh_axes,
        in_specs=(pspec, P(axis, None), P(), P(), P()),
        out_specs=(pspec, P(axis, None), P(), P(), P()),
        check_vma=False)
    return fn(state, tally_parts, mesh2d, scatter_tab, absorb_tab)


@partial(jax.jit, static_argnames=("geom", "mesh_axes"))
def begin_timestep_sharded(state: ParticleState, mesh2d: Mesh2D,
                           scatter_tab: CrossSection, geom: Geometry,
                           dt: float, master_key, mesh_axes: Mesh):
    """Per-timestep reinit of every shard + global live-particle count."""
    axis = mesh_axes.axis_names[0]
    pspec = _state_spec(axis)

    def shard_fn(s, m2d, stab):
        s = transport.begin_timestep(s, m2d, geom, stab, dt, master_key)
        nproc = jax.lax.psum(
            jnp.count_nonzero(~s.dead).astype(jnp.uint32), axis)
        return s, nproc

    fn = shard_map(shard_fn, mesh=mesh_axes,
                   in_specs=(pspec, P(), P()),
                   out_specs=(pspec, P()), check_vma=False)
    return fn(state, mesh2d, scatter_tab)


@partial(jax.jit,
         static_argnames=("geom", "mesh_axes", "max_sweeps",
                          "events_per_sweep"))
def sweep_chunk_sharded(state: ParticleState, tally_parts: jnp.ndarray,
                        mesh2d: Mesh2D, scatter_tab: CrossSection,
                        absorb_tab: CrossSection, geom: Geometry,
                        master_key, inv_ntotal: float, mesh_axes: Mesh,
                        max_sweeps: int, events_per_sweep: int = 1):
    """Bounded sweep chunk over the device mesh (one dispatch).

    Each shard sweeps until its own particles finish or the bound is hit —
    no lockstep between shards inside a chunk.  Returns
    (state, tally_parts, ctrl) — ctrl the replicated control vector
    (common._pack_ctrl: done, maxlive over shards, plus every shard's
    64-bit count halves), read with ONE host fetch via _read_ctrl.
    """
    from ..transport import EventCounts
    from .common import _pack_ctrl

    axis = mesh_axes.axis_names[0]
    pspec = _state_spec(axis)

    def shard_fn(s, t_row, m2d, stab, atab):
        s, t, c, nsweeps, live = transport.sweep_chunk(
            s, t_row[0], EventCounts.zeros(), m2d, stab, atab, geom,
            master_key, inv_ntotal, max_sweeps,
            events_per_sweep=events_per_sweep)
        ctrl = _pack_ctrl(axis, c, done=jax.lax.pmax(nsweeps, axis),
                          work=None, err=None, maxlive=live)
        return s, t[None, :], ctrl

    fn = shard_map(
        shard_fn, mesh=mesh_axes,
        in_specs=(pspec, P(axis, None), P(), P(), P()),
        out_specs=(pspec, P(axis, None), P()),
        check_vma=False)
    return fn(state, tally_parts, mesh2d, scatter_tab, absorb_tab)


@partial(jax.jit,
         static_argnames=("geom", "inv_ntotal", "mesh_axes", "max_sweeps",
                          "k_events"),
         donate_argnums=(0, 1, 2, 3, 4))
def pallas_sweep_chunk_sharded(state: ParticleState, tally_parts,
                               ring_cell, ring_val, ring_cnt,
                               scatter_tab: CrossSection,
                               absorb_tab: CrossSection, geom: Geometry,
                               master_key, inv_ntotal: float,
                               mesh_axes: Mesh, max_sweeps: int,
                               k_events: int = 8, scatter_layout=None,
                               absorb_layout=None, density_grid=None):
    """Fused-Pallas sweep chunk over the device mesh (TPU multi-chip path).

    Each shard runs the same pallas_sweep_chunk as the single-chip driver
    on its particle slab and private tally row; pending-flush rings are
    sharded alongside the lanes and persist across chunks (the caller
    drains via drain_rings_sharded before compaction/step end).  Returns
    (state, tally_parts, rings..., ctrl) with ctrl the replicated
    control vector (one host fetch per chunk — see common._pack_ctrl).
    """
    from ..pallas_sweep import pallas_sweep_chunk
    from ..transport import EventCounts
    from .common import _pack_ctrl

    axis = mesh_axes.axis_names[0]
    pspec = _state_spec(axis)

    def shard_fn(s, t_row, rc, rv, rn):
        # Table layouts (arbitrary-cs decks) ride in by closure —
        # replicated small arrays; each shard derives its own energy band.
        (s, t, c, rc, rv, rn, done, live) = pallas_sweep_chunk(
            s, t_row[0], EventCounts.zeros(), rc, rv, rn, scatter_tab,
            absorb_tab, geom, master_key, inv_ntotal, max_sweeps,
            k_events=k_events, scatter_layout=scatter_layout,
            absorb_layout=absorb_layout, density_grid=density_grid)
        ctrl = _pack_ctrl(axis, c, done=jax.lax.pmax(done, axis),
                          work=None, err=None, maxlive=live)
        return s, t[None, :], rc, rv, rn, ctrl

    fn = shard_map(
        shard_fn, mesh=mesh_axes,
        in_specs=(pspec, P(axis, None), P(None, axis), P(None, axis),
                  P(axis)),
        out_specs=(pspec, P(axis, None), P(None, axis),
                   P(None, axis), P(axis), P()),
        check_vma=False)
    return fn(state, tally_parts, ring_cell, ring_val, ring_cnt)


@partial(jax.jit, static_argnames=("mesh_axes",))
def max_live_sharded(state: ParticleState, mesh_axes: Mesh):
    """Max over shards of the per-shard working-lane count.

    The compaction target must be one static size across the SPMD program,
    so the ladder keys on the worst-loaded shard.  Works on 1D and 2D
    device meshes (reduces over every mesh axis).
    """
    from ..particles import live_count

    axes = mesh_axes.axis_names

    def shard_fn(s):
        return jax.lax.pmax(live_count(s).astype(jnp.int32), axes)

    fn = shard_map(shard_fn, mesh=mesh_axes, in_specs=(_state_spec(axes),),
                   out_specs=P(), check_vma=False)
    return fn(state)


@partial(jax.jit, static_argnames=("new_size", "mesh_axes"))
def select_working_sharded(state: ParticleState, new_size: int,
                           mesh_axes: Mesh):
    """Per-shard select_working to a common static per-shard size.

    Returns (part, sel) with part sharded like state and sel carrying each
    shard's local lane indices (sentinel = local slab length, dropped by
    merge).  Caller must ensure new_size >= max_live_sharded(state).
    """
    from ..particles import select_working

    axes = mesh_axes.axis_names
    pspec = _state_spec(axes)
    fn = shard_map(lambda s: select_working(s, new_size), mesh=mesh_axes,
                   in_specs=(pspec,), out_specs=(pspec, P(axes)),
                   check_vma=False)
    return fn(state)


@partial(jax.jit, static_argnames=("new_size", "mesh_axes"))
def select_working_padded_sharded(state: ParticleState, new_size: int,
                                  mesh_axes: Mesh):
    """Per-shard select_working_padded (arrival-safe free-slot mapping).

    The spatial decompositions compact with this variant so particles
    migrating into a compacted working set land in slots that map back to
    real lanes of the full-capacity state (particles.select_working_padded).
    """
    from ..particles import select_working_padded

    axes = mesh_axes.axis_names
    pspec = _state_spec(axes)
    fn = shard_map(lambda s: select_working_padded(s, new_size),
                   mesh=mesh_axes, in_specs=(pspec,),
                   out_specs=(pspec, P(axes)), check_vma=False)
    return fn(state)


@partial(jax.jit, static_argnames=("mesh_axes",))
def merge_compacted_sharded(full: ParticleState, part: ParticleState,
                            sel, mesh_axes: Mesh) -> ParticleState:
    """Per-shard merge of a compacted slice back into the full slabs."""
    from ..particles import merge_compacted

    axes = mesh_axes.axis_names
    pspec = _state_spec(axes)
    fn = shard_map(merge_compacted, mesh=mesh_axes,
                   in_specs=(pspec, pspec, P(axes)),
                   out_specs=pspec, check_vma=False)
    return fn(full, part, sel)


@partial(jax.jit, static_argnames=("target", "mesh_axes", "padded",
                                   "ring_slots"),
         donate_argnums=(0, 1, 3, 4, 5, 6))
def compact_sharded(full: ParticleState, part, sel, tally_parts,
                    ring_cell, ring_val, ring_cnt, *, target: int,
                    mesh_axes: Mesh, padded: bool = False,
                    ring_slots: int = 16):
    """Fused per-shard compaction: ring drain + merge + reselect + fresh
    rings in ONE dispatch (the unfused ladder pays fixed submission cost
    per dispatch, and the fresh rings were host-allocated device_puts —
    tens of MB through the axon tunnel at full widths).

    `part`/`sel` are None on the first ladder step.  Ring args may be
    None (pure-XLA sweep path): then the tally passes through untouched
    and no fresh rings are returned.  Returns
    (full', part'@target, sel', tally', rc, rv, rn) with the fresh rings
    sized (ring_slots, target) per shard, or Nones without rings.
    """
    from ..pallas_sweep import drain_rings, make_rings
    from ..particles import (merge_compacted, select_working,
                             select_working_padded)

    axes = mesh_axes.axis_names
    pspec = _state_spec(axes)
    has_rings = ring_cell is not None
    has_sel = sel is not None

    def shard_fn(f, p, se, t_row, rc, rv, rn):
        t = t_row[0]
        if has_rings:
            t, _, _, _ = drain_rings(t, rc, rv, rn)
        if has_sel:
            f = merge_compacted(f, p, se)
        p2, se2 = (select_working_padded if padded
                   else select_working)(f, target)
        if has_rings:
            nrc, nrv, nrn = make_rings(target, t.dtype, ring_slots)
        else:
            nrc = nrv = nrn = None
        return f, p2, se2, t[None, :], nrc, nrv, nrn

    ring_in = (P(None, axes), P(None, axes), P(axes)) if has_rings \
        else (None, None, None)
    fn = shard_map(
        shard_fn, mesh=mesh_axes,
        in_specs=(pspec, pspec if has_sel else None,
                  P(axes) if has_sel else None, P(axes, None)) + ring_in,
        out_specs=(pspec, pspec, P(axes), P(axes, None)) + ring_in,
        check_vma=False)
    return fn(full, part, sel, tally_parts, ring_cell, ring_val, ring_cnt)


@partial(jax.jit, static_argnames=("mesh_axes",))
def drain_rings_sharded(tally_parts, ring_cell, ring_val, ring_cnt,
                        mesh_axes: Mesh):
    """Flush every shard's pending ring into its private tally row.

    Works on 1D and 2D device meshes (lane/row dims sharded jointly
    over all axes) — the spatial decompositions carry persistent rings
    across chunks and drain through this.
    """
    from ..pallas_sweep import drain_rings

    axis = mesh_axes.axis_names
    axis = axis[0] if len(axis) == 1 else axis

    def shard_fn(t_row, rc, rv, rn):
        t, rc, rv, rn = drain_rings(t_row[0], rc, rv, rn)
        return t[None, :], rc, rv, rn

    fn = shard_map(
        shard_fn, mesh=mesh_axes,
        in_specs=(P(axis, None), P(None, axis), P(None, axis), P(axis)),
        out_specs=(P(axis, None), P(None, axis), P(None, axis), P(axis)),
        check_vma=False)
    return fn(tally_parts, ring_cell, ring_val, ring_cnt)


class _HostCounts:
    """Host-side event counters with the EventCounts.totals() interface."""

    def __init__(self, nfacets: int, ncollisions: int):
        self.nfacets = nfacets
        self.ncollisions = ncollisions

    def totals(self) -> tuple[int, int]:
        return self.nfacets, self.ncollisions


class ShardedSimulation(FlightDecomposedMixin,
                        driver_mod.SimulationBase):
    """Multi-chip particle-parallel simulation (replicated mesh mode).

    Same run()/validate()/IO as driver.Simulation; state is sharded over
    the device mesh and tallies are per-shard partials.  The driver CLI
    auto-selects this class when more than one device is visible.
    Facet-dominated decks route to the sharded free-flight engine
    (parallel.flight_sharded) — zero-collective like the stepping path.
    """

    supports_flight = True

    def __init__(self, cfg: SimConfig, *, dtype=None,
                 events_per_sweep: int | None = None,
                 device_mesh: Mesh | None = None, quiet: bool = False):
        super().__init__(cfg, dtype=dtype, events_per_sweep=events_per_sweep,
                         quiet=quiet)
        self.device_mesh = device_mesh or make_device_mesh()
        self.axis = self.device_mesh.axis_names[0]
        nshards = self.device_mesh.devices.size
        self.nshards = nshards
        self.mesh2d = self.mesh  # alias used by the sharded step fns

        # Pad so each shard gets an equal, lane-aligned slab.  pid stays
        # globally contiguous: shard boundaries NEVER change the RNG stream
        # of any particle (reproducibility across topologies).
        n = cfg.nparticles
        per_shard = -(-n // nshards)
        per_shard = ((per_shard + 8191) // 8192) * 8192
        total = per_shard * nshards
        state = inject_particles(
            self.mesh2d, nparticles=n,
            source_x0=cfg.source.xpos * cfg.width,
            source_y0=cfg.source.ypos * cfg.height,
            source_width=cfg.source.width * cfg.width,
            source_height=cfg.source.height * cfg.height,
            initial_energy=cfg.initial_energy, dt=cfg.dt,
            dtype=self.dtype, pad_to=total, rng_scheme=cfg.rng,
            local_coords=(None if self.use_flight else
                          driver_mod._local_coords(cfg, self.dtype)))

        shard_sharding = NamedSharding(self.device_mesh, P(self.axis))
        self.state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, shard_sharding), state)
        self.tally_parts = jax.device_put(
            jnp.zeros((nshards, cfg.nx * cfg.ny),
                      dtype=jnp.dtype(cfg.tally_dtype)),
            NamedSharding(self.device_mesh, P(self.axis, None)))
        # Injection is init work, not step-1 work (see driver.Simulation).
        jax.block_until_ready(self.state)

    def _fresh_rings(self, total: int, S: int):
        """Empty pending-flush rings sharded alongside `total` lanes."""
        col = NamedSharding(self.device_mesh, P(None, self.axis))
        lane = NamedSharding(self.device_mesh, P(self.axis))
        rc = jax.device_put(jnp.full((S, total), -1, jnp.int32), col)
        rv = jax.device_put(
            jnp.zeros((S, total), self.tally_parts.dtype), col)
        rn = jax.device_put(jnp.zeros((total,), jnp.int32), lane)
        return rc, rv, rn

    def step(self, tt: int):
        """Chunk-dispatched sharded census step; returns StepMetrics."""
        if self.use_flight:
            return self._step_flight_decomposed(tt)
        self.profile.start()
        master_key = jnp.uint32(tt)
        self.state, nprocessed = begin_timestep_sharded(
            self.state, self.mesh2d, self.cs_scatter, self.geom,
            self.cfg.dt, master_key, self.device_mesh)
        nf = nc = 0
        nsweeps = 0
        inv_ntotal = 1.0 / self.cfg.nparticles

        nshards = self.device_mesh.devices.size
        use_pallas = self.use_pallas
        S = 16
        rc = rv = rn = None
        if use_pallas:
            rc, rv, rn = self._fresh_rings(self.state.x.shape[0], S)

        # Per-shard live-lane compaction (mirrors driver.Simulation.step):
        # the target is one static per-shard size keyed on the worst-loaded
        # shard, so the SPMD program stays uniform.  pid-keyed RNG makes
        # the reordering physically invisible.
        part, sel = self.state, None
        full = part
        min_cap = self.compact_min
        while True:
            per_shard = part.x.shape[0] // nshards
            max_sw = (self.chunk_sweeps if per_shard > 262144
                      else self.chunk_sweeps * 8)
            if use_pallas:
                (part, self.tally_parts, rc, rv, rn,
                 ctrl_dev) = pallas_sweep_chunk_sharded(
                    part, self.tally_parts, rc, rv, rn,
                    self.cs_scatter, self.cs_absorb, self.geom, master_key,
                    inv_ntotal, self.device_mesh, max_sw,
                    k_events=self.k_events,
                    scatter_layout=self.scatter_layout,
                    absorb_layout=self.absorb_layout,
                    density_grid=(self.mesh2d.density
                                  if self.geom.regions is None else None))
            else:
                (part, self.tally_parts,
                 ctrl_dev) = sweep_chunk_sharded(
                    part, self.tally_parts, self.mesh2d,
                    self.cs_scatter, self.cs_absorb, self.geom, master_key,
                    inv_ntotal, self.device_mesh, max_sw,
                    events_per_sweep=self.events_per_sweep)
            # ONE replicated fetch per chunk: loop decisions + exact
            # 64-bit event counts (separate int() pulls each cost a
            # ~33 ms tunnel round trip).
            head, dnf, dnc = _read_ctrl(ctrl_dev)
            nf += dnf
            nc += dnc
            nsweeps += head[0]
            if sel is None:
                full = part  # chunk inputs are donated; keep live buffers
            # pmax'd per-shard working count from the chunk itself ==
            # max_live_sharded, minus one whole dispatch per chunk.
            live = head[_CTRL_MAXLIVE]
            if live == 0:
                break
            if self.compact_enabled and per_shard > min_cap:
                target = max(min_cap,
                             1 << (max(live, 1) - 1).bit_length())
                if target <= per_shard // 2:
                    # Fused: drain + merge + reselect + fresh rings in
                    # one dispatch (see compact_sharded).
                    (full, part, sel, self.tally_parts, rc, rv,
                     rn) = compact_sharded(
                        full, part if sel is not None else None, sel,
                        self.tally_parts, rc, rv, rn,
                        target=target, mesh_axes=self.device_mesh,
                        ring_slots=S)
        if use_pallas:
            (self.tally_parts, rc, rv, rn) = drain_rings_sharded(
                self.tally_parts, rc, rv, rn, self.device_mesh)
        if sel is not None:
            full = merge_compacted_sharded(full, part, sel,
                                           self.device_mesh)
        else:
            full = part
        self.state = full
        jax.block_until_ready(self.tally_parts)
        step_time = self.profile.stop(f"step{tt}")
        m = driver_mod.StepMetrics(
            step=tt, step_time=step_time, nfacets=nf, ncollisions=nc,
            nprocessed=int(nprocessed), nsweeps=nsweeps)
        self.step_metrics.append(m)
        return m

    def _flight_begin(self, mk):
        return begin_timestep_sharded(
            self.state, self.mesh2d, self.cs_scatter, self.geom,
            self.cfg.dt, mk, self.device_mesh)

    @property
    def tally(self) -> jnp.ndarray:
        """Global tally (summed over shard partials)."""
        return self.tally_parts.sum(axis=0)

    def host_tally(self) -> np.ndarray:
        """f64 global tally; gathers the shard partials (collective in
        multi-process runs — the reference's reduce_all_sum analog,
        omp3/neutral.c:530)."""
        from ..io_utils import host_global
        parts = np.asarray(host_global(self.tally_parts), dtype=np.float64)
        return parts.sum(axis=0)

    def global_tally_sum(self) -> float:
        return float(self.host_tally().sum())

    def restore(self, path: str) -> int:
        step = super().restore(path)
        # Re-place the restored arrays onto the device mesh.
        shard_sharding = NamedSharding(self.device_mesh, P(self.axis))
        self.state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, shard_sharding), self.state)
        return step

    def _set_tally(self, tally: jnp.ndarray) -> None:
        # Restored tally is the accumulated global grid; shard 0 carries it
        # as its partial, the rest start from zero.
        nshards = self.device_mesh.devices.size
        parts = jnp.zeros((nshards, self.cfg.nx * self.cfg.ny),
                          dtype=jnp.dtype(self.cfg.tally_dtype))
        parts = parts.at[0].set(tally)
        self.tally_parts = jax.device_put(
            parts, NamedSharding(self.device_mesh, P(self.axis, None)))


def initialise_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host (multi-process) initialization.

    TPU-native replacement for the reference's initialise_mpi/initialise_comms
    (arch comms API, SURVEY.md §2.9): on TPU pods each host process calls
    this once before touching devices; jax.distributed wires the hosts and
    jax.devices() becomes the global device set, over which the same
    shard_map programs run unchanged.  No-op when already initialized or
    when running single-process (the common single-host case).
    """
    import jax

    if coordinator is None:
        try:
            jax.distributed.initialize()  # env-driven (TPU pods auto-detect)
        except (RuntimeError, ValueError):
            pass  # single-process run or already initialized
    else:
        # Explicit rendezvous parameters: surface failures loudly.
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
