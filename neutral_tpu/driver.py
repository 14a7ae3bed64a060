"""Simulation driver: orchestration loop, metrics contract, validation, CLI.

TPU-native equivalent of the reference driver (main.c:20-166).  The printed
per-step metric contract is kept intact so downstream tooling (and humans)
can compare runs 1:1 with the reference:

    Iteration  <tt>
    Step time  <s>
    Wallclock  <s>
    Facets     <n>
    Collisions <n>
    Facet Events / s <rate>
    Collision Events / s <rate>
    ...
    Final Wallclock <s>
    Elapsed Simulation Time <s>

and validation prints the reference's PASSED/FAILED lines
(omp3/neutral.c:536-556).  Timing is wall-clock with device sync per step —
the same semantics as the reference's barrier+profiler pair (main.c:112-116).
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from . import io_utils
from .config import SimConfig, load_config
from .constants import VALIDATE_TOLERANCE
from .mesh import Mesh2D, build_mesh
from .particles import ParticleState, inject_particles
from .profiler import Profile
from .transport import Geometry
from .xs import CrossSection

# Pad particle batches to a multiple of the Pallas sweep block
# (64 rows x 128 lanes) so the fused kernel always gets whole blocks and
# XLA never peels a ragged remainder.
_LANE_PAD = 8192


def enable_compilation_cache() -> None:
    """Persistent XLA compile cache (compacted shapes recompile otherwise).

    The adaptive compaction ladder (driver step loop) runs the sweep over a
    handful of power-of-4 particle-array sizes; each size is a separate XLA
    executable.  Caching them on disk makes every run after the first start
    instantly — especially valuable on this class of host where XLA
    compiles are slow.
    """
    import os
    cache_dir = os.environ.get(
        "NEUTRAL_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "neutral_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the persistent cache


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _ladder_target(live: int, min_cap: int) -> int:
    """Smallest {1, 1.5} x 2^k x 8192 lane count holding `live` (+5%).

    Half-steps between powers of two matter at census cliffs: live-lane
    counts routinely land just under 0.5 x cap, where a pure power-of-two
    ladder cannot shrink at all (e.g. 4.3M live in a 10M cap).  Each size
    is still one cached XLA executable.
    """
    need = max(int(live * 1.05) + 1, min_cap)
    u = (need + 8191) // 8192
    k = max((u - 1).bit_length(), 0)
    if k >= 1 and (3 << (k - 1)) >= 2 * u:
        # 1.5 * 2^(k-1) = 0.75 * 2^k also holds it
        return (3 << (k - 1)) * 4096
    return (1 << k) * 8192


# In-chunk live-collapse factor required before an early cliff exit
# fires (pallas_sweep_chunk / pallas_flight_chunk `exit_collapse`).
# 4 = exit only on a >= 4x in-chunk collapse: bounds compactions to
# ~log4(cap/min) per step and keeps scatter's gradual census tail on the
# full-chunk cadence (a halving guard thrashed there: 2.15e9 -> 0.94e9
# ev/s, the round-4 regression).  bench/exitlive_ab.py A/Bs this knob.
_EXIT_COLLAPSE = 4

# The RING engine's in-kernel LIVE-COUNT cliff exit is OFF: every guard
# variant measured slower than plain chunk-boundary compaction on scatter
# (bench/exitlive_ab.py 2026-08-19: off 2.17e9, exit_collapse=4 1.66e9,
# =2 0.91e9 ev/s — the per-call count_nonzero(working_mask) alone costs
# ~1s/solve at 10M lanes).  The flag exists so the A/B harness can
# re-enable it.
_RING_EXIT = False

# The ACTIVITY cliff exit (pallas_sweep_chunk exit_activity): the
# per-call nf+nc event-count reduction — already computed for the
# metric contract, zero extra work — is a live-population proxy (one
# event per live lane per sweep), so an in-chunk activity collapse can
# exit the chunk at a cliff's onset for FREE, unlike the live-count
# exit.  Measured on scatter (bench/exitlive_ab.py 2026-08-20): act
# 1.753e9 vs off 2.170e9 ev/s — even a free detector loses, because
# the response (a drain + merge + reselect per ~4x ladder level, each
# touching the full 10M-lane arrays) costs more than the dead-lane
# sweeps it avoids.  OFF in production; "act" mode re-enables for A/B.
_RING_EXIT_ACT = False


def _exit_live_for(cap: int, min_cap: int) -> int:
    """In-kernel census-cliff exit threshold for the ring engine.

    Largest `exit_live` such that any live count BELOW it makes the
    driver's compaction ladder fire (`_ladder_target(live) <= 0.75*cap`)
    — the chunk's early exit (pallas_sweep_chunk exit_live) then always
    leads to a real compaction, never to an immediate re-exit spin.
    0 when no productive compaction exists at this cap.
    """
    bound = (cap * 3) // 4
    if _ladder_target(0, min_cap) > bound:
        return 0
    lo, hi = 0, cap  # f(live) = ladder(live) <= bound, monotone in live
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _ladder_target(mid - 1, min_cap) <= bound:
            lo = mid
        else:
            hi = mid - 1
    return lo


def _flight_exit_live(cap: int, min_cap: int) -> int:
    """Cliff-exit threshold for the flight engine's pow2 ladder.

    The flight driver compacts when `max(min_cap, pow2(live)) <= cap//2`;
    any live count below the largest power of two <= cap//2 guarantees
    that, so the chunk's early exit always converts into a compaction.
    """
    if min_cap > cap // 2 or cap < 2:
        return 0
    return 1 << ((cap // 2).bit_length() - 1)


def load_cross_sections(cfg: SimConfig, dtype) -> tuple[CrossSection,
                                                        CrossSection]:
    """Cross-section tables: user `.cs` files if present, else regenerated.

    Mirrors the reference's load of elastic_scatter.cs / capture.cs from
    the working directory (neutral_data.c:119,173-178; filenames
    neutral_data.h:30-31), looking in cwd then the deck's directory.  When
    no files exist, the tables are regenerated from the published formula
    (xs.make_resonance_table == reference resonance.py), which is
    byte-equivalent data.  File-loaded tables that match the generated
    quartic grid still get the analytic O(1)-index path; arbitrary user
    tables fall back to searchsorted gathers.
    """
    from .xs import find_cs_files

    paths = find_cs_files(cfg.params_path)
    if paths is not None:
        s_path, a_path = paths
        s = CrossSection.from_file(s_path, dtype=dtype)
        a = CrossSection.from_file(a_path, dtype=dtype)
        if cfg.fast_math and s.quartic:
            s = CrossSection(s.keys, s.values, quartic=True,
                             analytic=True)
        if cfg.fast_math and a.quartic:
            a = CrossSection(a.keys, a.values, quartic=True,
                             analytic=True)
        return s, a
    s = CrossSection.resonance(dtype=dtype, analytic=cfg.fast_math)
    return s, CrossSection.resonance(dtype=dtype, analytic=cfg.fast_math)


def make_geometry(cfg: SimConfig) -> Geometry:
    """Geometry for a whole-domain (replicated-mesh) view of the problem.

    With cfg.fast_math the static fields carry the uniform cell pitch and
    the problem-region cell rectangles so the jitted transport uses the
    gather-free analytic paths (see transport.Geometry docs).

    Grid decks (cfg.density_file) carry the uniform pitch but NO regions:
    density comes from the (ny, nx) grid — gathered in XLA-land
    (transport._density_of), carried per-lane on the Mosaic ring engine
    (pallas_sweep grid mode).  The free-flight engine needs constant-
    density rectangles (rects=None disables it).
    """
    from .flight import disjoint_rects
    from .mesh import region_cell_bounds
    # Non-uniform meshes have no global pitch: dx/dy stay 0 so facet
    # distances gather the per-cell edge arrays (transport._facet_edges;
    # reference semantics omp3/neutral.c:423-471 via edgex[cellx]), and
    # the flight engine (closed-form uniform-pitch rasterization) is
    # unavailable.  Analytic density REGIONS remain valid — their cell
    # bounds are computed from the actual edge midpoints.
    uni = cfg.uniform_mesh
    dx = cfg.width / cfg.nx if uni else 0.0
    dy = cfg.height / cfg.ny if uni else 0.0
    if cfg.density_file:
        return Geometry(global_nx=cfg.nx, global_ny=cfg.ny,
                        nx=cfg.nx, ny=cfg.ny,
                        dx=dx, dy=dy,
                        rng_scheme=cfg.rng)
    if cfg.fast_math:
        regions = region_cell_bounds(cfg)
        return Geometry(global_nx=cfg.nx, global_ny=cfg.ny,
                        nx=cfg.nx, ny=cfg.ny,
                        dx=dx, dy=dy,
                        regions=regions,
                        rng_scheme=cfg.rng,
                        rects=(disjoint_rects(regions, cfg.nx, cfg.ny)
                               if uni else None))
    return Geometry(global_nx=cfg.nx, global_ny=cfg.ny, nx=cfg.nx, ny=cfg.ny,
                    rng_scheme=cfg.rng)



def _local_coords(cfg: SimConfig, dtype):
    """(dx, dy) when the f32 cell-local position representation applies."""
    from .transport import use_local_coords
    geom_like = make_geometry(cfg)
    if use_local_coords(geom_like, dtype):
        return (cfg.width / cfg.nx, cfg.height / cfg.ny)
    return None

@dataclass
class StepMetrics:
    step: int
    step_time: float
    nfacets: int
    ncollisions: int
    nprocessed: int
    nsweeps: int
    # Wall-clock phase breakdown of the step (sweep/drain/raster/compact
    # dispatch+sync windows); keys vary by engine.
    phases: dict = None


class SimulationBase:
    """Shared driver logic: timestep loop, metric contract, validation, IO.

    Subclasses provide the device-resident particle/tally state and the
    `step()` implementation: Simulation (single device) and
    parallel.sharding.ShardedSimulation (device-mesh data parallel).
    """

    # Whether this driver's step() implements the free-flight engine
    # (flight.py).  Multi-device decompositions run the stepping engines.
    supports_flight = False

    def __init__(self, cfg: SimConfig, *, dtype=None,
                 events_per_sweep: int | None = None,
                 quiet: bool = False):
        self.cfg = cfg
        self.dtype = jnp.dtype(dtype or cfg.dtype)
        self.quiet = quiet
        self.events_per_sweep = int(events_per_sweep
                                    or cfg.events_per_sweep or 1)
        self.chunk_sweeps = int(getattr(cfg, "chunk_sweeps", 0) or 256)
        # compact_every==0 historically meant "never"; the chunked driver
        # compacts adaptively, so treat 0 as "on" and -1 as "off".
        self.compact_enabled = cfg.compact_every >= 0
        self.compact_min = 8192         # smallest working-set capacity
        self.k_events = 16              # fused events per Pallas kernel call
        engine = getattr(cfg, "engine", "auto")
        # The Mosaic kernel is a float32 TPU program; f64 decks (compare
        # tooling, precision studies) take the XLA sweep.
        is_f32 = self.dtype == jnp.dtype(jnp.float32)
        self.use_flight = False
        if engine == "auto":
            # The fused kernel is Mosaic (TPU)-specific; any other backend
            # (cpu, gpu) takes the XLA sweep rather than crashing in
            # pltpu lowering.  Decks with near-vacuum regions are
            # facet-dominated — route them to the free-flight engine
            # (flight.py), whose segment rasterizer sidesteps the
            # per-cell tally scatter; dense decks (scatter) stay on the
            # collision-tuned Mosaic ring engine.
            on_tpu = jax.default_backend() == "tpu"
            # Grid decks (density_file) run the ring engine's carried-
            # density mode; only the fast_math=False verification mode
            # stays on the XLA sweep by design.  Non-uniform meshes have
            # no global pitch — both Mosaic kernels require one, so such
            # decks route to the XLA sweep (edge-array gathers).
            self.use_pallas = bool((cfg.fast_math or cfg.density_file)
                                   and is_f32 and on_tpu
                                   and cfg.uniform_mesh)
            # Decks with near-vacuum regions are facet-dominated there:
            # free flight through a vacuum rect replaces thousands of
            # per-cell facet events with one closed-form piece, and the
            # fused Mosaic flight kernel handles the collision-heavy
            # dense regions at ring-engine speed (measured: stream 131s
            # -> ~14s, csp 8.5 -> 3.1 s/step, split 107 -> ~3s on one
            # v5e).  Uniformly dense decks (scatter) have sub-cell
            # flights everywhere — they stay on the leaner ring engine.
            if (on_tpu and cfg.fast_math and is_f32 and self.supports_flight
                    and cfg.uniform_mesh
                    and not cfg.density_file and cfg.problems
                    and any(r.density < 1.0 for r in cfg.problems)):
                self.use_flight = True
                self.use_pallas = False
        else:
            self.use_pallas = engine == "pallas"
            self.use_flight = engine == "flight"
            if (self.use_pallas or self.use_flight) and not cfg.uniform_mesh:
                # Loud rejection (VERDICT r4): the fused Mosaic kernels
                # evaluate facet distances from ONE uniform pitch; a
                # non-uniform deck would silently run the wrong geometry.
                raise ValueError(
                    f"engine='{engine}' requires a uniform mesh; this deck "
                    "declares non-uniform edges (edgex_file/edgey_file/"
                    "mesh_stretch_*) — use engine='auto' or 'xla' (the "
                    "edge-array sweep)")
            if self.use_pallas and not is_f32:
                raise ValueError("engine='pallas' requires dtype float32 "
                                 f"(got {self.dtype})")
            if self.use_flight and (not cfg.fast_math or cfg.density_file):
                raise ValueError("engine='flight' requires fast_math "
                                 "(closed-form flight needs constant-"
                                 "density region rectangles)")
            if (self.use_flight and not is_f32
                    and jax.default_backend() == "tpu"):
                # Mirror the pallas check: the fused Mosaic flight kernel
                # is float32-only and TPU f64 would otherwise die deep in
                # lowering instead of with a clear error.
                raise ValueError("engine='flight' on a TPU backend "
                                 f"requires dtype float32 (got {self.dtype})")
        # Flight pieces span many cells: positions must be global (the f32
        # cell-local trick applies only to the stepping engines).
        self.flight_seg_cap = 512 * 1024
        self.flight_flush_cap = 4 * 1024 * 1024
        self.flight_pair_cap = 16 * 1024 * 1024
        enable_compilation_cache()

        self.mesh: Mesh2D = build_mesh(cfg, dtype=self.dtype,
                                       with_density=cfg.uses_density_grid)
        self.geom = make_geometry(cfg)
        self.cs_scatter, self.cs_absorb = load_cross_sections(
            cfg, dtype=self.dtype)
        # The reference ships byte-identical capture/scatter tables; when
        # the loaded pair matches, kernels dedupe the absorb lookup
        # (bitwise-equal result, one fewer table evaluation per event).
        if (np.array_equal(np.asarray(self.cs_scatter.keys),
                           np.asarray(self.cs_absorb.keys))
                and np.array_equal(np.asarray(self.cs_scatter.values),
                                   np.asarray(self.cs_absorb.values))):
            import dataclasses
            self.geom = dataclasses.replace(self.geom, same_xs=True)
        # Arbitrary (non-quartic) cs tables on the Mosaic engines: build
        # the VMEM tile layouts for the banded in-kernel lookup
        # (pallas_table.py).  Both fused kernels (ring sweep + flight)
        # consume them, so table decks keep their auto-engine routing.
        self.scatter_layout = self.absorb_layout = None
        tables_analytic = (self.cs_scatter.analytic
                           and self.cs_absorb.analytic)
        if (self.use_pallas or self.use_flight) and not tables_analytic:
            from .pallas_table import build_layout
            self.scatter_layout = build_layout(
                self.cs_scatter.keys, self.cs_scatter.values,
                dtype=self.dtype)
            if not self.geom.same_xs:
                self.absorb_layout = build_layout(
                    self.cs_absorb.keys, self.cs_absorb.values,
                    dtype=self.dtype)
        self.elapsed_sim_time = 0.0
        self.wallclock = 0.0
        self.profile = Profile()
        self.step_metrics: list[StepMetrics] = []

    def step(self, tt: int) -> StepMetrics:  # pragma: no cover - abstract
        raise NotImplementedError

    # ------------------------------------------------------------------
    # The decomposed drivers' chunk programs are jitted methods with
    # static `self`.  Default identity hashing would give every NEW
    # Simulation instance its own jit cache entry — retracing AND
    # re-loading the executables over the (slow) remote-TPU link on
    # every construction, which silently defeats bench warmup passes and
    # test reuse.  Hash/compare by the static configuration instead: two
    # sims with equal keys trace to identical programs (all closed-over
    # arrays — cs tables, mesh edges — are pure functions of the cfg).
    def _jit_key(self):
        dm = getattr(self, "device_mesh", None)
        devs = (tuple(d.id for d in dm.devices.flat)
                if dm is not None else ())
        return (type(self).__name__, self.cfg, str(self.dtype),
                self.chunk_sweeps, self.k_events, self.events_per_sweep,
                self.compact_enabled, self.compact_min,
                self.use_pallas, self.use_flight, self.geom,
                self.flight_seg_cap, self.flight_flush_cap,
                self.flight_pair_cap, devs,
                getattr(self, "nshards", 1), getattr(self, "cap", 0),
                getattr(self, "cap_xfer", 0), getattr(self, "rows", 0),
                getattr(self, "cols", 0),
                getattr(self, "py", 0), getattr(self, "px", 0),
                getattr(self, "flight_max_calls", None),
                getattr(self, "flight_k_pieces", None),
                getattr(self, "flight_fused_interpret", False),
                getattr(self, "pallas_interpret", False))

    def __hash__(self):
        return hash(self._jit_key())

    def __eq__(self, other):
        return (type(other) is type(self)
                and other._jit_key() == self._jit_key())

    # ------------------------------------------------------------------
    def run(self) -> float:
        """Full timestep loop.  Returns the global tally sum."""
        cfg = self.cfg
        out = self._print
        # Gathers run on EVERY process (they are collectives); only
        # process 0 writes files — reference: write_all_ranks_to_visit
        # gathers across ranks and the master rank writes (main.c:129-139).
        dump = bool(cfg.visit_dump)
        is_main = jax.process_index() == 0
        for tt in range(1, cfg.niters + 1):
            out(f"\nIteration  {tt}")
            if dump:
                self._dump_particle_density(tt)

            m = self.step(tt)
            self.wallclock += m.step_time

            out(f"Handled {m.nprocessed} particles, "
                f"with {m.nsweeps} event sweeps")
            out(f"Step time  {m.step_time:.4f}s")
            out(f"Wallclock  {self.wallclock:.4f}s")
            out(f"Facets     {m.nfacets}")
            out(f"Collisions {m.ncollisions}")
            out(f"Facet Events / s {m.nfacets / m.step_time:.2e}")
            out(f"Collision Events / s {m.ncollisions / m.step_time:.2e}")

            self.elapsed_sim_time += cfg.dt
            if dump:
                tally2d = self.host_tally().reshape(cfg.ny, cfg.nx)
                if is_main:
                    io_utils.write_bov(f"energy{tt}", tally2d,
                                       variable="energy",
                                       time=self.elapsed_sim_time)
            if self.elapsed_sim_time >= cfg.sim_end:
                out("Reached end of simulation time")
                break

        if dump:
            self._dump_particle_density(cfg.niters + 1)

        result = self.validate()

        out(f"Final Wallclock {self.wallclock:.9f}s")
        out(f"Elapsed Simulation Time {self.elapsed_sim_time:.6f}s")
        # Reference parity: PRINT_PROFILING_RESULTS at end of run
        # (main.c:159) — per-step wall-clock entries plus the total,
        # extended with the engine phase breakdown when available.
        out(self.profile.summary())
        agg = {}
        for sm in self.step_metrics:
            for k, v in (sm.phases or {}).items():
                agg[k] = agg.get(k, 0.0) + v
        if agg:
            out("PHASE BREAKDOWN (cumulative): "
                + "  ".join(f"{k}={v:.3f}s" for k, v in agg.items()))
        return result

    # ------------------------------------------------------------------
    def host_tally(self) -> np.ndarray:
        """Global flat (ny*nx,) tally as float64 on the host.

        Collective in multi-process runs (subclasses gather their shard
        partials) — the analog of the reference's reduce_all_sum before
        output (omp3/neutral.c:530).  Promoted to f64 so downstream sums
        don't eat the validation tolerance.
        """
        return np.asarray(io_utils.host_global(self.tally),
                          dtype=np.float64)

    def validate(self) -> float:
        """Global tally sum + golden comparison (omp3/neutral.c:520-557)."""
        local = self.host_tally().sum()
        out = self._print
        out(f"Final global_energy_tally {local:.15e}")
        expected = self.cfg.expected_tally
        if expected is None:
            out("WARNING: could not find a golden result to validate against")
            return local
        if within_tolerance(expected, local, VALIDATE_TOLERANCE):
            out("PASSED validation.")
        else:
            out(f"FAILED validation: expected {expected:.12e}, "
                f"got {local:.12e}")
        return local

    # ------------------------------------------------------------------
    def _coords_convention(self) -> str:
        # Flight pieces span many cells, so the flight engine keeps
        # global positions even in f32 (see flight.flight_core docs).
        if self.use_flight:
            return "global"
        return ("cell-local"
                if _local_coords(self.cfg, self.dtype) else "global")

    def checkpoint(self, path: str, step: int) -> None:
        """Write a checkpoint.  Collective: call from every process (the
        state/tally gathers are all-gathers); only process 0 writes."""
        state = jax.tree_util.tree_map(io_utils.host_global, self.state)
        tally = self.host_tally()
        if jax.process_index() == 0:
            io_utils.save_checkpoint(path, state, tally, step,
                                     self.elapsed_sim_time,
                                     coords=self._coords_convention())

    def restore(self, path: str) -> int:
        state, tally, step, t = io_utils.load_checkpoint(
            path, expect_coords=self._coords_convention())
        dt = self.dtype
        self.state = ParticleState(
            x=jnp.asarray(state.x, dt), y=jnp.asarray(state.y, dt),
            omega_x=jnp.asarray(state.omega_x, dt),
            omega_y=jnp.asarray(state.omega_y, dt),
            energy=jnp.asarray(state.energy, dt),
            weight=jnp.asarray(state.weight, dt),
            dt_to_census=jnp.asarray(state.dt_to_census, dt),
            mfp_to_collision=jnp.asarray(state.mfp_to_collision, dt),
            deposit=jnp.asarray(state.deposit, dt),
            cellx=jnp.asarray(state.cellx), celly=jnp.asarray(state.celly),
            dead=jnp.asarray(state.dead), pid=jnp.asarray(state.pid),
            counter=jnp.asarray(state.counter))
        self._set_tally(jnp.asarray(tally, jnp.dtype(self.cfg.tally_dtype)))
        self.elapsed_sim_time = t
        return step

    def _set_tally(self, tally: jnp.ndarray) -> None:
        self.tally = tally

    # ------------------------------------------------------------------
    def _dump_particle_density(self, tt: int) -> None:
        # particle_density gathers sharded state (collective); write from
        # process 0 only.
        dens = io_utils.particle_density(self.state, self.cfg.nx, self.cfg.ny)
        if jax.process_index() == 0:
            io_utils.write_bov(f"density{tt}", dens, variable="density",
                               time=self.elapsed_sim_time)

    def _print(self, msg: str) -> None:
        if not self.quiet:
            print(msg, flush=True)


class Simulation(SimulationBase):
    """Single-device simulation (one chip, or CPU)."""

    supports_flight = True

    def __init__(self, cfg: SimConfig, *, dtype=None,
                 events_per_sweep: int | None = None, quiet: bool = False):
        super().__init__(cfg, dtype=dtype, events_per_sweep=events_per_sweep,
                         quiet=quiet)
        # Single-shard source window covers the whole source box, so the
        # local count equals the requested count (reference:
        # neutral_data.c:89-95 with area fraction 1).
        n = cfg.nparticles
        self.state: ParticleState = inject_particles(
            self.mesh,
            nparticles=n,
            source_x0=cfg.source.xpos * cfg.width,
            source_y0=cfg.source.ypos * cfg.height,
            source_width=cfg.source.width * cfg.width,
            source_height=cfg.source.height * cfg.height,
            initial_energy=cfg.initial_energy,
            dt=cfg.dt,
            dtype=self.dtype,
            pad_to=_round_up(n, _LANE_PAD),
            rng_scheme=cfg.rng,
            local_coords=(None if self.use_flight
                          else _local_coords(cfg, self.dtype)),
        )
        self.tally = jnp.zeros(cfg.nx * cfg.ny,
                               dtype=jnp.dtype(cfg.tally_dtype))
        # Injection belongs to init, not to the first step's metrics (the
        # reference injects in initialise_neutral_data, before the timed
        # solve loop — main.c:72 vs :99).  Force the async dispatch to
        # finish here so step 1's wallclock doesn't absorb it.
        jax.block_until_ready(self.state)

    # ------------------------------------------------------------------
    def step(self, tt: int) -> StepMetrics:
        """Advance one census timestep (master_key = tt, as main.c:101).

        The census is host-chained in bounded sweep chunks: each device
        dispatch runs at most `chunk_sweeps` event sweeps, so no single XLA
        execution is unboundedly long (robust over remote TPU links) and
        long censuses show progress.  On TPU with fast_math the chunks run
        the fused Pallas kernel with caller-owned pending-flush rings
        (pallas_sweep.py); otherwise the pure-XLA sweep.
        """
        from .particles import merge_compacted, select_working
        from .transport import EventCounts, begin_timestep, sweep_chunk

        if self.use_flight:
            return self._step_flight(tt)

        use_pallas = self.use_pallas
        if use_pallas:
            from .pallas_sweep import (compact_with_rings, drain_rings,
                                       make_rings, pallas_sweep_chunk)

        import os
        import time as _time
        dbg = bool(os.environ.get("NEUTRAL_TPU_DEBUG_PHASES"))
        phases = {"begin": 0.0, "sweep": 0.0, "compact": 0.0,
                  "ringdrain": 0.0}

        def _sync(x):
            if dbg:
                # block_until_ready is a no-op through the axon tunnel;
                # a tiny host read (slice FIRST — device_get of the full
                # array would stream it at ~40 MB/s) is the reliable sync.
                leaf = jax.tree_util.tree_leaves(x)[0]
                np.asarray(leaf.reshape(-1)[:1])
            return x

        self.profile.start()
        t0 = _time.perf_counter()
        master_key = jnp.uint32(tt)
        full = begin_timestep(self.state, self.mesh, self.geom,
                              self.cs_scatter, self.cfg.dt, master_key)
        nprocessed = jnp.count_nonzero(~full.dead)
        counts = EventCounts.zeros()
        nsweeps = 0
        inv_ntotal = 1.0 / self.cfg.nparticles
        if dbg:
            _sync(full.x)
        phases["begin"] += _time.perf_counter() - t0

        # Live-lane compaction: when most lanes have finished their census
        # (long-tail problems like csp), shrink the working set to the next
        # power of two so sweeps stop paying bandwidth for finished lanes.
        # pid-keyed RNG makes this physically invisible (see
        # particles.select_working).
        part, sel = full, None
        min_cap = self.compact_min
        cliff = False
        prev_live = None
        if use_pallas:
            rc, rv, rn = make_rings(part.n, self.tally.dtype)
        while True:
            # Small working sets sweep cheaply but pay full host-dispatch
            # latency per chunk; give the long-tail widths 8x the sweep
            # budget per dispatch (the bound exists to keep single XLA
            # executions short, and 2048 sweeps at <=256k lanes is still
            # far quicker than 256 sweeps at full width).  The XLA path
            # shortens chunks once live starts to drop at full width so
            # compaction can catch the collapse — a 10M->0.2M die-off
            # inside one 256-sweep chunk otherwise runs mostly dead
            # lanes.  The ring engine runs NO in-kernel cliff exit
            # (_RING_EXIT above: every guard variant measured slower on
            # scatter than chunk-boundary compaction; round 4's 2.3x
            # headline regression).
            exit_live = (_exit_live_for(part.n, min_cap)
                         if (_RING_EXIT and use_pallas
                             and self.compact_enabled
                             and part.n > min_cap) else 0)
            exit_act = (_RING_EXIT_ACT and use_pallas
                        and self.compact_enabled and part.n > min_cap
                        # the ladder must be able to fire on a 4x
                        # collapse, else the next chunk re-exits
                        # immediately (a host-round-trip spin)
                        and _ladder_target(part.n // _EXIT_COLLAPSE,
                                           min_cap) <= (part.n * 3) // 4)
            if part.n <= 262144:
                max_sw = self.chunk_sweeps * 8
            elif cliff and not exit_act:
                max_sw = max(self.chunk_sweeps // 4, 16)
            else:
                max_sw = self.chunk_sweeps
            tc = _time.perf_counter()
            if use_pallas:
                (part, self.tally, counts, rc, rv, rn, done,
                 n_work) = pallas_sweep_chunk(
                    part, self.tally, counts, rc, rv, rn, self.cs_scatter,
                    self.cs_absorb, self.geom, master_key, inv_ntotal,
                    max_sw, k_events=self.k_events,
                    interpret=getattr(self, "pallas_interpret", False),
                    scatter_layout=self.scatter_layout,
                    absorb_layout=self.absorb_layout,
                    exit_live=exit_live, exit_collapse=_EXIT_COLLAPSE,
                    exit_activity=exit_act,
                    density_grid=(self.mesh.density
                                  if self.geom.regions is None else None))
            else:
                part, self.tally, counts, done, n_work = sweep_chunk(
                    part, self.tally, counts, self.mesh, self.cs_scatter,
                    self.cs_absorb, self.geom, master_key, inv_ntotal,
                    max_sw,
                    events_per_sweep=self.events_per_sweep)
            nsweeps += int(done)
            if use_pallas and sel is None:
                # chunk inputs are donated; keep `full` pointing at live
                # buffers (it aliases `part` until the first compaction)
                full = part
            # The chunk returns the working-lane count, so the compaction
            # ladder below needs NO separate live_count dispatch (each
            # extra dispatch is a ~33 ms round trip through the tunnel).
            live = int(n_work)       # syncs on the chunk (host chaining)
            alive = live > 0
            if use_pallas:
                # Census-cliff response, HOST-side (the in-kernel exit is
                # off — _RING_EXIT above): once live collapses >=25%
                # within one chunk, drop to quarter-length chunks so the
                # compaction ladder samples the die-off 4x as often.
                # Costs only extra ~33 ms round trips while the collapse
                # lasts — no per-call in-kernel live count.
                # Hysteresis: entering needs a >=25% in-chunk drop (at
                # full chunk length); staying needs only the same decay
                # RATE at quarter length (>=7% per short chunk).
                thresh = 0.93 if cliff else 0.75
                cliff = (prev_live is not None
                         and live < int(prev_live * thresh)
                         and part.n > min_cap)
                prev_live = live
            phases["sweep"] += _time.perf_counter() - tc
            if dbg:
                dt_chunk = _time.perf_counter() - tc
                print(f"[ring] n={part.n} chunk={dt_chunk:.3f}s "
                      f"sweeps={int(done)}", flush=True)
            if not alive:
                break
            cap = part.n
            if self.compact_enabled and cap > min_cap:
                tc = _time.perf_counter()
                if not use_pallas:
                    cliff = live < int(cap * 0.98)
                target = _ladder_target(live, min_cap)
                # Each new size is a separate XLA executable (disk-cached
                # across runs); ladder steps trade a few one-time compiles
                # for much smaller sweeps and ring drains in the death
                # tail.
                if target <= int(cap * 0.75):
                    if use_pallas:
                        # Fused: flush-ring drain (lane-indexed rings
                        # must empty before reordering) + merge + select
                        # + fresh rings, one dispatch.
                        (full, part, sel, self.tally, rc, rv,
                         rn) = compact_with_rings(
                            full, part if sel is not None else None, sel,
                            self.tally, rc, rv, rn, target=target)
                    else:
                        if sel is not None:
                            full = merge_compacted(full, part, sel)
                        else:
                            full = part
                        part, sel = select_working(full, target)
                    if dbg:
                        _sync(part.x)
                phases["compact"] += _time.perf_counter() - tc
        if use_pallas:
            td = _time.perf_counter()
            self.tally, rc, rv, rn = drain_rings(self.tally, rc, rv, rn)
            if dbg:
                _sync(self.tally)
            phases["ringdrain"] += _time.perf_counter() - td
        if sel is not None:
            full = merge_compacted(full, part, sel)
        else:
            full = part
        self.state = full
        jax.block_until_ready(self.tally)
        step_time = self.profile.stop(f"step{tt}")
        nf, nc = counts.totals()
        m = StepMetrics(step=tt, step_time=step_time, nfacets=nf,
                        ncollisions=nc, nprocessed=int(nprocessed),
                        nsweeps=int(nsweeps), phases=phases)
        if dbg:
            print("[phases] " + "  ".join(f"{k}={v:.3f}"
                                          for k, v in phases.items()),
                  flush=True)
        self.step_metrics.append(m)
        return m


    # ------------------------------------------------------------------
    def _step_flight(self, tt: int) -> StepMetrics:
        """One census timestep on the free-flight engine (flight.py).

        Host-chained chunks like the stepping path, but each chunk ends
        when a flush/segment buffer fills (the budget gate stalls the
        while_loop) and the host drains: flush entries scatter into the
        flat tally; segments rasterize into a padded 2D buffer via the
        Mosaic tile kernel (raster.raster_drain) on TPU, or the DDA
        fallback elsewhere.  The raster buffer merges into the tally once
        at the end of the step.
        """
        from .flight import drain_flushes, flight_chunk
        from .particles import merge_compacted, select_working
        from .raster import TILE, rasterize_xla
        from .transport import EventCounts, begin_timestep

        if (jax.default_backend() == "tpu"
                and self.dtype == jnp.dtype(jnp.float32)):
            return self._step_flight_fused(tt)

        cfg = self.cfg
        self.profile.start()
        master_key = jnp.uint32(tt)
        # Count processed lanes from the PRE-step state (begin_timestep
        # does not change deadness): full's buffers are donated to the
        # first flight_chunk call, and a pending read on a donated buffer
        # forces a copy through the (slow) remote-device path.
        nprocessed = jnp.count_nonzero(~self.state.dead)
        full = begin_timestep(self.state, self.mesh, self.geom,
                              self.cs_scatter, cfg.dt, master_key)
        counts = EventCounts.zeros()
        nsweeps = 0
        inv_ntotal = 1.0 / cfg.nparticles

        FCAP = self.flight_flush_cap
        SCAP = self.flight_seg_cap
        PCAP = self.flight_pair_cap
        tally_dt = self.tally.dtype
        # This method is the XLA flight path (CPU, or non-f32 debugging);
        # the TPU f32 production path returned to _step_flight_fused above,
        # so the raster here is always the DDA fallback.
        rflat = jnp.zeros(cfg.nx * cfg.ny, tally_dt)
        fbuf_cell = jnp.zeros(FCAP, jnp.int32)
        fbuf_val = jnp.zeros(FCAP, tally_dt)
        segbuf = jnp.zeros((SCAP, 8), self.dtype)
        zero_i = jnp.zeros((), jnp.int32)

        import os
        import time as _time
        dbg = bool(os.environ.get("NEUTRAL_TPU_DEBUG_PHASES"))
        phases = {"sweep": 0.0, "drain": 0.0, "compact": 0.0}
        part, sel = full, None
        min_cap = self.compact_min
        while True:
            t0 = _time.perf_counter()
            max_sw = (self.chunk_sweeps if part.n > 262144
                      else self.chunk_sweeps * 8)
            (part, counts, fbuf_cell, fbuf_val, segbuf, fcnt, scnt,
             spairs, done, n_work) = flight_chunk(
                part, counts, self.cs_scatter, fbuf_cell, fbuf_val,
                segbuf, zero_i, zero_i, zero_i, self.cs_absorb, self.geom,
                master_key, inv_ntotal, max_sw, tile=TILE, pair_cap=PCAP)
            nsweeps += int(done)
            if sel is None:
                full = part  # donated inputs: keep `full` aliased live
            t1 = _time.perf_counter()
            self.tally = drain_flushes(self.tally, fbuf_cell, fbuf_val,
                                       fcnt)
            rflat = rasterize_xla(rflat, segbuf, scnt, nx=cfg.nx,
                                  ny=cfg.ny,
                                  max_steps=cfg.nx + cfg.ny + 2)
            live = int(n_work)   # chunk-returned count: no extra dispatch
            alive = live > 0
            phases["sweep"] += t1 - t0
            phases["drain"] += _time.perf_counter() - t1
            if dbg:
                jax.block_until_ready(rflat)
                print(f"[flight] n={part.n} chunk={t1 - t0:.2f}s "
                      f"drain={_time.perf_counter() - t1:.2f}s "
                      f"scnt={int(scnt)} spairs={int(spairs)}", flush=True)
            if not alive:
                break
            cap = part.n
            if self.compact_enabled and cap > min_cap:
                t2 = _time.perf_counter()
                target = max(min_cap, 1 << (max(live, 1) - 1).bit_length())
                if target <= cap // 2:
                    if sel is not None:
                        full = merge_compacted(full, part, sel)
                    else:
                        full = part
                    part, sel = select_working(full, target)
                phases["compact"] += _time.perf_counter() - t2
        if sel is not None:
            full = merge_compacted(full, part, sel)
        else:
            full = part
        self.state = full
        self.tally = self.tally + rflat
        jax.block_until_ready(self.tally)
        step_time = self.profile.stop(f"step{tt}")
        nf, nc = counts.totals()
        m = StepMetrics(step=tt, step_time=step_time, nfacets=nf,
                        ncollisions=nc, nprocessed=int(nprocessed),
                        nsweeps=int(nsweeps), phases=phases)
        self.step_metrics.append(m)
        return m

    # ------------------------------------------------------------------
    def _step_flight_fused(self, tt: int, interpret: bool = False
                           ) -> StepMetrics:
        """Flight step on the fused Mosaic kernel (pallas_flight.py).

        Per-lane flush/segment rings live in VMEM across k-piece kernel
        calls; flush rings drain into the tally inside the chunk loop.
        Segment rings, on walker-sized meshes, rasterize into the padded
        buffer inside the chunk loop too (the in-loop VMEM-resident
        walker — segment pressure never exits the chunk); bigger meshes
        extract into the flat buffer which the host rasterizes at chunk
        boundaries.  Rings are lane-indexed, so they are always empty
        (walker) or drained host-side (fallback) before lane compaction.
        """
        from .pallas_flight import (compact_flight, extract_ring_segments,
                                    make_seg_ring, pallas_flight_chunk)
        from .pallas_sweep import drain_rings, make_rings
        from .particles import merge_compacted, select_working
        from .raster import TILE, grid_shape, raster_drain, walker_fits
        from .transport import EventCounts, begin_timestep

        cfg = self.cfg
        self.profile.start()
        master_key = jnp.uint32(tt)
        nprocessed = jnp.count_nonzero(~self.state.dead)
        full = begin_timestep(self.state, self.mesh, self.geom,
                              self.cs_scatter, cfg.dt, master_key)
        counts = EventCounts.zeros()
        nsweeps = 0
        inv_ntotal = 1.0 / cfg.nparticles

        from .raster import band_rows
        nty, ntx = grid_shape(cfg.nx, cfg.ny, TILE)
        SCAP = self.flight_seg_cap
        # VMEM-resident segment walker: no pair expansion, so the pair
        # budget is effectively unbounded and drains are gated by the
        # segment-row capacity alone.  Buffers over the VMEM budget run
        # in row bands (raster._walk_banded) — the sorted-pair fallback
        # remains only for meshes too WIDE for a single band row.
        use_walker = walker_fits(ntx, nty)
        bnty = band_rows(ntx, nty)
        band_nty = None if bnty >= nty else bnty
        PCAP = (1 << 30) if use_walker else self.flight_pair_cap
        TIERS = [1 << 20, 1 << 22, self.flight_pair_cap]
        tally_dt = self.tally.dtype

        def raster(rb, sb, nseg, npairs):
            if nseg == 0:
                return rb
            cap = next(c for c in TIERS if npairs <= c)
            return raster_drain(rb, sb, jnp.int32(nseg), tile=TILE,
                                ntx=ntx, nty=nty, pair_cap=cap,
                                interpret=interpret)

        rbuf = jnp.zeros((nty * TILE, ntx * TILE), jnp.float32)
        segbuf = jnp.zeros((SCAP, 8), self.dtype)
        zero_i = jnp.zeros((), jnp.int32)

        import os
        import time as _time
        dbg = bool(os.environ.get("NEUTRAL_TPU_DEBUG_PHASES"))
        phases = {"sweep": 0.0, "raster": 0.0, "compact": 0.0}

        part, sel = full, None
        min_cap = self.compact_min

        def pick_kmax(width, exit_live):
            """(k_pieces, max_calls, seg_repeat) for a working width.

            Small (compacted tail) widths amortize the while-loop's
            per-call bookkeeping over more fused pieces per kernel
            call.  Walker mode drains in-loop, so the ONLY reason a
            big-width chunk exits is to let the host check compaction
            cadence — and each exit is a blocking ctrl fetch (a full
            tunnel round trip; measured 4.9e8 -> 6.8e8 ev/s on split
            going 4 -> 32 calls/chunk).  With the in-kernel cliff exit
            (exit_live) bounding overshoot, walker chunks run long;
            without it, a moderate 32 still wins.
            """
            big = width > 262144
            k = (getattr(self, "flight_k_pieces", None)
                 or (8 if big else 16))
            # Tail widths in walker mode amortize the walker drain's
            # per-call fixed cost (~1.4 ms plane-stack dispatch + padded
            # buffer VMEM round trip — it dominates the ~0.4 ms kernel
            # at 65k lanes) over seg_repeat sub-calls per drain
            # (pallas_flight_chunk seg_repeat; measured on csp below).
            sr = (getattr(self, "flight_seg_repeat", None)
                  or (4 if (use_walker and not big) else 1))
            if big:
                default_mc = (64 if exit_live else 32) if use_walker else 32
            elif use_walker:
                # Tail widths, walker mode: the kernel is cheap (~0.4 ms
                # per 65k-lane call) and every chunk exit + ladder step
                # costs a blocking ~33 ms ctrl round trip through the
                # axon tunnel — run the whole death tail to work
                # exhaustion in ONE dispatch (the in-loop drains keep
                # rings empty; 512 kernel calls bounds the worst-case
                # dispatch length for link robustness).
                default_mc = 512 // sr
            else:
                default_mc = 128
            mc = getattr(self, "flight_max_calls", None) or default_mc
            return k, mc, sr

        def seg_slots(width):
            # Piece-plane rings (walker mode): plane p belongs to piece
            # p, so the ring must have exactly k_pieces planes.  The
            # sorted-pair fallback keeps count-based rings: 4 slots at
            # big widths, 8 at tail widths (deeper rings amortize the
            # extraction cadence; VMEM is plentiful there).
            if use_walker:
                k, _, sr = pick_kmax(width, 0)
                return k * sr
            return 4 if width > 262144 else 8

        fc, fv, fn = make_rings(part.n, tally_dt, ring_slots=8)
        sfields, sn = make_seg_ring(part.n, self.dtype,
                                    s_slots=seg_slots(part.n))

        def drain_segs(rbuf, sfields, sn, npend):
            """Empty the segment rings into rbuf via the
            extraction+raster loop (sorted-pair fallback path; walker
            mode drains in-loop inside the chunk program)."""
            nonlocal segbuf
            if npend <= 0:
                return rbuf, sfields, sn
            while True:
                segbuf, sb2, sp2, (sfields, sn), left = \
                    extract_ring_segments(sfields, sn, segbuf, zero_i,
                                          zero_i, tile=TILE,
                                          pair_cap=PCAP)
                rbuf = raster(rbuf, segbuf, int(sb2), int(sp2))
                if not bool(left):
                    break
            return rbuf, sfields, sn

        while True:
            t0 = _time.perf_counter()
            # Tail widths in walker mode run to completion (no cliff
            # exit): compacting 65k -> 16k -> 8k saves negligible kernel
            # time but costs a round trip + ladder dispatch per step.
            exit_live = (_flight_exit_live(part.n, min_cap)
                         if (self.compact_enabled and part.n > min_cap
                             and (part.n > 262144 or not use_walker))
                         else 0)
            k_pieces, max_calls, seg_repeat = pick_kmax(part.n, exit_live)
            (part, self.tally, counts, fc, fv, fn, sfields, sn, segbuf,
             rb_out, ctrl) = pallas_flight_chunk(
                part, self.tally, counts, fc, fv, fn, sfields, sn, segbuf,
                zero_i, zero_i, rbuf if use_walker else None,
                self.cs_scatter, self.cs_absorb, self.geom,
                master_key, inv_ntotal, max_calls, k_pieces=k_pieces,
                tile=TILE, pair_cap=PCAP, interpret=interpret,
                use_ring_walker=use_walker, ntx=ntx, nty=nty,
                seg_plane=use_walker,
                scatter_layout=self.scatter_layout,
                absorb_layout=self.absorb_layout, band_nty=band_nty,
                exit_live=exit_live, exit_collapse=_EXIT_COLLAPSE,
                seg_repeat=seg_repeat if use_walker else 1)
            if use_walker:
                # Ring-direct in-loop walker: segments rasterized into
                # rbuf INSIDE the chunk program; rings are empty at every
                # chunk exit by construction (npend is always 0), so the
                # compaction/final paths skip their re-drain checks.
                rbuf = rb_out
            # ONE control fetch per chunk: [done, sbase, spairs, n_work,
            # npend] packed device-side (separate scalar reads each cost
            # a tunnel round trip).
            done, nseg, npairs, live, npend = (
                int(v) for v in np.asarray(ctrl))
            nsweeps += done
            if sel is None:
                full = part
            t1 = _time.perf_counter()
            if not use_walker:
                rbuf = raster(rbuf, segbuf, nseg, npairs)
            phases["sweep"] += t1 - t0
            phases["raster"] += _time.perf_counter() - t1
            if dbg:
                print(f"[flight-fused] n={part.n} chunk={t1 - t0:.3f}s "
                      f"calls={done // max(k_pieces * seg_repeat, 1)} "
                      f"sbase={nseg} npend={npend}", flush=True)
            if live == 0:
                break
            cap = part.n
            if self.compact_enabled and cap > min_cap:
                t2 = _time.perf_counter()
                target = max(min_cap, 1 << (max(live, 1) - 1).bit_length())
                if target <= cap // 2:
                    # Lane-indexed segment rings must be empty before
                    # reordering.  Walker mode already emptied them
                    # in-loop (host-known — no count dispatch); only the
                    # extraction path can carry leftovers.
                    if not use_walker:
                        rbuf, sfields, sn = drain_segs(
                            rbuf, sfields, sn,
                            int(jnp.sum(jnp.minimum(sn,
                                                    sfields[0].shape[0]))))
                    # Fused: flush-ring drain + merge + select + fresh
                    # rings in ONE dispatch.  Tail widths get deeper
                    # flush rings (32 slots) to amortize the in-loop
                    # drain cadence over more pieces.
                    (full, part, sel, self.tally, fc, fv, fn, sfields,
                     sn) = compact_flight(
                        full, part if sel is not None else None, sel,
                        self.tally, fc, fv, fn, target=target,
                        ring_slots=32, s_slots=seg_slots(target))
                    if dbg:
                        jax.tree_util.tree_map(lambda a: a, part)
                        phases["compact_fused"] = phases.get(
                            "compact_fused", 0.0) + (_time.perf_counter()
                                                     - t2)
                phases["compact"] += _time.perf_counter() - t2
        # final ring drains (skipped when the rings emptied in-loop)
        t3 = _time.perf_counter()
        self.tally, fc, fv, fn = drain_rings(self.tally, fc, fv, fn)
        if not use_walker:
            rbuf, sfields, sn = drain_segs(
                rbuf, sfields, sn,
                int(jnp.sum(jnp.minimum(sn, sfields[0].shape[0]))))
        phases["raster"] += _time.perf_counter() - t3
        if sel is not None:
            full = merge_compacted(full, part, sel)
        else:
            full = part
        self.state = full
        self.tally = self.tally + rbuf[:cfg.ny, :cfg.nx].reshape(
            -1).astype(tally_dt)
        t4 = _time.perf_counter()
        jax.block_until_ready(self.tally)
        # The final sync drains every still-queued dispatch (final ring
        # drain, rbuf merge, trailing compaction) — time it so the phase
        # table accounts for the whole step.
        phases["final_sync"] = _time.perf_counter() - t4
        step_time = self.profile.stop(f"step{tt}")
        nf, nc = counts.totals()
        m = StepMetrics(step=tt, step_time=step_time, nfacets=nf,
                        ncollisions=nc, nprocessed=int(nprocessed),
                        nsweeps=int(nsweeps), phases=phases)
        if dbg:
            print("[phases] " + "  ".join(f"{k}={v:.3f}"
                                          for k, v in phases.items()),
                  flush=True)
        self.step_metrics.append(m)
        return m


def within_tolerance(expected: float, actual: float, tol: float) -> bool:
    """Relative-tolerance check, as arch's within_tolerance."""
    if expected == 0.0:
        return abs(actual) <= tol
    return abs(actual - expected) / abs(expected) <= tol


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="neutral_tpu",
        description="TPU-native Monte Carlo neutral-particle transport")
    p.add_argument("params", help="problem deck (.params file)")
    p.add_argument("--dtype", default=None,
                   choices=["float32", "float64"],
                   help="compute dtype (default: deck/config value)")
    p.add_argument("--events-per-sweep", type=int, default=None,
                   help="inner unrolled events per device round-trip")
    p.add_argument("--nparticles", type=int, default=None,
                   help="override the deck's particle count")
    p.add_argument("--iterations", type=int, default=None,
                   help="override the deck's timestep count")
    p.add_argument("--mesh-scale", type=int, default=None,
                   help="divide nx/ny by this factor (quick runs)")
    p.add_argument("--checkpoint", default=None,
                   help="write a checkpoint after the final step "
                        "(.npz suffix = single-file numpy backend, "
                        "otherwise an Orbax directory)")
    p.add_argument("--restore", default=None,
                   help="resume from a checkpoint (npz file or Orbax "
                        "directory)")
    p.add_argument("--trace-dir", default=None,
                   help="jax.profiler trace output directory")
    p.add_argument("--backend", default="jax", choices=["jax", "native"],
                   help="jax = event-based XLA engine (default); "
                        "native = history-based C++/OpenMP host engine")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "xla", "pallas", "flight"],
                   help="sweep engine for the jax backend (auto: on TPU, "
                        "free-flight engine for decks with near-vacuum "
                        "regions, fused Pallas ring engine otherwise; "
                        "xla = unfused event sweep)")
    p.add_argument("--decomposition", default="replicated",
                   choices=["replicated", "spatial", "spatial2d"],
                   help="multi-device strategy: replicated mesh with "
                        "sharded particles (reference master semantics), "
                        "spatial y-slabs, or 2D (x,y) blocks — both with "
                        "flow-controlled particle migration")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host run: call jax.distributed.initialize "
                        "with environment-provided rendezvous (TPU pods "
                        "auto-detect) before device discovery — the TPU "
                        "analog of the reference's MPI launch "
                        "(main.c:62-64)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="explicit multi-host rendezvous address (implies "
                        "--distributed; requires --num-processes and "
                        "--process-id)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)

    if args.distributed or args.coordinator:
        from .parallel import initialise_distributed
        initialise_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    cfg = load_config(args.params)
    if args.nparticles:
        cfg = cfg.with_(nparticles=args.nparticles, expected_tally=None)
    if args.iterations:
        cfg = cfg.with_(niters=args.iterations, expected_tally=None)
    if args.mesh_scale:
        cfg = cfg.with_(nx=cfg.nx // args.mesh_scale,
                        ny=cfg.ny // args.mesh_scale, expected_tally=None)
    if args.dtype:
        cfg = cfg.with_(dtype=args.dtype, tally_dtype=args.dtype)
    if args.engine != "auto":
        cfg = cfg.with_(engine=args.engine)

    if args.backend == "native":
        # The host engine has no checkpoint/trace/decomposition support;
        # reject rather than silently ignore (reference: arch TERMINATE on
        # bad input).
        unsupported = {"--checkpoint": args.checkpoint,
                       "--restore": args.restore,
                       "--trace-dir": args.trace_dir}
        if args.decomposition != "replicated":
            unsupported["--decomposition"] = args.decomposition
        bad = [k for k, v in unsupported.items() if v]
        if bad:
            p.error(f"--backend native does not support: {', '.join(bad)}")
        return _run_native(cfg)

    if jnp.dtype(cfg.dtype) == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    # Startup banner (the reference prints its OpenMP thread count here,
    # main.c:52-53).  In multi-process runs only process 0 talks.
    devs = jax.devices()
    is_main = jax.process_index() == 0
    quiet = not is_main
    if is_main:
        if jax.process_count() > 1:
            print(f"Distributed: {jax.process_count()} processes, "
                  f"{len(devs)} global devices.")
        print(f"Starting up on {len(devs)} device(s): {devs[0].platform}.")
        print(f"Loading problem from {args.params}.")

    if len(devs) > 1:
        if args.decomposition == "spatial":
            from .parallel import SpatialSimulation
            sim = SpatialSimulation(cfg, quiet=quiet,
                                    events_per_sweep=args.events_per_sweep)
            if is_main:
                print(f"Spatial slab decomposition over {len(devs)} "
                      "devices.")
        elif args.decomposition == "spatial2d":
            from .parallel import Spatial2DSimulation
            sim = Spatial2DSimulation(cfg, quiet=quiet,
                                      events_per_sweep=args.events_per_sweep)
            if is_main:
                print(f"Spatial 2D decomposition over {len(devs)} devices "
                      f"({sim.py}x{sim.px}).")
        else:
            from .parallel import ShardedSimulation
            sim = ShardedSimulation(cfg, quiet=quiet,
                                    events_per_sweep=args.events_per_sweep)
            if is_main:
                print(f"Sharding particles over {len(devs)} devices.")
    else:
        sim = Simulation(cfg, quiet=quiet,
                         events_per_sweep=args.events_per_sweep)
    if args.restore:
        start = sim.restore(args.restore)
        if is_main:
            print(f"Restored checkpoint at step {start}")

    from .profiler import maybe_trace
    with maybe_trace(args.trace_dir):
        sim.run()
    if args.checkpoint:
        # Collective (state gather) — every process calls it; the write
        # itself happens on process 0 inside checkpoint().
        sim.checkpoint(args.checkpoint, len(sim.step_metrics))
    return 0


def _run_native(cfg: SimConfig) -> int:
    """Drive the history-based C++ engine with the same print contract."""
    import time

    from . import native

    sim = native.NativeSimulation(cfg)
    print(f"Native engine with {native._load().nt_num_threads()} threads.")
    wallclock = 0.0
    elapsed = 0.0
    for tt in range(1, cfg.niters + 1):
        print(f"\nIteration  {tt}")
        t0 = time.perf_counter()
        nf, nc, nproc = sim.step(tt)
        step_time = time.perf_counter() - t0
        wallclock += step_time
        print(f"Handled {nproc} particles")
        print(f"Step time  {step_time:.4f}s")
        print(f"Wallclock  {wallclock:.4f}s")
        print(f"Facets     {nf}")
        print(f"Collisions {nc}")
        print(f"Facet Events / s {nf / step_time:.2e}")
        print(f"Collision Events / s {nc / step_time:.2e}")
        elapsed += cfg.dt
        if elapsed >= cfg.sim_end:
            print("Reached end of simulation time")
            break
    total = float(sim.tally.sum())
    print(f"Final global_energy_tally {total:.15e}")
    expected = cfg.expected_tally
    if expected is None:
        print("WARNING: could not find a golden result to validate against")
    elif within_tolerance(expected, total, VALIDATE_TOLERANCE):
        print("PASSED validation.")
    else:
        print(f"FAILED validation: expected {expected:.12e}, got {total:.12e}")
    print(f"Final Wallclock {wallclock:.9f}s")
    print(f"Elapsed Simulation Time {elapsed:.6f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
