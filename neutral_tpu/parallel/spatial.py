"""Spatially-decomposed transport: sharded tally slabs + particle migration.

The reference's MPI design decomposes the mesh over ranks but never
implemented particle migration (`send_and_mark_particle` is declared in
every backend header and stubbed empty — cuda/neutral.cu:133,
neutral_data.h:35 `PARTICLE_SENT`); on `master` each rank effectively
tracks its particles across the whole mesh.  This module builds the real
feature, TPU-native:

  * 1D slab decomposition along y: shard s owns global rows
    [s*rows, (s+1)*rows) — its private tally slab (the large mutable
    state, which is what limits replicated-mesh scaling).
  * Material lookups are analytic (fast_math regions), so ANY shard can
    evaluate physics for ANY cell — no density halo exchange is needed at
    all (the TPU answer to arch's handle_boundary_2d density halo;
    main.c:70-71).
  * Lanes that cross their slab boundary FREEZE (transport.working_mask):
    their deposit was flushed at the facet crossing, so frozen lanes carry
    no tally state.  At each chunk boundary a fixed-size `ppermute`
    exchange ships them to the neighbor shard (slab decomposition means
    the destination is always ±1), where they thaw and continue.  Unsent
    overflow lanes simply stay frozen and retry next chunk — migration is
    eventually-consistent with zero loss.
  * Histories are keyed by immutable pid, so migrating a particle changes
    NOTHING physically: tallies and event counts match the single-device
    engine bit-for-bit in f64 (tested on the 8-device CPU mesh).

Capacity: each shard's lane arrays get 2x the peak initial occupancy as
headroom; migrated-away lanes leave dead husks that become free slots, so
steady-state churn is self-balancing.  If a receive ever finds no free
slot the step pauses, doubles the per-shard capacity and repartitions all
lanes by owner on the host, then resumes — no silent particle loss, and
(pid-keyed RNG) no physical effect; after several doublings it aborts
loudly instead (a capacity leak would otherwise grow unbounded).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import driver as driver_mod
from .. import transport
from ..config import SimConfig
from ..particles import ParticleState
from ..transport import EventCounts, Geometry
from .flight_sharded import FlightDecomposedMixin
from .common import _CTRL_MAXLIVE, _pack_ctrl, _read_ctrl
from .sharding import _state_spec, make_device_mesh


def _partition_by_slab(state: ParticleState, nshards: int, rows: int,
                       cap: int) -> ParticleState:
    """Host-side: group lanes by owner slab into (nshards*cap,) arrays."""
    owner = np.clip(np.asarray(state.celly) // rows, 0, nshards - 1)
    return _partition_by_owner(state, owner, nshards, cap)


def _inject_partitioned(cfg, mesh2d, device_mesh: Mesh, axes, own_fn,
                        dtype, local_coords):
    """Device-side per-shard source injection: (cap, sharded state).

    The reference injects each rank's particles independently from the
    source-box ∩ subdomain overlap (area-fraction arithmetic,
    neutral_data.c:64-95) — no global pass, which is what scales startup
    to 1e9+ particles.  Its per-rank streams make results depend on the
    decomposition, though; this framework keeps decomposition-invariant
    GLOBAL pid streams, so the TPU-native equivalent is: every shard
    re-derives, ON DEVICE, which global pids are born in its block
    (birth position is a pure function of pid — particles.source_cells)
    and keeps its own.  Replicated O(N) device compute (a few ms)
    replaces the old global inject + host partition + per-shard
    re-upload (measured ~56 MB at ~40 MB/s per shard on this host —
    BASELINE.md spatial caveat).  Host traffic: ONE replicated scalar
    (the pmax of the per-shard counts, to size the static capacity) —
    replicated so the fetch is addressable in every process of a
    multi-host run.

    `own_fn(cellx, celly) -> bool mask` runs inside shard_map and reads
    lax.axis_index to identify the shard.  The packed layout is
    bitwise-identical to _partition_by_owner's (owned live lanes in pid
    order, zeroed dead padding to cap).
    """
    from ..particles import inject_fields, source_cells

    n = cfg.nparticles
    src = dict(source_x0=cfg.source.xpos * cfg.width,
               source_y0=cfg.source.ypos * cfg.height,
               source_width=cfg.source.width * cfg.width,
               source_height=cfg.source.height * cfg.height)

    def owned():
        pid = jnp.arange(n, dtype=jnp.uint32)
        _, _, cellx, celly = source_cells(mesh2d, pid, **src, dtype=dtype,
                                          rng_scheme=cfg.rng)
        return own_fn(cellx, celly)

    ax_names = device_mesh.axis_names

    def count_fn():
        c = jnp.count_nonzero(owned()).astype(jnp.int32)
        return lax.pmax(c, ax_names if len(ax_names) > 1 else ax_names[0])

    peak_arr = jax.jit(shard_map(count_fn, mesh=device_mesh, in_specs=(),
                                 out_specs=P(), check_vma=False))()
    peak = int(jax.device_get(peak_arr))
    cap = max(((2 * peak + 8191) // 8192) * 8192, 8192)

    def fill_fn():
        own = owned()
        sel = jnp.nonzero(own, size=cap, fill_value=n)[0]
        valid = sel < n
        pid = jnp.where(valid, sel, 0).astype(jnp.uint32)
        return inject_fields(
            mesh2d, pid, valid, **src,
            initial_energy=cfg.initial_energy, dt=cfg.dt, dtype=dtype,
            rng_scheme=cfg.rng, local_coords=local_coords,
            zero_padding=True)

    state = jax.jit(shard_map(fill_fn, mesh=device_mesh, in_specs=(),
                              out_specs=_state_spec(axes),
                              check_vma=False))()
    return cap, state


def _migrate_axis(s: ParticleState, field: str, off, axis: str,
                  nshards: int, win: int, cap_xfer: int, gate=None):
    """One ±1-neighbor migration round along one mesh axis.

    `field` is the owning cell coordinate ("celly" for slab rows along the
    mesh axis, "cellx" for columns), `off`/`win` the shard's window.
    Returns (state, moved_local).

    Flow control: each shard advertises its free-slot count to both
    neighbors (two scalar ppermutes); senders ship at most what the
    receiver's slot windows can absorb, so a receive can NEVER drop a
    particle.  Lanes that don't fit stay frozen and retry next round; the
    caller detects a stalled backlog (pending without movement) and grows
    capacity.

    `gate` (optional bool mask) withholds lanes from this round — the
    fused flight path gates on ring-empty so lane-indexed ring entries
    can never be orphaned by a lane reorder; gated lanes retry after the
    next ring drain exactly like budget-vetoed ones.
    """
    if nshards == 1:
        # Degenerate axis (1x1 grids, or one spatial axis unsplit): no
        # neighbors exist, so skip the pack/exchange/place machinery.
        return s, jnp.zeros((), jnp.int32)
    live = (~s.dead) & (s.dt_to_census > 0)
    if gate is not None:
        live = live & gate
    lc = getattr(s, field) - off
    go_up = live & (lc >= win)
    go_dn = live & (lc < 0)

    perm_up = [(i, i + 1) for i in range(nshards - 1)]
    perm_dn = [(i + 1, i) for i in range(nshards - 1)]

    # Receiver slot windows: from-below traffic lands in free[:cap_xfer],
    # from-above in free[cap_xfer:2*cap_xfer].  Advertise the matching
    # budgets to the senders (shards with no neighbor see budget 0).
    nfree = jnp.count_nonzero(s.dead).astype(jnp.int32)
    budget_below = jnp.minimum(nfree, cap_xfer)              # for sender s-1
    budget_above = jnp.maximum(
        jnp.minimum(nfree, 2 * cap_xfer) - cap_xfer, 0)      # for sender s+1
    my_up_budget = lax.ppermute(budget_below, axis, perm_dn)  # from s+1
    my_dn_budget = lax.ppermute(budget_above, axis, perm_up)  # from s-1

    def pack(mask, budget):
        idx = jnp.nonzero(mask, size=cap_xfer, fill_value=-1)[0]
        valid = (idx >= 0) & (jnp.arange(cap_xfer) < budget)
        safe = jnp.clip(idx, 0, None)
        buf = jax.tree_util.tree_map(lambda a: a[safe], s)
        return buf, valid, safe

    buf_up, val_up, idx_up = pack(go_up, my_up_budget)
    buf_dn, val_dn, idx_dn = pack(go_dn, my_dn_budget)

    # Sender side: shipped lanes become dead husks (free slots).  Invalid
    # pack slots are routed to an out-of-bounds sentinel and dropped —
    # clipping them to 0 would make duplicate writes race with a real
    # update of lane 0.
    n = s.dead.shape[0]
    dead = s.dead
    dead = dead.at[jnp.where(val_up, idx_up, n)].set(True, mode="drop")
    dead = dead.at[jnp.where(val_dn, idx_dn, n)].set(True, mode="drop")
    s = ParticleState(**{**{f: getattr(s, f) for f in
                            ParticleState.__dataclass_fields__},
                         "dead": dead})

    def shuffle(tree, perm):
        return jax.tree_util.tree_map(
            lambda a: lax.ppermute(a, axis, perm), tree)

    recv_from_below = shuffle(buf_up, perm_up)   # arrives at shard s+1
    rv_below = lax.ppermute(val_up, axis, perm_up)
    recv_from_above = shuffle(buf_dn, perm_dn)   # arrives at shard s-1
    rv_above = lax.ppermute(val_dn, axis, perm_dn)

    # Receiver side: thaw into free (dead) slots.  NOTE: the free list is
    # computed AFTER senders marked shipped lanes dead, so it can only be
    # larger than the advertised budget — placement cannot overflow.
    free = jnp.nonzero(s.dead, size=2 * cap_xfer, fill_value=-1)[0]

    def place(state, buf, valid, slots):
        ok = valid & (slots >= 0)
        tgt = jnp.where(ok, slots, n)  # sentinel -> dropped

        def put(f, b):
            return f.at[tgt].set(b, mode="drop")

        return jax.tree_util.tree_map(put, state, buf)

    nmoved = (jnp.count_nonzero(val_up) + jnp.count_nonzero(val_dn))
    s = place(s, recv_from_below, rv_below, free[:cap_xfer])
    s = place(s, recv_from_above, rv_above, free[cap_xfer:])
    return s, nmoved.astype(jnp.int32)


class SpatialSimulation(FlightDecomposedMixin,
                        driver_mod.SimulationBase):
    """Slab-decomposed multi-chip simulation with particle migration."""

    # The free-flight engine runs under the spatial decompositions too
    # (windowed flight_core): one engine interface for every
    # decomposition x problem, like the reference's uniform backend
    # interface (neutral_interface.h:11-36).
    supports_flight = True

    def __init__(self, cfg: SimConfig, *, dtype=None,
                 events_per_sweep: int | None = None,
                 device_mesh: Mesh | None = None, quiet: bool = False):
        super().__init__(cfg, dtype=dtype, events_per_sweep=events_per_sweep,
                         quiet=quiet)
        self.device_mesh = device_mesh or make_device_mesh()
        self.axis = self.device_mesh.axis_names[0]
        nshards = self.device_mesh.devices.size
        if cfg.ny % nshards:
            raise ValueError(f"ny={cfg.ny} not divisible by {nshards} shards")
        self.nshards = nshards
        self.rows = cfg.ny // nshards
        # Shard-local geometry: tally slab is rows x nx; reflection still
        # uses the global extent.  rects stay GLOBAL — the flight engine
        # clamps them to each shard's window dynamically.
        self.geom = Geometry(
            global_nx=cfg.nx, global_ny=cfg.ny, nx=cfg.nx, ny=self.rows,
            dx=cfg.width / cfg.nx, dy=cfg.height / cfg.ny,
            regions=self.geom.regions, rng_scheme=cfg.rng,
            rects=self.geom.rects, same_xs=self.geom.same_xs)

        rows = self.rows
        axis = self.axis

        def own_fn(cellx, celly):
            me = lax.axis_index(axis).astype(jnp.int32)
            return jnp.clip(celly // rows, 0, nshards - 1) == me

        self.cap, self.state = _inject_partitioned(
            cfg, self.mesh, self.device_mesh, axis, own_fn, self.dtype,
            local_coords=(None if self.use_flight else
                          driver_mod._local_coords(cfg, self.dtype)))
        self.cap_xfer = max(self.cap // 8, 1024)
        self.tally_parts = jax.device_put(
            jnp.zeros((nshards, self.rows * cfg.nx),
                      dtype=jnp.dtype(cfg.tally_dtype)),
            NamedSharding(self.device_mesh, P(self.axis, None)))
        self._init_density_parts()

    def _init_density_parts(self) -> None:
        """Shard the density grid alongside the tally slabs.

        Arbitrary decks (no analytic regions: user cs tables / density
        grids) run decomposed with each shard owning ITS slab's density
        rows — no halo exchange at all, since migration guarantees every
        live lane sits on its owner shard (the TPU answer to arch's
        density halo, main.c:70-71).  fast_math decks evaluate density
        analytically and carry a 1-element placeholder.
        """
        if not self.cfg.uses_density_grid:
            slabs = np.zeros((self.nshards, 1), np.dtype(self.dtype))
        else:
            slabs = self._density_slabs(np.asarray(self.mesh.density))
        self.density_parts = jax.device_put(
            jnp.asarray(slabs), NamedSharding(self.device_mesh,
                                              self._tally_pspec()))

    def _density_slabs(self, dens: np.ndarray) -> np.ndarray:
        return dens.reshape(self.nshards, self.rows * self.cfg.nx)

    def _local_mesh(self, d_row):
        """Shard-local Mesh2D: replicated edges + this shard's density."""
        from ..mesh import Mesh2D
        if not self.cfg.uses_density_grid:
            return self.mesh
        dens = d_row[0].reshape(self.geom.ny, self.geom.nx)
        return Mesh2D(nx=self.geom.nx, ny=self.geom.ny,
                      width=self.mesh.width, height=self.mesh.height,
                      edgex=self.mesh.edgex, edgey=self.mesh.edgey,
                      density=dens, uniform=self.mesh.uniform)

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def _begin(self, state, dens_parts, mk):
        axis = self.axis
        rows = self.rows

        def shard_fn(s, d_row):
            y_off = (lax.axis_index(axis) * rows).astype(jnp.int32)
            s = transport.begin_timestep(s, self._local_mesh(d_row),
                                         self.geom, self.cs_scatter,
                                         self.cfg.dt, mk, y_off_dyn=y_off)
            nproc = lax.psum(jnp.count_nonzero(~s.dead).astype(jnp.uint32),
                             axis)
            return s, nproc

        fn = shard_map(shard_fn, mesh=self.device_mesh,
                       in_specs=(_state_spec(axis), P(self.axis, None)),
                       out_specs=(_state_spec(axis), P()), check_vma=False)
        return fn(state, dens_parts)

    @partial(jax.jit, static_argnames=("self",))
    def _chunk(self, state, tally_parts, dens_parts, rings, mk):
        """One bounded sweep chunk + migration round per shard.

        `rings` (pallas path only, else None) are the PERSISTENT
        pending-flush rings: entries are anonymous — they carry
        shard-local cell indices, so migrating the lane that wrote them
        leaves them valid — and therefore survive migration untouched;
        the caller drains only before lane reorders (compaction /
        repartition) and at step end.
        """
        axis = self.axis
        rows = self.rows

        def shard_fn(s, t_row, d_row, rg):
            y_off = (lax.axis_index(axis) * rows).astype(jnp.int32)
            if self.use_pallas:
                from ..pallas_sweep import pallas_sweep_chunk
                rc, rv, rn = rg
                (s, t, c, rc, rv, rn, nsweeps, _) = pallas_sweep_chunk(
                    s, t_row[0], EventCounts.zeros(), rc, rv, rn,
                    self.cs_scatter, self.cs_absorb, self.geom, mk,
                    1.0 / self.cfg.nparticles, self.chunk_sweeps,
                    k_events=self.k_events, y_off=y_off,
                    interpret=getattr(self, "pallas_interpret", False),
                    scatter_layout=self.scatter_layout,
                    absorb_layout=self.absorb_layout,
                    density_grid=(d_row[0] if self.geom.regions is None
                                  else None))
                rg = (rc, rv, rn)
            else:
                s, t, c, nsweeps, _ = transport.sweep_chunk(
                    s, t_row[0], EventCounts.zeros(),
                    self._local_mesh(d_row),
                    self.cs_scatter, self.cs_absorb, self.geom, mk,
                    1.0 / self.cfg.nparticles, self.chunk_sweeps,
                    events_per_sweep=self.events_per_sweep, y_off_dyn=y_off)
            s, moved = _migrate_axis(s, "celly", y_off, axis,
                                     self.nshards, rows, self.cap_xfer)
            live = (~s.dead) & (s.dt_to_census > 0)
            ly = s.celly - y_off
            pending = jnp.count_nonzero(live & ((ly < 0) | (ly >= rows)))
            work = jnp.count_nonzero(
                transport.working_mask(s, self.geom, y_off)).astype(
                    jnp.uint32)
            work = lax.psum(work + pending.astype(jnp.uint32), axis)
            pending_g = lax.psum(pending.astype(jnp.int32), axis)
            moved_g = lax.psum(moved, axis)
            err = ((pending_g > 0) & (moved_g == 0)).astype(jnp.int32)
            # maxlive rides the ctrl vector: the compaction ladder needs
            # the worst shard's live count anyway, and packing it here
            # kills the separate max_live_sharded dispatch per chunk.
            ctrl = _pack_ctrl(axis, c, done=lax.pmax(nsweeps, axis),
                              work=work, err=err,
                              maxlive=jnp.count_nonzero(live))
            return s, t[None, :], rg, ctrl

        ring_spec = (None if rings is None else
                     (P(None, axis), P(None, axis), P(axis)))
        fn = shard_map(
            shard_fn, mesh=self.device_mesh,
            in_specs=(_state_spec(axis), P(axis, None), P(axis, None),
                      ring_spec),
            out_specs=(_state_spec(axis), P(axis, None),
                       ring_spec, P()),
            check_vma=False)
        return fn(state, tally_parts, dens_parts, rings)

    # ------------------------------------------------------------------
    def _repartition(self, cap: int) -> None:
        """Regroup every live lane onto its owner shard at a new capacity.

        Physically invisible (histories are pid-keyed); clears any frozen
        out-of-slab backlog in one stroke, so it doubles as the overflow
        recovery path.  host_global keeps it legal when shards span
        processes (collective — every process repartitions together,
        which holds: the triggering ctrl vector is replicated).
        """
        from ..io_utils import host_global
        host = jax.tree_util.tree_map(host_global, self.state)
        owner = np.clip(np.asarray(host.celly) // self.rows, 0,
                        self.nshards - 1)
        cap = _cap_for(owner, np.asarray(host.dead), self.nshards, cap)
        packed = _partition_by_owner(host, owner, self.nshards, cap)
        self.cap = cap
        self.cap_xfer = max(cap // 8, 1024)
        shard_sharding = NamedSharding(self.device_mesh, P(self.axis))
        self.state = jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), shard_sharding), packed)

    # ------------------------------------------------------------------
    # Free-flight engine under the spatial decomposition
    # ------------------------------------------------------------------

    def _axes_names(self):
        """Mesh axis name(s) for psum/P specs (str for 1D, tuple for 2D)."""
        return self.axis

    def _dyn_offsets(self):
        """(x_off, y_off) traced window origin inside a shard_map body.

        1D slabs span the full x extent, so only y is windowed; an
        unsplit axis (single shard) passes None so the non-windowed
        kernel — the exact replicated-path executable — runs.
        """
        if self.nshards == 1:
            return None, None
        return None, (lax.axis_index(self.axis) * self.rows).astype(
            jnp.int32)

    def _migrate_shard(self, s, x_off, y_off, gate=None):
        """Run this decomposition's migration round(s); returns (s, moved)."""
        return _migrate_axis(s, "celly", y_off, self.axis, self.nshards,
                             self.rows, self.cap_xfer, gate=gate)

    def _flight_begin(self, mk):
        return self._begin(self.state, self.density_parts, mk)

    def _fresh_step_rings(self, total: int, S: int = 16):
        """Empty pending-flush rings sharded alongside `total` lanes."""
        axes = self._axes_names()
        col = NamedSharding(self.device_mesh, P(None, axes))
        lane = NamedSharding(self.device_mesh, P(axes))
        return (jax.device_put(jnp.full((S, total), -1, jnp.int32), col),
                jax.device_put(jnp.zeros((S, total),
                                         self.tally_parts.dtype), col),
                jax.device_put(jnp.zeros((total,), jnp.int32), lane))

    def step(self, tt: int):
        from .sharding import (drain_rings_sharded,
                               merge_compacted_sharded)
        if self.use_flight:
            return self._step_flight_decomposed(tt)
        self.profile.start()
        mk = jnp.uint32(tt)
        self.state, nprocessed = self._begin(self.state,
                                             self.density_parts, mk)
        nf = nc = nsweeps = 0
        grows = 0
        # Per-shard live-lane compaction ladder (long-tail decks): the
        # arrival-safe padded selection keeps free slots mapped to real
        # full-capacity lanes so migration keeps working while compacted.
        part, sel = self.state, None
        full = part
        min_cap = self.compact_min
        # Pending-flush rings PERSIST across chunks and migration rounds
        # (entries are anonymous: shard-local cell indices stay valid no
        # matter which lane occupies the slot) — drained only before
        # lane reorders and at step end.
        rings = (self._fresh_step_rings(part.x.shape[0])
                 if self.use_pallas else None)

        def drain():
            nonlocal rings
            if self.use_pallas:
                self.tally_parts, rc, rv, rn = drain_rings_sharded(
                    self.tally_parts, *rings, self.device_mesh)
                rings = (rc, rv, rn)

        while True:
            (part, self.tally_parts, rings,
             ctrl_dev) = self._chunk(part, self.tally_parts,
                                     self.density_parts, rings, mk)
            # ONE replicated fetch per chunk: loop decisions + exact
            # 64-bit event counts (the chunk's sweeps happened regardless
            # of migration backlog, so counts bank BEFORE any recovery).
            head, dnf, dnc = _read_ctrl(ctrl_dev)
            done, work, err = head[0], head[1], head[2]
            maxlive = head[_CTRL_MAXLIVE]
            nf += dnf
            nc += dnc
            nsweeps += done
            if sel is None:
                full = part
            if err:
                grows += 1
                if grows > 6:
                    raise RuntimeError(
                        "particle migration overflow persists after "
                        f"{grows - 1} capacity doublings — aborting")
                self._print(f"migration overflow: growing shard capacity "
                            f"{self.cap} -> {2 * self.cap}, repartitioning")
                drain()   # rings are lane-slot-indexed: empty before reorder
                if sel is not None:
                    full = merge_compacted_sharded(full, part, sel,
                                                   self.device_mesh)
                self.state = full
                self._repartition(2 * self.cap)
                part, sel = self.state, None
                full = part
                if self.use_pallas:
                    rings = self._fresh_step_rings(part.x.shape[0])
                continue
            if work == 0:
                break
            per_shard = part.x.shape[0] // self.nshards
            if self.compact_enabled and per_shard > min_cap:
                # 2x headroom over the worst shard keeps migration's
                # free-slot supply healthy while compacted (maxlive rode
                # the ctrl vector — no extra dispatch).
                target = max(min_cap,
                             2 << (max(maxlive, 1) - 1).bit_length())
                if target <= per_shard // 2:
                    # Fused: ring drain (lane-slot-indexed rings must
                    # empty before reordering) + merge + arrival-safe
                    # reselect + fresh rings, one dispatch.
                    from .sharding import compact_sharded
                    rc, rv, rn = rings if rings is not None \
                        else (None, None, None)
                    (full, part, sel, self.tally_parts, rc, rv,
                     rn) = compact_sharded(
                        full, part if sel is not None else None, sel,
                        self.tally_parts, rc, rv, rn, target=target,
                        mesh_axes=self.device_mesh, padded=True)
                    rings = ((rc, rv, rn) if self.use_pallas else None)
        drain()
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

    # ------------------------------------------------------------------
    @property
    def tally(self) -> jnp.ndarray:
        """Global (ny*nx,) tally assembled from the shard slabs."""
        return self.tally_parts.reshape(-1)

    def host_tally(self) -> np.ndarray:
        """f64 global flat tally; gathers slabs (multi-process collective).

        1D slabs are row-contiguous, so the (nshards, rows*nx) partials
        flatten straight into the global row-major grid.
        """
        from ..io_utils import host_global
        return np.asarray(host_global(self.tally_parts),
                          dtype=np.float64).reshape(-1)

    def global_tally_sum(self) -> float:
        return float(self.host_tally().sum())

    # ------------------------------------------------------------------
    # Checkpoint/restore: the saved layout is whatever lane order the
    # writer had (single-device flat, sharded, or a different spatial
    # capacity).  Restore repartitions every live lane onto its owner
    # shard at a fitting capacity — pid-keyed histories make the
    # reordering physically invisible — and scatters the saved global
    # tally back into the per-shard slabs.

    def _restore_owner(self, host: ParticleState) -> np.ndarray:
        return np.clip(np.asarray(host.celly) // self.rows, 0,
                       self.nshards - 1)

    def _shard_spec(self):
        return NamedSharding(self.device_mesh, P(self.axis))

    def _tally_slabs(self, tally: np.ndarray) -> np.ndarray:
        """Global flat (ny*nx,) tally -> (nshards, rows*nx) slab rows."""
        return np.asarray(tally).reshape(self.nshards,
                                         self.rows * self.cfg.nx)

    def restore(self, path: str) -> int:
        from .. import io_utils
        state, tally, step, t = io_utils.load_checkpoint(
            path, expect_coords=self._coords_convention())
        dt = self.dtype
        host = ParticleState(
            x=np.asarray(state.x, dt), y=np.asarray(state.y, dt),
            omega_x=np.asarray(state.omega_x, dt),
            omega_y=np.asarray(state.omega_y, dt),
            energy=np.asarray(state.energy, dt),
            weight=np.asarray(state.weight, dt),
            dt_to_census=np.asarray(state.dt_to_census, dt),
            mfp_to_collision=np.asarray(state.mfp_to_collision, dt),
            deposit=np.asarray(state.deposit, dt),
            cellx=np.asarray(state.cellx, np.int32),
            celly=np.asarray(state.celly, np.int32),
            dead=np.asarray(state.dead, bool),
            pid=np.asarray(state.pid, np.uint32),
            counter=np.asarray(state.counter, np.uint32))
        owner = self._restore_owner(host)
        cap = _cap_for(owner, np.asarray(host.dead), self.nshards, self.cap)
        packed = _partition_by_owner(host, owner, self.nshards, cap)
        self.cap = cap
        self.cap_xfer = max(cap // 8, 1024)
        spec = self._shard_spec()
        self.state = jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), spec), packed)
        self._set_tally(jnp.asarray(np.asarray(tally),
                                    jnp.dtype(self.cfg.tally_dtype)))
        self.elapsed_sim_time = t
        return step

    def _set_tally(self, tally) -> None:
        slabs = self._tally_slabs(np.asarray(tally))
        self.tally_parts = jax.device_put(
            jnp.asarray(slabs, jnp.dtype(self.cfg.tally_dtype)),
            NamedSharding(self.device_mesh, self._tally_pspec()))

    def _tally_pspec(self):
        return P(self.axis, None)


# ---------------------------------------------------------------------------
# 2D (x, y) decomposition
# ---------------------------------------------------------------------------

def _partition_by_owner(state: ParticleState, owner: np.ndarray,
                        nshards: int, cap: int) -> ParticleState:
    """Host-side: group lanes by owner shard into (nshards*cap,) arrays."""
    dead = np.asarray(state.dead)

    def build(a):
        a = np.asarray(a)
        out = np.zeros((nshards, cap) + a.shape[1:], a.dtype)
        for s in range(nshards):
            sel = np.flatnonzero((owner == s) & ~dead)
            out[s, :sel.size] = a[sel]
        return out.reshape(nshards * cap, *a.shape[1:])

    new = jax.tree_util.tree_map(build, state)
    deadflag = np.ones((nshards, cap), bool)
    for s in range(nshards):
        n_s = int(((owner == s) & ~dead).sum())
        deadflag[s, :n_s] = False
    return ParticleState(
        x=new.x, y=new.y, omega_x=new.omega_x, omega_y=new.omega_y,
        energy=new.energy, weight=new.weight, dt_to_census=new.dt_to_census,
        mfp_to_collision=new.mfp_to_collision, deposit=new.deposit,
        cellx=new.cellx, celly=new.celly,
        dead=deadflag.reshape(-1), pid=new.pid, counter=new.counter)


def _cap_for(owner: np.ndarray, dead: np.ndarray, nshards: int,
             requested: int) -> int:
    """Per-shard capacity >= requested AND >= 2x the peak live occupancy."""
    peak = int(np.bincount(owner[~dead], minlength=nshards).max()) \
        if (~dead).any() else 0
    need = max(requested, 2 * peak)
    return max(((need + 8191) // 8192) * 8192, 8192)


def factor_grid(ndev: int, nx: int, ny: int) -> tuple[int, int]:
    """(py, px) near-square factorization with py | ny and px | nx."""
    best = None
    for py in range(1, ndev + 1):
        if ndev % py:
            continue
        px = ndev // py
        if ny % py or nx % px:
            continue
        score = abs(py - px)
        if best is None or score < best[0]:
            best = (score, py, px)
    if best is None:
        raise ValueError(f"cannot factor {ndev} devices over {nx}x{ny} mesh")
    return best[1], best[2]


class Spatial2DSimulation(SpatialSimulation):
    """2D (x, y) block decomposition with two-phase particle migration.

    Each shard owns a rows x cols tally block; migration runs an x-axis
    exchange (along mesh axis "px") then a y-axis exchange (along "py")
    per chunk, so a diagonal move completes within one chunk round.  Flow
    control, capacity auto-resize and the frozen-lane retry semantics are
    inherited from the 1D slab implementation.
    """

    def __init__(self, cfg: SimConfig, *, dtype=None,
                 events_per_sweep: int | None = None,
                 device_mesh: Mesh | None = None, quiet: bool = False,
                 grid: tuple[int, int] | None = None):
        driver_mod.SimulationBase.__init__(
            self, cfg, dtype=dtype, events_per_sweep=events_per_sweep,
            quiet=quiet)
        devs = (device_mesh.devices.reshape(-1) if device_mesh is not None
                else np.asarray(jax.devices()))
        ndev = devs.size
        py, px = grid or factor_grid(ndev, cfg.nx, cfg.ny)
        if py * px != ndev or cfg.ny % py or cfg.nx % px:
            raise ValueError(
                f"grid {py}x{px} must use all {ndev} devices and divide "
                f"the {cfg.nx}x{cfg.ny} mesh")
        self.py, self.px = py, px
        self.device_mesh = Mesh(np.asarray(devs).reshape(py, px),
                                ("py", "px"))
        self.axes = ("py", "px")
        self.nshards = ndev
        self.rows = cfg.ny // py
        self.cols = cfg.nx // px
        self.geom = Geometry(
            global_nx=cfg.nx, global_ny=cfg.ny, nx=self.cols, ny=self.rows,
            dx=cfg.width / cfg.nx, dy=cfg.height / cfg.ny,
            regions=self.geom.regions, rng_scheme=cfg.rng,
            rects=self.geom.rects, same_xs=self.geom.same_xs)

        rows, cols = self.rows, self.cols
        py, px = self.py, self.px

        def own_fn(cellx, celly):
            oy = jnp.clip(celly // rows, 0, py - 1)
            ox = jnp.clip(cellx // cols, 0, px - 1)
            return ((oy == lax.axis_index("py").astype(jnp.int32))
                    & (ox == lax.axis_index("px").astype(jnp.int32)))

        self.cap, self.state = _inject_partitioned(
            cfg, self.mesh, self.device_mesh, self.axes, own_fn, self.dtype,
            local_coords=(None if self.use_flight else
                          driver_mod._local_coords(cfg, self.dtype)))
        self.cap_xfer = max(self.cap // 8, 1024)
        self.tally_parts = jax.device_put(
            jnp.zeros((ndev, self.rows * self.cols),
                      dtype=jnp.dtype(cfg.tally_dtype)),
            NamedSharding(self.device_mesh, P(self.axes, None)))
        self._init_density_parts()

    def _density_slabs(self, dens: np.ndarray) -> np.ndarray:
        blocks = dens.reshape(self.py, self.rows, self.px, self.cols)
        return blocks.transpose(0, 2, 1, 3).reshape(
            self.nshards, self.rows * self.cols)

    def _owner_of(self, state) -> np.ndarray:
        oy = np.clip(np.asarray(state.celly) // self.rows, 0, self.py - 1)
        ox = np.clip(np.asarray(state.cellx) // self.cols, 0, self.px - 1)
        return (oy * self.px + ox).astype(np.int64)

    def _repartition(self, cap: int) -> None:
        from ..io_utils import host_global
        host = jax.tree_util.tree_map(host_global, self.state)
        owner = self._owner_of(host)
        cap = _cap_for(owner, np.asarray(host.dead), self.nshards, cap)
        packed = _partition_by_owner(host, owner, self.nshards, cap)
        self.cap = cap
        self.cap_xfer = max(cap // 8, 1024)
        spec = NamedSharding(self.device_mesh, P(self.axes))
        self.state = jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), spec), packed)

    # -- flight-engine hooks (step/_flight_chunk are inherited) ----------
    def _axes_names(self):
        return self.axes

    def _dyn_offsets(self):
        # Degenerate (unsplit) axes pass None: no window machinery, and
        # a 1x1 grid reuses the replicated path's exact kernel.
        xo = (None if self.px == 1 else
              (lax.axis_index("px") * self.cols).astype(jnp.int32))
        yo = (None if self.py == 1 else
              (lax.axis_index("py") * self.rows).astype(jnp.int32))
        return xo, yo

    def _migrate_shard(self, s, x_off, y_off, gate=None):
        s, mx = _migrate_axis(s, "cellx", x_off, "px", self.px, self.cols,
                              self.cap_xfer, gate=gate)
        s, my = _migrate_axis(s, "celly", y_off, "py", self.py, self.rows,
                              self.cap_xfer, gate=gate)
        return s, mx + my

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def _begin(self, state, dens_parts, mk):
        spec = _state_spec(self.axes)
        rows, cols = self.rows, self.cols

        def shard_fn(s, d_row):
            y_off = (lax.axis_index("py") * rows).astype(jnp.int32)
            x_off = (lax.axis_index("px") * cols).astype(jnp.int32)
            s = transport.begin_timestep(s, self._local_mesh(d_row),
                                         self.geom, self.cs_scatter,
                                         self.cfg.dt, mk, y_off_dyn=y_off,
                                         x_off_dyn=x_off)
            nproc = lax.psum(jnp.count_nonzero(~s.dead).astype(jnp.uint32),
                             self.axes)
            return s, nproc

        fn = shard_map(shard_fn, mesh=self.device_mesh,
                       in_specs=(spec, P(self.axes, None)),
                       out_specs=(spec, P()), check_vma=False)
        return fn(state, dens_parts)

    @partial(jax.jit, static_argnames=("self",))
    def _chunk(self, state, tally_parts, dens_parts, rings, mk):
        """2D sweep chunk + two-phase migration; rings persist (see 1D)."""
        rows, cols = self.rows, self.cols
        spec = _state_spec(self.axes)

        def shard_fn(s, t_row, d_row, rg):
            y_off = (lax.axis_index("py") * rows).astype(jnp.int32)
            x_off = (lax.axis_index("px") * cols).astype(jnp.int32)
            if self.use_pallas:
                from ..pallas_sweep import pallas_sweep_chunk
                rc, rv, rn = rg
                (s, t, c, rc, rv, rn, nsweeps, _) = pallas_sweep_chunk(
                    s, t_row[0], EventCounts.zeros(), rc, rv, rn,
                    self.cs_scatter, self.cs_absorb, self.geom, mk,
                    1.0 / self.cfg.nparticles, self.chunk_sweeps,
                    k_events=self.k_events, y_off=y_off, x_off=x_off,
                    interpret=getattr(self, "pallas_interpret", False),
                    scatter_layout=self.scatter_layout,
                    absorb_layout=self.absorb_layout,
                    density_grid=(d_row[0] if self.geom.regions is None
                                  else None))
                rg = (rc, rv, rn)
            else:
                s, t, c, nsweeps, _ = transport.sweep_chunk(
                    s, t_row[0], EventCounts.zeros(),
                    self._local_mesh(d_row),
                    self.cs_scatter, self.cs_absorb, self.geom, mk,
                    1.0 / self.cfg.nparticles, self.chunk_sweeps,
                    events_per_sweep=self.events_per_sweep,
                    y_off_dyn=y_off, x_off_dyn=x_off)
            s, mx = _migrate_axis(s, "cellx", x_off, "px", self.px, cols,
                                  self.cap_xfer)
            s, my = _migrate_axis(s, "celly", y_off, "py", self.py, rows,
                                  self.cap_xfer)
            live = (~s.dead) & (s.dt_to_census > 0)
            lx = s.cellx - x_off
            ly = s.celly - y_off
            pending = jnp.count_nonzero(
                live & ((lx < 0) | (lx >= cols) | (ly < 0) | (ly >= rows)))
            work = jnp.count_nonzero(
                transport.working_mask(s, self.geom, y_off, x_off)).astype(
                    jnp.uint32)
            work = lax.psum(work + pending.astype(jnp.uint32), self.axes)
            pending_g = lax.psum(pending.astype(jnp.int32), self.axes)
            moved_g = lax.psum(mx + my, self.axes)
            err = ((pending_g > 0) & (moved_g == 0)).astype(jnp.int32)
            ctrl = _pack_ctrl(self.axes, c,
                              done=lax.pmax(nsweeps, self.axes),
                              work=work, err=err,
                              maxlive=jnp.count_nonzero(live))
            return s, t[None, :], rg, ctrl

        ring_spec = (None if rings is None else
                     (P(None, self.axes), P(None, self.axes),
                      P(self.axes)))
        fn = shard_map(
            shard_fn, mesh=self.device_mesh,
            in_specs=(spec, P(self.axes, None), P(self.axes, None),
                      ring_spec),
            out_specs=(spec, P(self.axes, None),
                       ring_spec, P()),
            check_vma=False)
        return fn(state, tally_parts, dens_parts, rings)

    # ------------------------------------------------------------------
    @property
    def tally(self) -> jnp.ndarray:
        """Global (ny*nx,) tally assembled from the shard blocks."""
        from ..io_utils import host_global
        blocks = host_global(self.tally_parts).reshape(
            self.py, self.px, self.rows, self.cols)
        grid2d = blocks.transpose(0, 2, 1, 3).reshape(
            self.py * self.rows, self.px * self.cols)
        return jnp.asarray(grid2d.reshape(-1))

    def host_tally(self) -> np.ndarray:
        """f64 global flat tally; gathers + re-tiles the 2D blocks."""
        from ..io_utils import host_global
        blocks = np.asarray(host_global(self.tally_parts),
                            dtype=np.float64).reshape(
            self.py, self.px, self.rows, self.cols)
        return blocks.transpose(0, 2, 1, 3).reshape(-1)

    # -- checkpoint/restore overrides (inherit restore(); these supply the
    # 2D owner map, sharding spec and the block scatter of the tally) ----
    def _restore_owner(self, host: ParticleState) -> np.ndarray:
        return self._owner_of(host)

    def _shard_spec(self):
        return NamedSharding(self.device_mesh, P(self.axes))

    def _tally_slabs(self, tally: np.ndarray) -> np.ndarray:
        grid2d = np.asarray(tally).reshape(self.py * self.rows,
                                           self.px * self.cols)
        blocks = grid2d.reshape(self.py, self.rows, self.px, self.cols)
        return blocks.transpose(0, 2, 1, 3).reshape(
            self.nshards, self.rows * self.cols)

    def _tally_pspec(self):
        return P(self.axes, None)
