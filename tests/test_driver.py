"""Driver, IO and checkpoint tests (small CPU configs)."""

import os

import numpy as np
import pytest

from neutral_tpu.config import SimConfig, SourceBox, ProblemRegion, load_config
from neutral_tpu.driver import Simulation, within_tolerance
from neutral_tpu import io_utils


def small_cfg(**kw):
    base = dict(nx=50, ny=50, dt=1e-7, niters=2, nparticles=500,
                initial_energy=1.0e4,
                source=SourceBox(0.1, 0.1, 0.2, 0.2),
                problems=(ProblemRegion(1.0e-30, 0.0, 0.0, 1.0, 1.0),
                          ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                dtype="float64", tally_dtype="float64")
    base.update(kw)
    return SimConfig(**base)


def test_driver_deck_roundtrip(tmp_path):
    """A written deck parses into the same config the reference grammar gives."""
    deck = tmp_path / "mini.params"
    deck.write_text(
        "nparticles 500\ninitial_energy 1.0e4\ndt 1.0e-7\n"
        "nx 50\nny 50\niterations 2\nvisit_dump 0\n"
        "source xpos=0.1 ypos=0.1 width=0.2 height=0.2\n"
        "problem_0 density=1.0e-30 energy=0.0 xpos=0.0 ypos=0.0 "
        "width=1.0 height=1.0\n")
    cfg = load_config(str(deck))
    assert cfg.nparticles == 500
    assert cfg.source == SourceBox(0.1, 0.1, 0.2, 0.2)
    assert cfg.problems[0].density == 1.0e-30


def test_driver_run_and_metrics(capsys):
    sim = Simulation(small_cfg(), quiet=False)
    sim.run()
    out = capsys.readouterr().out
    assert "Iteration  1" in out
    assert "Facet Events / s" in out
    assert "Final global_energy_tally" in out
    # no golden configured -> warning path
    assert "could not find a golden" in out
    assert len(sim.step_metrics) == 2
    assert sim.step_metrics[0].nprocessed == 500


def test_driver_validate_golden():
    sim = Simulation(small_cfg(niters=1), quiet=True)
    sim.run()
    total = float(np.asarray(sim.tally, dtype=np.float64).sum())
    # golden = own result: passes; off-by-1% fails at 1e-3 rel tol
    sim.cfg = sim.cfg.with_(expected_tally=total)
    assert within_tolerance(total, float(sim.validate()), 1e-12)
    sim.cfg = sim.cfg.with_(expected_tally=total * 1.01)
    assert not within_tolerance(sim.cfg.expected_tally, total, 1e-3)


def test_checkpoint_roundtrip(tmp_path):
    """Stop after step 1, resume, and get bitwise-identical final tallies."""
    cfg = small_cfg(niters=2)
    a = Simulation(cfg, quiet=True)
    a.step(1)
    a.step(2)
    full = np.asarray(a.tally)

    b = Simulation(cfg, quiet=True)
    b.step(1)
    ckpt = str(tmp_path / "state.npz")
    b.checkpoint(ckpt, 1)

    c = Simulation(cfg, quiet=True)
    step = c.restore(ckpt)
    assert step == 1
    c.step(2)
    resumed = np.asarray(c.tally)
    np.testing.assert_array_equal(full, resumed)


@pytest.mark.slow
def test_checkpoint_roundtrip_orbax(tmp_path):
    """Same roundtrip through the Orbax directory backend (no .npz suffix)."""
    cfg = small_cfg(niters=2)
    a = Simulation(cfg, quiet=True)
    a.step(1)
    a.step(2)
    full = np.asarray(a.tally)

    b = Simulation(cfg, quiet=True)
    b.step(1)
    ckpt = str(tmp_path / "state_ckpt")
    b.checkpoint(ckpt, 1)
    assert os.path.isdir(ckpt)

    c = Simulation(cfg, quiet=True)
    assert c.restore(ckpt) == 1
    c.step(2)
    np.testing.assert_array_equal(full, np.asarray(c.tally))


def test_bov_writer(tmp_path):
    field = np.arange(12, dtype=np.float64).reshape(3, 4)
    base = str(tmp_path / "energy1")
    io_utils.write_bov(base, field, variable="energy", time=0.5)
    hdr = open(base + ".bov").read()
    assert "DATA_SIZE: 4 3 1" in hdr
    back = np.fromfile(base + ".dat", dtype=np.float64).reshape(3, 4)
    np.testing.assert_array_equal(field, back)


def test_particle_density_histogram():
    sim = Simulation(small_cfg(niters=1), quiet=True)
    dens = io_utils.particle_density(sim.state, 50, 50)
    assert dens.sum() == 500  # only live lanes counted
    # all particles start inside the source box [0.1, 0.3)^2 -> cells 5..14
    ys, xs = np.nonzero(dens)
    assert xs.min() >= 5 and xs.max() <= 15
    assert ys.min() >= 5 and ys.max() <= 15


def test_determinism_across_runs():
    """Same deck => bitwise-identical tally on independent Simulations.

    The reference's only concurrency-correctness device is atomic tally
    adds (non-deterministic ordering); ours is functional purity — rerun
    determinism is a guarantee, not luck (SURVEY §5 race detection).
    """
    cfg = small_cfg(niters=2, dtype="float32", tally_dtype="float32")
    a = Simulation(cfg, quiet=True)
    b = Simulation(cfg, quiet=True)
    for tt in (1, 2):
        ma = a.step(tt)
        mb = b.step(tt)
        assert (ma.nfacets, ma.ncollisions) == (mb.nfacets, mb.ncollisions)
    np.testing.assert_array_equal(np.asarray(a.tally), np.asarray(b.tally))


@pytest.mark.slow
def test_non_unit_domain_fast_vs_slow_paths():
    """width/height != 1 (the arch.params knobs): analytic fast-math paths
    must agree with the gather/global-coordinate paths bitwise in f64."""
    base = dict(nx=80, ny=40, width=2.5, height=1.25, dt=1e-7, niters=1,
                nparticles=800, initial_energy=1.0e4,
                source=SourceBox(0.1, 0.2, 0.3, 0.4),
                problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),
                          ProblemRegion(1.0e4, 0.4, 0.3, 0.3, 0.5),),
                dtype="float64", tally_dtype="float64")
    slow = Simulation(SimConfig(**base, fast_math=False), quiet=True)
    fast = Simulation(SimConfig(**base, fast_math=True), quiet=True)
    ms, mf = slow.step(1), fast.step(1)
    assert (ms.nfacets, ms.ncollisions) == (mf.nfacets, mf.ncollisions)
    # cell edges come from i*dx in both paths but XLA may contract the
    # multiply-adds differently -> last-ulp distance differences
    np.testing.assert_allclose(np.asarray(slow.tally),
                               np.asarray(fast.tally), rtol=1e-12, atol=0)


def test_early_exit_at_sim_end(capsys):
    """Timestep loop stops once elapsed time reaches sim_end (main.c:142-146)."""
    cfg = small_cfg(niters=50, sim_end=1.5e-7)  # dt=1e-7 -> stops after 2
    sim = Simulation(cfg, quiet=False)
    sim.run()
    out = capsys.readouterr().out
    assert "Reached end of simulation time" in out
    assert len(sim.step_metrics) == 2


def test_profile_records_step_times():
    cfg = small_cfg(niters=1)
    sim = Simulation(cfg, quiet=True)
    sim.step(1)
    assert [e.name for e in sim.profile.entries] == ["step1"]
    assert sim.profile.entries[0].time > 0.0
    assert sim.profile.total() == sim.profile.entries[0].time
    assert "step1" in sim.profile.summary()


def test_find_cell_nonuniform_fallback_matches():
    """_find_cell: searchsorted fallback equals the uniform O(1) path."""
    import jax.numpy as jnp
    from neutral_tpu.particles import _find_cell

    nx, width = 317, 11.7
    edges = jnp.asarray(np.arange(nx + 1, dtype=np.float64) * (width / nx))
    pos = jnp.asarray(np.random.default_rng(0).uniform(0, width, 20000))
    fast = _find_cell(edges, pos, nx, width, True)
    slow = _find_cell(edges, pos, nx, width, False)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_ladder_target_properties():
    """Compaction ladder sizes: hold live (+5%), floor one 8192-lane pad
    quantum, {1, 1.5} x 2^k x 8192 shapes only."""
    from neutral_tpu.driver import _ladder_target

    for live in (0, 1, 100, 8191, 8192, 12000, 100000, 4_300_000,
                 10_000_000):
        t = _ladder_target(live, 8192)
        assert t >= max(int(live * 1.05) + 1, 8192)
        u = t // 8192
        assert t % 8192 == 0
        # u is 2^k or 3*2^(k-1)
        assert (u & (u - 1)) == 0 or (u % 3 == 0 and
                                      ((u // 3) & (u // 3 - 1)) == 0)
    # the half-step actually fires (4.3M live must not round to 8.4M)
    assert _ladder_target(4_300_000, 8192) < (1 << 23)


def test_cliff_exit_thresholds_never_spin():
    """In-kernel census-cliff exit thresholds guarantee a compaction.

    Any live count strictly below the threshold must make the matching
    driver ladder fire — otherwise the chunk would exit, not compact,
    re-enter, and exit again after one iteration (a host-round-trip
    spin).  Checks both engines' ladders across cap shapes including
    the non-ladder initial caps (padded deck sizes)."""
    from neutral_tpu.driver import (_exit_live_for, _flight_exit_live,
                                    _ladder_target)

    caps = [16384, 262144, 393216, 1007616, 1 << 20, 3 << 19, 10002432,
            13107200]
    for cap in caps:
        for min_cap in (8192, 262144):
            if cap <= min_cap:
                continue
            # ring engine: driver compacts when ladder <= 0.75*cap
            el = _exit_live_for(cap, min_cap)
            if el > 0:
                assert _ladder_target(el - 1, min_cap) <= (cap * 3) // 4
                # threshold is tight: one more lane must NOT fire
                if el < cap:
                    assert _ladder_target(el, min_cap) > (cap * 3) // 4
            # flight engine: compacts when max(min_cap, pow2) <= cap//2
            fl = _flight_exit_live(cap, min_cap)
            if fl > 0:
                live = fl - 1
                tgt = max(min_cap, 1 << (max(live, 1) - 1).bit_length())
                assert tgt <= cap // 2
    # post-compaction live can't immediately re-trigger the ring exit:
    # live <= cap'/1.05 where cap' = ladder(live) — the fresh occupancy
    # is always >= ~0.63 cap', and one extra ratchet step is the worst
    # case (strictly shrinking), not a spin
    assert _exit_live_for(8192 * 4, 8192) < 8192 * 4


def test_ctrl_pack_read_roundtrip():
    """_pack_ctrl inside an 8-shard shard_map -> _read_ctrl recovers the
    head slots and the exact 64-bit per-shard count totals."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    import numpy as np
    from neutral_tpu.parallel.common import (_CTRL_MAXLIVE, _pack_ctrl,
                                             _read_ctrl)
    from neutral_tpu.transport import EventCounts

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("p",))
    # per-shard facet counts that overflow 32 bits when summed
    hi = jnp.arange(8, dtype=jnp.uint32)
    lo = jnp.full(8, 0xFFFFFFFF, jnp.uint32)

    def shard_fn(h, l):
        c = EventCounts(h[0], l[0], jnp.uint32(0), h[0] * 2)
        return _pack_ctrl("p", c, done=jnp.uint32(7), work=jnp.uint32(5),
                          err=jnp.uint32(0),
                          maxlive=(h[0] + 10).astype(jnp.int32))

    fn = shard_map(shard_fn, mesh=mesh, in_specs=(P("p"), P("p")),
                   out_specs=P(), check_vma=False)
    ctrl = fn(hi, lo)
    head, dnf, dnc = _read_ctrl(ctrl)
    assert head[0] == 7 and head[1] == 5 and head[2] == 0
    assert head[_CTRL_MAXLIVE] == 7 + 10          # pmax over shards
    want_nf = sum((int(h) << 32) | 0xFFFFFFFF for h in range(8))
    assert dnf == want_nf
    assert dnc == sum(2 * h for h in range(8))
