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
