"""Multi-device (8 virtual CPU) sharding tests.

The reference could only "test" its distribution by running MPI jobs
(SURVEY.md §4); here an 8-device host mesh exercises the identical
shard_map program that runs on an 8-chip TPU slice.
"""

import numpy as np
import jax
import pytest

from neutral_tpu.config import SimConfig, SourceBox, ProblemRegion
from neutral_tpu.driver import Simulation
from neutral_tpu.parallel import ShardedSimulation, make_device_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def cfg64(**kw):
    base = dict(nx=64, ny=64, dt=1e-7, niters=2, nparticles=4000,
                initial_energy=1.0e4,
                source=SourceBox(0.1, 0.1, 0.4, 0.4),
                problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),
                          ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                dtype="float64", tally_dtype="float64")
    base.update(kw)
    return SimConfig(**base)


@pytest.mark.slow
def test_sharded_matches_single_device():
    """Same seed => same physics regardless of sharding (f64: ~1e-12)."""
    cfg = cfg64()
    single = Simulation(cfg, quiet=True)
    for tt in (1, 2):
        single.step(tt)
    s_tally = np.asarray(single.tally, dtype=np.float64)

    sharded = ShardedSimulation(cfg, quiet=True)
    for tt in (1, 2):
        sm = sharded.step(tt)
    m_tally = np.asarray(sharded.tally, dtype=np.float64)

    assert sm.nprocessed == single.step_metrics[-1].nprocessed
    # event counts must agree EXACTLY: every history is bitwise identical
    assert (sm.nfacets, sm.ncollisions) == (
        single.step_metrics[-1].nfacets, single.step_metrics[-1].ncollisions)

    np.testing.assert_allclose(m_tally.sum(), s_tally.sum(), rtol=1e-12)
    np.testing.assert_allclose(m_tally, s_tally, rtol=1e-9, atol=1e-300)


@pytest.mark.slow
def test_sharded_compaction_invisible():
    """Per-shard compaction changes nothing physically (pid-keyed RNG)."""
    cfg = cfg64()
    ref = ShardedSimulation(cfg, quiet=True)
    ref.compact_enabled = False
    for tt in (1, 2):
        rm = ref.step(tt)

    sim = ShardedSimulation(cfg, quiet=True)
    sim.compact_min = 1024   # force the ladder at test scale
    sim.chunk_sweeps = 8     # several chunk rounds -> several compactions
    for tt in (1, 2):
        m = sim.step(tt)

    assert (m.nfacets, m.ncollisions) == (rm.nfacets, rm.ncollisions)
    np.testing.assert_allclose(
        np.asarray(sim.tally, np.float64), np.asarray(ref.tally, np.float64),
        rtol=1e-12, atol=1e-300)


@pytest.mark.slow
def test_device_mesh_subsets():
    mesh2 = make_device_mesh(2)
    assert mesh2.devices.size == 2
    cfg = cfg64(niters=1, nparticles=1000)
    sim = ShardedSimulation(cfg, device_mesh=mesh2, quiet=True)
    m = sim.step(1)
    assert m.nprocessed == 1000


def test_pid_stability_across_topologies():
    """2-way and 8-way shardings produce identical tallies (same streams)."""
    cfg = cfg64(niters=1, nparticles=2048)
    a = ShardedSimulation(cfg, device_mesh=make_device_mesh(2), quiet=True)
    a.step(1)
    b = ShardedSimulation(cfg, device_mesh=make_device_mesh(8), quiet=True)
    b.step(1)
    np.testing.assert_allclose(a.global_tally_sum(), b.global_tally_sum(),
                               rtol=1e-12)
