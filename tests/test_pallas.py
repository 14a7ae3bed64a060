"""Pallas fused-sweep kernel tests (interpret mode on CPU).

The kernel runs transport.sweep_core — the same physics as the XLA path —
so these tests pin the Pallas-specific machinery: VMEM tiling, the
pending-flush ring (insert chains, pause gate, drains), and count
accumulation.  Event counts must match the XLA engine exactly at census
completion; tallies to f32 accumulation-order rounding.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neutral_tpu.config import SimConfig, SourceBox, ProblemRegion
from neutral_tpu.driver import Simulation
from neutral_tpu.transport import EventCounts, begin_timestep, sweep_chunk
from neutral_tpu import pallas_sweep


def make_setup(nparticles=4096, dt=5e-9, rng="threefry"):
    cfg = SimConfig(nx=64, ny=64, dt=dt, niters=1, nparticles=nparticles,
                    initial_energy=1.0e4,
                    source=SourceBox(0.1, 0.1, 0.4, 0.4),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),
                              ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                    dtype="float32", tally_dtype="float32", rng=rng)
    sim = Simulation(cfg, quiet=True)
    mk = jnp.uint32(1)
    st = begin_timestep(sim.state, sim.mesh, sim.geom, sim.cs_scatter,
                        cfg.dt, mk)
    return cfg, sim, st, mk


def run_pallas(cfg, sim, st, mk, max_sweeps, k_events, ring_slots):
    rc, rv, rn = pallas_sweep.make_rings(st.x.shape[0], jnp.float32,
                                         ring_slots=ring_slots)
    (s, t, c, rc, rv, rn, done, live) = pallas_sweep.pallas_sweep_chunk(
        st, sim.tally, EventCounts.zeros(), rc, rv, rn, sim.cs_scatter,
        sim.cs_absorb, sim.geom, mk, 1.0 / cfg.nparticles, max_sweeps,
        k_events=k_events, interpret=True)
    t, rc, rv, rn = pallas_sweep.drain_rings(t, rc, rv, rn)
    return s, t, c, live


@pytest.mark.slow
@pytest.mark.parametrize("rng", ["threefry", "pcg64si"])
def test_pallas_matches_xla_to_completion(rng):
    cfg, sim, st, mk = make_setup(rng=rng)
    s1, t1, c1, n1, live1 = sweep_chunk(
        st, sim.tally, EventCounts.zeros(), sim.mesh, sim.cs_scatter,
        sim.cs_absorb, sim.geom, mk, 1.0 / cfg.nparticles, 2048)
    s2, t2, c2, live2 = run_pallas(cfg, sim, st, mk, 2048, k_events=4,
                                   ring_slots=8)
    assert not bool(live1) and not bool(live2)
    assert c1.totals() == c2.totals()
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=2e-5,
                               atol=0)
    # end states bitwise identical
    for f in ("x", "y", "energy", "cellx", "celly", "counter", "dead"):
        np.testing.assert_array_equal(np.asarray(getattr(s1, f)),
                                      np.asarray(getattr(s2, f)))


@pytest.mark.slow
def test_pallas_tiny_ring_pausing_is_exact():
    """A 2-slot ring forces constant pause/drain cycles; physics unchanged."""
    cfg, sim, st, mk = make_setup(dt=2e-9)
    s1, t1, c1, n1, live1 = sweep_chunk(
        st, sim.tally, EventCounts.zeros(), sim.mesh, sim.cs_scatter,
        sim.cs_absorb, sim.geom, mk, 1.0 / cfg.nparticles, 2048)
    s2, t2, c2, live2 = run_pallas(cfg, sim, st, mk, 4096, k_events=4,
                                   ring_slots=2)
    assert not bool(live1) and not bool(live2)
    assert c1.totals() == c2.totals()
    np.testing.assert_allclose(float(t1.sum()), float(t2.sum()), rtol=1e-6)


@pytest.mark.slow
def test_driver_engine_pallas_interpret_unused_on_cpu():
    """engine=auto must resolve to the XLA path on CPU backends."""
    cfg = SimConfig(nx=32, ny=32, dt=1e-9, niters=1, nparticles=4096,
                    initial_energy=1.0e4,
                    source=SourceBox(0.1, 0.1, 0.4, 0.4),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),))
    sim = Simulation(cfg, quiet=True)
    assert sim.use_pallas is False
    sim.step(1)  # runs the XLA path end-to-end
