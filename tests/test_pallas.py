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


def test_compact_with_rings_matches_unfused():
    """Fused drain+merge+select+fresh-rings == the unfused sequence,
    bitwise (pure XLA — no kernel involved)."""
    from neutral_tpu.particles import merge_compacted, select_working
    from neutral_tpu.pallas_sweep import (compact_with_rings, drain_rings,
                                          make_rings)

    cfg, sim, st, mk = make_setup(nparticles=2048)
    n = st.x.shape[0]
    rng = np.random.default_rng(3)
    # Kill/census a majority so select has real work to do.
    dead = jnp.asarray(rng.random(n) < 0.5)
    dt_c = jnp.where(jnp.asarray(rng.random(n) < 0.3), 0.0, st.dt_to_census)
    full0 = jax.tree_util.tree_map(lambda a: a, st)
    full0 = type(st)(**{**{f: getattr(st, f)
                           for f in st.__dataclass_fields__},
                        "dead": dead, "dt_to_census": dt_c})
    # Pending ring entries on some lanes.
    S = 4
    rc = jnp.where(jnp.asarray(rng.integers(0, 2, (S, n)), bool),
                   jnp.asarray(rng.integers(0, 64 * 64, (S, n)), jnp.int32),
                   -1)
    rv = jnp.asarray(rng.random((S, n)), jnp.float32) * (rc >= 0)
    cnt = jnp.sum((rc >= 0).astype(jnp.int32), axis=0)
    # (Ring-slot invariant: entries live at slots < count — build by sort.)
    order = jnp.argsort(rc < 0, axis=0, stable=True)
    rc = jnp.take_along_axis(rc, order, axis=0)
    rv = jnp.take_along_axis(rv, order, axis=0)
    tally0 = jnp.zeros(64 * 64 + 1, jnp.float32)[:64 * 64]

    target = 512
    # Unfused reference sequence.
    t_ref, _, _, _ = drain_rings(tally0, rc, rv, cnt)
    full_ref = full0
    part_ref, sel_ref = select_working(full_ref, target)
    rc_ref, rv_ref, rn_ref = make_rings(target, jnp.float32, 16)

    f2, p2, s2, t2, rc2, rv2, rn2 = compact_with_rings(
        jax.tree_util.tree_map(lambda a: a, full0), None, None,
        jnp.zeros_like(tally0), rc, rv, cnt, target=target)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(sel_ref))
    for f in part_ref.__dataclass_fields__:
        np.testing.assert_array_equal(np.asarray(getattr(p2, f)),
                                      np.asarray(getattr(part_ref, f)),
                                      err_msg=f)
    np.testing.assert_array_equal(np.asarray(rc2), np.asarray(rc_ref))
    np.testing.assert_array_equal(np.asarray(rn2), np.asarray(rn_ref))

    # Second ladder step WITH a live (part, sel) pair: fused merge path.
    part_mut = type(p2)(**{**{f: getattr(p2, f)
                              for f in p2.__dataclass_fields__},
                           "energy": p2.energy * 2.0})
    merged_ref = merge_compacted(f2, part_mut, s2)
    part2_ref, sel2_ref = select_working(merged_ref, 256)
    f3, p3, s3, t3, *_ = compact_with_rings(
        f2, part_mut, s2, t2, rc2, rv2, rn2, target=256)
    for f in part2_ref.__dataclass_fields__:
        np.testing.assert_array_equal(np.asarray(getattr(p3, f)),
                                      np.asarray(getattr(part2_ref, f)),
                                      err_msg=f)
    for f in merged_ref.__dataclass_fields__:
        np.testing.assert_array_equal(np.asarray(getattr(f3, f)),
                                      np.asarray(getattr(merged_ref, f)),
                                      err_msg=f)


def test_compact_flight_matches_unfused():
    """Flight variant: also hands back fresh segment rings."""
    from neutral_tpu.particles import select_working
    from neutral_tpu.pallas_flight import compact_flight, make_seg_ring
    from neutral_tpu.pallas_sweep import drain_rings, make_rings

    cfg, sim, st, mk = make_setup(nparticles=1024)
    n = st.x.shape[0]
    rng = np.random.default_rng(7)
    dead = jnp.asarray(rng.random(n) < 0.6)
    full0 = type(st)(**{**{f: getattr(st, f)
                           for f in st.__dataclass_fields__},
                        "dead": dead})
    rc = jnp.full((8, n), -1, jnp.int32).at[0, ::3].set(5)
    rv = jnp.zeros((8, n), jnp.float32).at[0, ::3].set(0.25)
    cnt = (rc[0] >= 0).astype(jnp.int32)
    tally0 = jnp.zeros(64 * 64, jnp.float32)

    t_ref, _, _, _ = drain_rings(tally0, rc, rv, cnt)
    part_ref, sel_ref = select_working(full0, 256)
    sf_ref, sn_ref = make_seg_ring(256, jnp.float32, 16)

    f2, p2, s2, t2, fc2, fv2, fn2, sf2, sn2 = compact_flight(
        jax.tree_util.tree_map(lambda a: a, full0), None, None,
        jnp.zeros_like(tally0), rc, rv, cnt, target=256, s_slots=16)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(t_ref))
    for f in part_ref.__dataclass_fields__:
        np.testing.assert_array_equal(np.asarray(getattr(p2, f)),
                                      np.asarray(getattr(part_ref, f)),
                                      err_msg=f)
    assert sf2[0].shape == sf_ref[0].shape
    assert float(jnp.max(jnp.abs(sf2[4]))) == 0.0
    assert int(jnp.max(sn2)) == 0


@pytest.mark.slow
def test_step_pallas_interpret_matches_xla_with_compaction():
    """Driver-level ring-engine step (interpret Mosaic kernel) == the
    XLA sweep engine, with the fused compaction ladder
    (compact_with_rings) actually firing in the death tail."""
    from neutral_tpu.pallas_sweep import compact_with_rings  # noqa: F401
    import neutral_tpu.pallas_sweep as ps

    # Low energy + dense medium: lanes absorb within ~4 collisions
    # (~16 sweeps total), so interpret stays fast; tiny chunks + k_events
    # give the ladder chunk boundaries while ~half the lanes live.
    # 16384 lanes: _ladder_target's floor is one 8192-lane pad quantum,
    # so the cap must exceed it for the ladder to have anywhere to go.
    cfg = SimConfig(nx=32, ny=32, dt=1e-4, niters=1, nparticles=16384,
                    initial_energy=1.0, chunk_sweeps=1,
                    source=SourceBox(0.2, 0.2, 0.6, 0.6),
                    problems=(ProblemRegion(1.0e4, 0.0, 0.0, 1.0, 1.0),),
                    dtype="float32", tally_dtype="float32")
    sim_x = Simulation(cfg.with_(engine="xla"), quiet=True)
    m_x = sim_x.step(1)
    t_x = np.asarray(sim_x.tally, np.float64)

    calls = []
    orig = ps.compact_with_rings

    def spy(*a, **k):
        calls.append(k.get("target"))
        return orig(*a, **k)

    sim_p = Simulation(cfg.with_(engine="pallas"), quiet=True)
    sim_p.pallas_interpret = True
    sim_p.k_events = 2
    import neutral_tpu.driver  # the step imports from pallas_sweep
    ps.compact_with_rings = spy
    try:
        m_p = sim_p.step(1)
    finally:
        ps.compact_with_rings = orig
    assert (m_p.nfacets, m_p.ncollisions, m_p.nprocessed) == \
        (m_x.nfacets, m_x.ncollisions, m_x.nprocessed)
    t_p = np.asarray(sim_p.tally, np.float64)
    np.testing.assert_allclose(t_p.sum(), t_x.sum(), rtol=1e-6)
    big = np.abs(t_x) > 1e-6 * np.abs(t_x).max()
    np.testing.assert_allclose(t_p[big], t_x[big], rtol=2e-4)
    assert calls, "fused compaction never fired; adjust dt/compact_min"
