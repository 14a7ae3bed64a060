"""Free-flight engine under the spatial decompositions.

The windowed flight_core clamps rect walls to each shard's block, so a
single-device run over the SAME rect partition (flight.split_rects at the
shard grid lines) performs identical per-piece arithmetic — these tests
pin the decomposed engine against it with exact event counts (identical
histories) and tallies to accumulation-order rounding, the same bar the
stepping engine's spatial tests use (test_spatial.py).

Reference analog: one kernel interface per backend per problem
(neutral_interface.h:11-36) — here one flight engine per decomposition.
"""

import dataclasses

import numpy as np
import jax
import pytest

from neutral_tpu.config import SimConfig, SourceBox, ProblemRegion
from neutral_tpu.driver import Simulation
from neutral_tpu.flight import split_rects
from neutral_tpu.parallel import SpatialSimulation, Spatial2DSimulation

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _csp_like(**kw):
    """Vacuum background + dense central block: mixed flight/collision."""
    base = dict(nx=64, ny=64, dt=2e-7, niters=2, nparticles=1500,
                initial_energy=1.0e4,
                source=SourceBox(0.1, 0.1, 0.4, 0.4),
                problems=(ProblemRegion(1.0e-6, 0.0, 0.0, 1.0, 1.0),
                          ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                dtype="float64", tally_dtype="float64", engine="flight")
    base.update(kw)
    return SimConfig(**base)


def _stream_like(**kw):
    """Near-vacuum everywhere, tiny source: migration-heavy streaming."""
    base = dict(nx=64, ny=64, dt=2e-7, niters=2, nparticles=1500,
                initial_energy=1.0e6,
                source=SourceBox(0.4, 0.05, 0.2, 0.1),
                problems=(ProblemRegion(1.0e-2, 0.0, 0.0, 1.0, 1.0),),
                dtype="float64", tally_dtype="float64", engine="flight")
    base.update(kw)
    return SimConfig(**base)


def _split_single(cfg, xcuts, ycuts, steps):
    """Single-device flight over the shard-grid rect partition."""
    sim = Simulation(cfg, quiet=True)
    sim.geom = dataclasses.replace(
        sim.geom, rects=split_rects(sim.geom.rects, xcuts, ycuts))
    for tt in range(1, steps + 1):
        sim.step(tt)
    return sim


def _assert_match(single, spatial):
    for a, b in zip(single.step_metrics, spatial.step_metrics):
        assert (a.nfacets, a.ncollisions, a.nprocessed) == \
            (b.nfacets, b.ncollisions, b.nprocessed)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64),
        np.asarray(spatial.tally, np.float64).reshape(-1),
        rtol=1e-12, atol=1e-300)


@pytest.mark.slow
def test_spatial_flight_matches_split_single_mixed():
    cfg = _csp_like()
    spatial = SpatialSimulation(cfg, quiet=True)
    assert spatial.use_flight
    for tt in (1, 2):
        spatial.step(tt)
    single = _split_single(
        cfg, [], [spatial.rows * k for k in range(1, spatial.nshards)], 2)
    _assert_match(single, spatial)


@pytest.mark.slow
def test_spatial2d_flight_matches_split_single_stream():
    cfg = _stream_like()
    sp = Spatial2DSimulation(cfg, quiet=True)
    assert sp.use_flight
    for tt in (1, 2):
        sp.step(tt)
    single = _split_single(cfg,
                           [sp.cols * k for k in range(1, sp.px)],
                           [sp.rows * k for k in range(1, sp.py)], 2)
    _assert_match(single, sp)
    # migration actually happened: live lanes spread beyond source shards
    alive = ~np.asarray(sp.state.dead)
    per_shard = alive.reshape(sp.nshards, sp.cap).sum(axis=1)
    assert (per_shard > 0).sum() >= 4


@pytest.mark.slow
def test_spatial2d_flight_mixed_deck():
    """Dense block spanning shard boundaries: collisions + migration."""
    cfg = _csp_like()
    sp = Spatial2DSimulation(cfg, quiet=True)
    for tt in (1, 2):
        sp.step(tt)
    single = _split_single(cfg,
                           [sp.cols * k for k in range(1, sp.px)],
                           [sp.rows * k for k in range(1, sp.py)], 2)
    _assert_match(single, sp)


@pytest.mark.slow
def test_split_rects_physics_unchanged():
    """Splitting rects is physically invisible (same piece physics).

    The only arithmetic that could differ across a split is the mfp /
    census-clock decrement; on the shipped decks' vacuum regions the mfp
    decrement is exactly zero, so even the tally SUM matches tightly.
    """
    cfg = _stream_like()
    plain = Simulation(cfg, quiet=True)
    for tt in (1, 2):
        plain.step(tt)
    split = _split_single(cfg, [16, 32, 48], [8, 24, 40], 2)
    s1 = np.asarray(plain.tally, np.float64).sum()
    s2 = np.asarray(split.tally, np.float64).sum()
    assert abs(s1 - s2) / abs(s1) < 1e-9


@pytest.mark.slow
def test_spatial_flight_tiny_transfer_budget():
    """Flow-controlled migration backlog retries without loss."""
    cfg = _stream_like(niters=1)
    sp = SpatialSimulation(cfg, quiet=True)
    sp.cap_xfer = 16  # force many flow-controlled rounds
    sp.step(1)
    single = _split_single(
        cfg, [], [sp.rows * k for k in range(1, sp.nshards)], 1)
    _assert_match(single, sp)


def test_spatial_supports_flight_attr():
    assert SpatialSimulation.supports_flight
    assert Spatial2DSimulation.supports_flight


def _f32_stream_cfg():
    return SimConfig(nx=32, ny=32, dt=5e-9, niters=1, nparticles=512,
                     initial_energy=1.0e6, chunk_sweeps=8,
                     source=SourceBox(0.4, 0.3, 0.2, 0.4),
                     problems=(ProblemRegion(1.0e-2, 0.0, 0.0, 1.0, 1.0),),
                     dtype="float32", tally_dtype="float32",
                     engine="flight")


@pytest.mark.slow
def test_spatial_flight_fused_interpret_matches_split_single():
    """Fused-Mosaic spatial flight (interpret) == single-device XLA flight
    over the split-rect geometry: exact event counts, tally sum to f32
    rounding.  Tiny sizes: interpret executes the kernel per-op and slow
    shards must reach the migration ppermute within the CPU collective
    rendezvous timeout."""
    cfg = _f32_stream_cfg()
    sp = SpatialSimulation(cfg, quiet=True)
    assert sp.use_flight
    sp.flight_fused_interpret = True
    sp.flight_max_calls = 2
    sp.flight_k_pieces = 2
    sp.step(1)

    single = _split_single(
        cfg, [], [sp.rows * k for k in range(1, sp.nshards)], 1)
    a, b = single.step_metrics[0], sp.step_metrics[0]
    assert (a.nfacets, a.ncollisions) == (b.nfacets, b.ncollisions)
    s1 = np.asarray(single.tally, np.float64).sum()
    s2 = np.asarray(sp.tally, np.float64).sum()
    assert abs(s1 - s2) / abs(s1) < 1e-6


@pytest.mark.slow
def test_spatial_flight_fused_inloop_interpret_matches_split_single():
    """flight_sharded_inloop=True (in-loop walker drains + piece-plane
    rings per shard) matches the single-device XLA flight over the
    split-rect geometry, like the default sharded path."""
    cfg = _f32_stream_cfg()
    sp = SpatialSimulation(cfg, quiet=True)
    assert sp.use_flight
    sp.flight_fused_interpret = True
    sp.flight_sharded_inloop = True
    sp.flight_max_calls = 2
    sp.flight_k_pieces = 2
    sp.step(1)

    single = _split_single(
        cfg, [], [sp.rows * k for k in range(1, sp.nshards)], 1)
    a, b = single.step_metrics[0], sp.step_metrics[0]
    assert (a.nfacets, a.ncollisions) == (b.nfacets, b.ncollisions)
    s1 = np.asarray(single.tally, np.float64).sum()
    s2 = np.asarray(sp.tally, np.float64).sum()
    assert abs(s1 - s2) / abs(s1) < 1e-6


@pytest.mark.slow
def test_sharded_flight_fused_interpret_matches_single():
    """Fused-Mosaic replicated flight (interpret) == single-device XLA
    flight: the unified mixin path with no window and no migration."""
    from neutral_tpu.parallel import ShardedSimulation

    cfg = _f32_stream_cfg()
    sh = ShardedSimulation(cfg, quiet=True)
    assert sh.use_flight
    sh.flight_fused_interpret = True
    sh.flight_max_calls = 2
    sh.flight_k_pieces = 2
    sh.step(1)

    single = Simulation(cfg, quiet=True)
    single.step(1)
    a, b = single.step_metrics[0], sh.step_metrics[0]
    assert (a.nfacets, a.ncollisions) == (b.nfacets, b.ncollisions)
    s1 = np.asarray(single.tally, np.float64).sum()
    s2 = np.asarray(sh.tally, np.float64).sum()
    assert abs(s1 - s2) / abs(s1) < 1e-6
