"""Spatial decomposition tests: slab tallies + particle migration.

The reference declared but never implemented cross-rank particle
migration (send_and_mark_particle stub, SURVEY.md §2.10); these tests pin
our implementation against the single-device engine: identical event
counts (bitwise-identical histories) and tallies to accumulation-order
rounding.
"""

import numpy as np
import jax
import pytest

from neutral_tpu.config import SimConfig, SourceBox, ProblemRegion
from neutral_tpu.driver import Simulation
from neutral_tpu.parallel import SpatialSimulation
from neutral_tpu.parallel.sharding import make_device_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _run_pair(cfg, steps=2):
    single = Simulation(cfg, quiet=True)
    for tt in range(1, steps + 1):
        single.step(tt)
    spatial = SpatialSimulation(cfg, quiet=True)
    for tt in range(1, steps + 1):
        spatial.step(tt)
    return single, spatial


@pytest.mark.slow
def test_spatial_matches_single_absorber():
    cfg = SimConfig(nx=64, ny=64, dt=2e-7, niters=2, nparticles=2000,
                    initial_energy=1.0e4,
                    source=SourceBox(0.1, 0.1, 0.4, 0.4),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),
                              ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                    dtype="float64", tally_dtype="float64")
    single, spatial = _run_pair(cfg)
    for a, b in zip(single.step_metrics, spatial.step_metrics):
        assert (a.nfacets, a.ncollisions, a.nprocessed) == \
            (b.nfacets, b.ncollisions, b.nprocessed)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64),
        np.asarray(spatial.tally, np.float64).reshape(-1),
        rtol=1e-12, atol=1e-300)


@pytest.mark.slow
def test_spatial_heavy_migration():
    """Streaming problem: every particle crosses many slab boundaries."""
    cfg = SimConfig(nx=64, ny=64, dt=2e-7, niters=2, nparticles=1500,
                    initial_energy=1.0e6,
                    source=SourceBox(0.4, 0.05, 0.2, 0.1),
                    problems=(ProblemRegion(1.0e-2, 0.0, 0.0, 1.0, 1.0),),
                    dtype="float64", tally_dtype="float64")
    single, spatial = _run_pair(cfg)
    for a, b in zip(single.step_metrics, spatial.step_metrics):
        assert (a.nfacets, a.ncollisions) == (b.nfacets, b.ncollisions)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64),
        np.asarray(spatial.tally, np.float64).reshape(-1),
        rtol=1e-12, atol=1e-300)
    # migration actually happened: live lanes present beyond source shards
    alive = ~np.asarray(spatial.state.dead)
    per_shard = alive.reshape(spatial.nshards, spatial.cap).sum(axis=1)
    assert (per_shard > 0).sum() >= 6


def test_spatial_requires_divisible_mesh():
    cfg = SimConfig(nx=64, ny=63, dt=1e-7, nparticles=100,
                    initial_energy=1e4,
                    source=SourceBox(0.1, 0.1, 0.4, 0.4),
                    problems=(ProblemRegion(1.0, 0.0, 0.0, 1.0, 1.0),))
    with pytest.raises(ValueError, match="divisible"):
        SpatialSimulation(cfg, device_mesh=make_device_mesh(8))


@pytest.mark.slow
def test_spatial_pallas_interpret_matches_single():
    """Spatial mode on the fused Pallas path (interpret) == single device.

    Kept tiny: interpret mode executes the kernel per-op in Python and the
    spatial path runs it once per shard per chunk.
    """
    cfg = SimConfig(nx=64, ny=64, dt=5e-9, niters=1, nparticles=1024,
                    initial_energy=1.0e6, chunk_sweeps=8,
                    source=SourceBox(0.4, 0.3, 0.2, 0.4),
                    problems=(ProblemRegion(1.0e-2, 0.0, 0.0, 1.0, 1.0),),
                    dtype="float32", tally_dtype="float32")
    single = Simulation(cfg, quiet=True)
    single.step(1)

    spatial = SpatialSimulation(cfg.with_(engine="pallas"), quiet=True)
    assert spatial.use_pallas
    spatial.pallas_interpret = True
    spatial.k_events = 4
    spatial.step(1)

    a, b = single.step_metrics[0], spatial.step_metrics[0]
    assert (a.nfacets, a.ncollisions) == (b.nfacets, b.ncollisions)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64).sum(),
        np.asarray(spatial.tally, np.float64).sum(), rtol=1e-6)


@pytest.mark.slow
def test_spatial_tiny_transfer_budget_conserves():
    """Flow-controlled migration: a tiny cap_xfer backlogs but never drops.

    Receivers advertise free-slot budgets, so unshipped lanes retry across
    rounds; the run must still match the single-device engine exactly.
    """
    cfg = SimConfig(nx=64, ny=64, dt=2e-7, niters=1, nparticles=1500,
                    initial_energy=1.0e6,
                    source=SourceBox(0.4, 0.05, 0.2, 0.1),
                    problems=(ProblemRegion(1.0e-2, 0.0, 0.0, 1.0, 1.0),),
                    dtype="float64", tally_dtype="float64")
    single = Simulation(cfg, quiet=True)
    single.step(1)

    spatial = SpatialSimulation(cfg, quiet=True)
    spatial.cap_xfer = 16    # before the first _chunk trace
    m = spatial.step(1)
    a = single.step_metrics[-1]
    assert (a.nfacets, a.ncollisions) == (m.nfacets, m.ncollisions)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64),
        np.asarray(spatial.tally, np.float64).reshape(-1),
        rtol=1e-12, atol=1e-300)


@pytest.mark.slow
def test_spatial_repartition_invisible():
    """Capacity growth + owner repartition mid-run changes nothing."""
    cfg = SimConfig(nx=64, ny=64, dt=2e-7, niters=2, nparticles=1500,
                    initial_energy=1.0e6,
                    source=SourceBox(0.4, 0.05, 0.2, 0.1),
                    problems=(ProblemRegion(1.0e-2, 0.0, 0.0, 1.0, 1.0),),
                    dtype="float64", tally_dtype="float64")
    single, _ = _run_pair(cfg)

    spatial = SpatialSimulation(cfg, quiet=True)
    spatial.step(1)
    spatial._repartition(2 * spatial.cap)
    spatial.step(2)
    for a, b in zip(single.step_metrics, spatial.step_metrics):
        assert (a.nfacets, a.ncollisions) == (b.nfacets, b.ncollisions)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64),
        np.asarray(spatial.tally, np.float64).reshape(-1),
        rtol=1e-12, atol=1e-300)


@pytest.mark.slow
def test_spatial2d_matches_single():
    """2D (x,y) block decomposition: exact event counts + 1e-12 tallies."""
    from neutral_tpu.parallel import Spatial2DSimulation

    cfg = SimConfig(nx=64, ny=64, dt=2e-7, niters=2, nparticles=1500,
                    initial_energy=1.0e6,
                    source=SourceBox(0.4, 0.05, 0.2, 0.1),
                    problems=(ProblemRegion(1.0e-2, 0.0, 0.0, 1.0, 1.0),),
                    dtype="float64", tally_dtype="float64")
    single = Simulation(cfg, quiet=True)
    for tt in (1, 2):
        single.step(tt)

    sim = Spatial2DSimulation(cfg, quiet=True)
    assert (sim.py, sim.px) == (2, 4)  # near-square factorization
    for tt in (1, 2):
        sim.step(tt)
    for a, b in zip(single.step_metrics, sim.step_metrics):
        assert (a.nfacets, a.ncollisions, a.nprocessed) == \
            (b.nfacets, b.ncollisions, b.nprocessed)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64),
        np.asarray(sim.tally, np.float64),
        rtol=1e-12, atol=1e-300)


@pytest.mark.slow
def test_spatial2d_absorber_matches_single():
    """2D decomposition on the absorber deck (mixed collisions + facets)."""
    from neutral_tpu.parallel import Spatial2DSimulation

    cfg = SimConfig(nx=64, ny=64, dt=2e-7, niters=2, nparticles=2000,
                    initial_energy=1.0e4,
                    source=SourceBox(0.1, 0.1, 0.4, 0.4),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),
                              ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                    dtype="float64", tally_dtype="float64")
    single = Simulation(cfg, quiet=True)
    for tt in (1, 2):
        single.step(tt)
    sim = Spatial2DSimulation(cfg, quiet=True)
    for tt in (1, 2):
        sim.step(tt)
    for a, b in zip(single.step_metrics, sim.step_metrics):
        assert (a.nfacets, a.ncollisions) == (b.nfacets, b.ncollisions)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64),
        np.asarray(sim.tally, np.float64),
        rtol=1e-12, atol=1e-300)


@pytest.mark.slow
def test_spatial_pcg_scheme_matches_single():
    """Regression: 1D spatial geometry must carry the deck's rng scheme."""
    cfg = SimConfig(nx=64, ny=64, dt=2e-7, niters=1, nparticles=1000,
                    initial_energy=1.0e4, rng="pcg64si",
                    source=SourceBox(0.1, 0.1, 0.4, 0.4),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),
                              ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                    dtype="float64", tally_dtype="float64")
    single = Simulation(cfg, quiet=True)
    sm = single.step(1)
    spatial = SpatialSimulation(cfg, quiet=True)
    m = spatial.step(1)
    assert (m.nfacets, m.ncollisions) == (sm.nfacets, sm.ncollisions)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64),
        np.asarray(spatial.tally, np.float64).reshape(-1),
        rtol=1e-12, atol=1e-300)


def test_spatial2d_rejects_bad_grid():
    from neutral_tpu.parallel import Spatial2DSimulation

    cfg = SimConfig(nx=64, ny=64, dt=2e-7, niters=1, nparticles=100,
                    initial_energy=1.0e4,
                    source=SourceBox(0.1, 0.1, 0.4, 0.4),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),),
                    dtype="float64", tally_dtype="float64")
    with pytest.raises(ValueError, match="divide"):
        Spatial2DSimulation(cfg, quiet=True, grid=(3, 2))


@pytest.mark.slow
@pytest.mark.parametrize("decomp", ["spatial", "spatial2d"])
def test_spatial_checkpoint_restore_roundtrip(tmp_path, decomp):
    """Mid-run checkpoint from a single-device sim restores into the
    spatial decompositions (owner repartition) and finishes identically."""
    from neutral_tpu.parallel import Spatial2DSimulation
    cls = SpatialSimulation if decomp == "spatial" else Spatial2DSimulation
    cfg = SimConfig(nx=64, ny=64, dt=2e-7, niters=3, nparticles=1200,
                    initial_energy=1.0e4,
                    source=SourceBox(0.1, 0.1, 0.4, 0.4),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),
                              ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                    dtype="float64", tally_dtype="float64")
    # uninterrupted reference on the spatial sim itself
    ref = cls(cfg, quiet=True)
    stats = []
    for tt in range(1, 4):
        m = ref.step(tt)
        stats.append((m.nfacets, m.ncollisions))

    # single-device run for 1 step -> checkpoint -> restore into spatial
    single = Simulation(cfg, quiet=True)
    m1 = single.step(1)
    path = str(tmp_path / f"ck_{decomp}.npz")
    single.checkpoint(path, 1)
    spat = cls(cfg, quiet=True)
    assert spat.restore(path) == 1
    out = [(m1.nfacets, m1.ncollisions)]
    for tt in range(2, 4):
        m = spat.step(tt)
        out.append((m.nfacets, m.ncollisions))
    assert out == stats
    np.testing.assert_allclose(
        np.asarray(ref.tally, np.float64).reshape(-1),
        np.asarray(spat.tally, np.float64).reshape(-1),
        rtol=1e-12, atol=1e-300)

    # and the reverse: checkpoint FROM spatial, restore into single-device
    path2 = str(tmp_path / f"ck_back_{decomp}.npz")
    spat2 = cls(cfg, quiet=True)
    spat2.step(1)
    spat2.checkpoint(path2, 1)
    single2 = Simulation(cfg, quiet=True)
    assert single2.restore(path2) == 1
    for tt in range(2, 4):
        single2.step(tt)
    np.testing.assert_allclose(
        np.asarray(ref.tally, np.float64).reshape(-1),
        np.asarray(single2.tally, np.float64),
        rtol=1e-12, atol=1e-300)


@pytest.mark.slow
@pytest.mark.parametrize("decomp", ["spatial", "spatial2d"])
def test_spatial_arbitrary_deck_matches_single(decomp):
    """Non-fast_math decks (no analytic regions: sharded density slabs +
    gather-based cs tables) run decomposed and match the single device.

    A custom NON-quartic cross-section table forces the searchsorted
    table path — the 'user-supplied .cs file' scenario the reference
    serves through read_cs_file (neutral_data.c:123-170).
    """
    import jax.numpy as jnp
    from neutral_tpu.parallel import Spatial2DSimulation
    from neutral_tpu.xs import CrossSection
    cls = SpatialSimulation if decomp == "spatial" else Spatial2DSimulation
    cfg = SimConfig(nx=64, ny=64, dt=2e-7, niters=2, nparticles=1200,
                    initial_energy=1.0e4,
                    source=SourceBox(0.1, 0.1, 0.4, 0.4),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),
                              ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                    dtype="float64", tally_dtype="float64",
                    fast_math=False)

    # linear (non-quartic) energy grid -> searchsorted lookup path
    keys = np.linspace(1e-2, 1e8, 5000)
    vals = 1.0e3 * (1.0 - np.arange(5000) / 5000.0) + 1.0
    tab = CrossSection(jnp.asarray(keys), jnp.asarray(vals))
    assert not tab.quartic and not tab.analytic

    single = Simulation(cfg, quiet=True)
    single.cs_scatter = single.cs_absorb = tab
    spat = cls(cfg, quiet=True)
    spat.cs_scatter = spat.cs_absorb = tab
    assert not single.use_pallas and not spat.use_pallas
    for tt in range(1, 3):
        a = single.step(tt)
        b = spat.step(tt)
        assert (a.nfacets, a.ncollisions, a.nprocessed) == \
            (b.nfacets, b.ncollisions, b.nprocessed)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64),
        np.asarray(spat.tally, np.float64).reshape(-1),
        rtol=1e-12, atol=1e-300)


def test_inject_partitioned_matches_host_partition():
    """Device-side per-shard injection (_inject_partitioned) produces the
    EXACT packed buffers of the old global-inject + host-partition path:
    same pids on the same shards in the same order, zeroed padding.
    The reference's analog is the per-rank source-window injection
    (neutral_data.c:64-95); ours keeps decomposition-invariant pid
    streams on top."""
    from neutral_tpu.particles import inject_particles
    from neutral_tpu.parallel.spatial import _partition_by_slab

    cfg = SimConfig(nx=64, ny=64, dt=1e-7, niters=1, nparticles=3000,
                    initial_energy=1.0e4,
                    source=SourceBox(0.1, 0.3, 0.7, 0.5),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),),
                    dtype="float32", tally_dtype="float32")
    sim = SpatialSimulation(cfg, quiet=True)

    state = inject_particles(
        sim.mesh, nparticles=cfg.nparticles,
        source_x0=cfg.source.xpos * cfg.width,
        source_y0=cfg.source.ypos * cfg.height,
        source_width=cfg.source.width * cfg.width,
        source_height=cfg.source.height * cfg.height,
        initial_energy=cfg.initial_energy, dt=cfg.dt,
        dtype=sim.dtype, rng_scheme=cfg.rng,
        local_coords=None if sim.use_flight else
        __import__("neutral_tpu.driver", fromlist=["_local_coords"])
        ._local_coords(cfg, sim.dtype))
    packed = _partition_by_slab(state, sim.nshards, sim.rows, sim.cap)

    for f in state.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(sim.state, f)),
            np.asarray(getattr(packed, f)), err_msg=f)
