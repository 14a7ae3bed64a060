"""Arbitrary density-grid decks (cfg.density_file) on every engine.

The reference can only express material via problem_N rectangles (arch's
initialise_shared_data_2d — SURVEY §2.9); a per-cell density grid loaded
from file is a capability beyond it.  These tests pin:

* grid loading + validation (mesh.build_density),
* geometry routing: grid decks carry the uniform pitch but NO analytic
  regions, so XLA gathers density and the Mosaic ring engine runs its
  carried-density grid mode (pallas_sweep grid_mode),
* driver-level parity: the same grid deck under engine=pallas (interpret
  Mosaic, carried density + stale-lane freeze) against the XLA sweep —
  including bitwise-identical end states,
* the spatial decomposition: each shard's density slab rides into its
  kernel through the same density_grid plumbing,
* engine routing: flight must refuse grid decks (closed-form flight
  needs constant-density rectangles).
"""

import numpy as np
import pytest

from neutral_tpu.config import ProblemRegion, SimConfig, SourceBox
from neutral_tpu.driver import Simulation, make_geometry
from neutral_tpu.mesh import build_density, build_mesh


def _write_grid(tmp_path, nx, ny, seed=7, vacuum_frac=0.25):
    """Random strictly-non-rect density field with some vacuum cells."""
    rng = np.random.default_rng(seed)
    dens = rng.uniform(1.0e3, 2.0e4, size=(ny, nx))
    dens[rng.random((ny, nx)) < vacuum_frac] = 0.0
    path = tmp_path / "dens.npy"
    np.save(path, dens)
    return str(path), dens


def _grid_cfg(tmp_path, nx=32, ny=32, **kw):
    path, _ = _write_grid(tmp_path, nx, ny)
    base = dict(nx=nx, ny=ny, dt=4e-6, niters=1, nparticles=4096,
                initial_energy=1.0e3, chunk_sweeps=8,
                source=SourceBox(0.2, 0.2, 0.6, 0.6),
                density_file=path,
                dtype="float32", tally_dtype="float32")
    base.update(kw)
    return SimConfig(**base)


def test_build_density_from_file(tmp_path):
    path, dens = _write_grid(tmp_path, 16, 8)
    cfg = SimConfig(nx=16, ny=8, density_file=path)
    out = build_density(cfg, dtype=np.float64)
    np.testing.assert_array_equal(out, dens)
    # text format too
    tpath = tmp_path / "dens.txt"
    np.savetxt(tpath, dens)
    out2 = build_density(cfg.with_(density_file=str(tpath)))
    np.testing.assert_allclose(out2, dens, rtol=1e-15)


def test_build_density_grid_validation(tmp_path):
    path, _ = _write_grid(tmp_path, 16, 8)
    with pytest.raises(ValueError, match="shape"):
        build_density(SimConfig(nx=8, ny=16, density_file=path))
    bad = tmp_path / "bad.npy"
    np.save(bad, -np.ones((8, 16)))
    with pytest.raises(ValueError, match="non-negative"):
        build_density(SimConfig(nx=16, ny=8, density_file=str(bad)))


def test_grid_geometry_routing(tmp_path):
    cfg = _grid_cfg(tmp_path)
    geom = make_geometry(cfg)
    assert geom.regions is None and geom.rects is None
    assert geom.dx > 0 and geom.dy > 0      # uniform pitch stays analytic
    assert cfg.uses_density_grid
    mesh = build_mesh(cfg, dtype=np.float32,
                      with_density=cfg.uses_density_grid)
    assert mesh.density.shape == (cfg.ny, cfg.nx)


def test_grid_deck_flight_refused(tmp_path):
    cfg = _grid_cfg(tmp_path, engine="flight")
    with pytest.raises(ValueError, match="constant-"):
        Simulation(cfg, quiet=True)


def test_grid_deck_params_roundtrip(tmp_path):
    """density_file key in the reference params grammar, deck-relative."""
    from neutral_tpu.config import load_config
    path, dens = _write_grid(tmp_path, 8, 8)
    deck = tmp_path / "grid.params"
    deck.write_text(
        "nx 8\nny 8\ndt 1e-4\niterations 1\nnparticles 100\n"
        "initial_energy 1e3\n"
        "source xpos=0.2 ypos=0.2 width=0.6 height=0.6\n"
        "density_file dens.npy\n")
    cfg = load_config(str(deck))
    assert cfg.density_file == str(path)
    np.testing.assert_array_equal(build_density(cfg), dens)


@pytest.mark.slow
def test_grid_deck_pallas_interpret_matches_xla(tmp_path):
    """Carried-density Mosaic grid mode == the XLA gather path, to the
    end state bitwise (stale-lane freezes are bitwise-invisible: frozen
    lanes draw no RNG and change no state)."""
    cfg = _grid_cfg(tmp_path)

    sim_x = Simulation(cfg.with_(engine="xla"), quiet=True)
    assert sim_x.geom.regions is None
    m_x = sim_x.step(1)

    sim_p = Simulation(cfg.with_(engine="pallas"), quiet=True)
    sim_p.pallas_interpret = True
    sim_p.k_events = 4
    m_p = sim_p.step(1)

    assert (m_p.nfacets, m_p.ncollisions, m_p.nprocessed) == \
        (m_x.nfacets, m_x.ncollisions, m_x.nprocessed)
    t_x = np.asarray(sim_x.tally, np.float64)
    t_p = np.asarray(sim_p.tally, np.float64)
    np.testing.assert_allclose(t_p.sum(), t_x.sum(), rtol=1e-6)
    big = np.abs(t_x) > 1e-6 * np.abs(t_x).max()
    np.testing.assert_allclose(t_p[big], t_x[big], rtol=2e-4)
    for f in ("x", "y", "energy", "cellx", "celly", "counter", "dead"):
        np.testing.assert_array_equal(np.asarray(getattr(sim_p.state, f)),
                                      np.asarray(getattr(sim_x.state, f)),
                                      err_msg=f)


@pytest.mark.slow
def test_grid_deck_with_table_cs_pallas_interpret(tmp_path):
    """Grid density + non-quartic cs tables together: both generality
    paths (carried density AND banded VMEM table lookup) in one kernel."""
    from neutral_tpu.xs import write_cs_file
    from tests.test_pallas_table import make_log_table

    keys, values = make_log_table()
    write_cs_file(str(tmp_path / "elastic_scatter.cs"), keys, values)
    write_cs_file(str(tmp_path / "capture.cs"), keys, values)
    cfg = _grid_cfg(tmp_path, initial_energy=1.0,
                    params_path=str(tmp_path / "deck.params"))

    sim_x = Simulation(cfg.with_(engine="xla"), quiet=True)
    assert not sim_x.cs_scatter.analytic
    m_x = sim_x.step(1)

    sim_p = Simulation(cfg.with_(engine="pallas"), quiet=True)
    sim_p.pallas_interpret = True
    sim_p.k_events = 2
    assert sim_p.scatter_layout is not None
    m_p = sim_p.step(1)

    assert (m_p.nfacets, m_p.ncollisions) == (m_x.nfacets, m_x.ncollisions)
    t_x = np.asarray(sim_x.tally, np.float64)
    t_p = np.asarray(sim_p.tally, np.float64)
    np.testing.assert_allclose(t_p.sum(), t_x.sum(), rtol=1e-6)


@pytest.mark.slow
def test_grid_deck_spatial_pallas_interpret_matches_single(tmp_path):
    """Spatial y-slab decomposition with a grid deck on the fused Pallas
    path: each shard's density slab rides into its kernel (d_row ->
    density_grid) with the dynamic y_off-local refresh gather."""
    from neutral_tpu.parallel import SpatialSimulation

    cfg = _grid_cfg(tmp_path, nx=64, ny=64, nparticles=1024, dt=5e-5,
                    source=SourceBox(0.3, 0.3, 0.4, 0.4))
    single = Simulation(cfg.with_(engine="xla"), quiet=True)
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
        np.asarray(spatial.host_tally(), np.float64).sum(), rtol=1e-6)


@pytest.mark.slow
def test_grid_deck_native_vs_jax_f64(tmp_path):
    """Native C++ engine on a grid deck (its build_density reads the same
    file) == the JAX XLA engine in f64 — independent implementations of
    the per-cell material gather."""
    from neutral_tpu import native
    if not native.available():
        pytest.skip("native engine not built")
    cfg = _grid_cfg(tmp_path, nparticles=400, dtype="float64",
                    tally_dtype="float64", fast_math=False)
    nat = native.NativeSimulation(cfg)
    nf_n, nc_n = nat.step(1)[:2]
    sim = Simulation(cfg.with_(engine="xla"), quiet=True)
    m = sim.step(1)
    assert (m.nfacets, m.ncollisions) == (nf_n, nc_n)
    np.testing.assert_allclose(
        np.asarray(sim.tally, np.float64).sum(),
        nat.tally.sum(), rtol=1e-12)


@pytest.mark.slow
def test_grid_deck_spatial_xla_matches_single(tmp_path):
    """Grid decks under the spatial decomposition on the XLA path (CPU
    production route): sharded density slabs == single-device."""
    from neutral_tpu.parallel import SpatialSimulation

    cfg = _grid_cfg(tmp_path, nx=64, ny=64, nparticles=1024, dt=5e-5,
                    source=SourceBox(0.3, 0.3, 0.4, 0.4))
    single = Simulation(cfg.with_(engine="xla"), quiet=True)
    single.step(1)

    spatial = SpatialSimulation(cfg.with_(engine="xla"), quiet=True)
    spatial.step(1)

    a, b = single.step_metrics[0], spatial.step_metrics[0]
    assert (a.nfacets, a.ncollisions) == (b.nfacets, b.ncollisions)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64).sum(),
        np.asarray(spatial.host_tally(), np.float64).sum(), rtol=1e-6)
