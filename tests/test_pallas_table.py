"""General (non-quartic) cross-section tables on the Mosaic engines.

The reference handles arbitrary `.cs` tables with a per-particle binary
search (omp3/neutral.c:498-517); pallas_table.py gives the fused kernels
the same capability via a banded VMEM lookup.  These tests pin:

* bitwise equality of lookup_banded vs CrossSection.lookup (the XLA /
  reference-semantics path) inside a pallas kernel (interpret mode),
* the k-event energy-decay band guarantee that makes the banded loop
  exact by construction,
* driver-level parity: a non-quartic table deck under engine=pallas
  (interpret Mosaic) against the XLA sweep engine,
* engine routing: table decks must reach the ring engine rather than
  silently falling back to the XLA path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neutral_tpu.config import ProblemRegion, SimConfig, SourceBox
from neutral_tpu.driver import Simulation
from neutral_tpu.pallas_table import (_MIN_SCATTER_FRAC, build_layout,
                                      energy_band, lookup_banded)
from neutral_tpu.xs import CrossSection, write_cs_file


def make_log_table(n=4097, lo=1e-2, hi=1e8, seed=0):
    """Strictly-increasing non-quartic grid + a wiggly descending value."""
    rng = np.random.default_rng(seed)
    keys = np.logspace(np.log10(lo), np.log10(hi), n)
    keys = np.sort(keys * (1.0 + 0.05 * rng.random(n) / n))
    u = np.linspace(0.0, 1.0, n)
    values = 1.0 + 1e3 * (1.0 - u) * (1.0 + 0.2 * np.sin(37 * u))
    return keys, values


def _run_lookup_kernel(lay, E, rlo, rhi, interpret=True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(rlo_ref, rhi_ref, k0, k1, v0, v1, e_ref, out_ref):
        out_ref[:] = lookup_banded(e_ref[:], k0, k1, v0, v1,
                                   rlo_ref[0], rhi_ref[0])

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(E.shape, jnp.float32),
        interpret=interpret,
    )(jnp.asarray([rlo], jnp.int32), jnp.asarray([rhi], jnp.int32),
      lay.k0, lay.k1, lay.v0, lay.v1, jnp.asarray(E))


# The banded lookup resolves the SAME bracketing segment as the XLA
# searchsorted path; its interpolation is the same expression but a
# separately-compiled XLA/Mosaic program, so values may differ by FMA
# contraction (~1 ulp).  A wrong segment would err by ~|v1-v0| (rel
# ~2e-3 on these tables), so rtol=1e-5 still pins index correctness.
_INTERP_RTOL = 1e-5


def test_lookup_banded_matches_xla():
    keys, values = make_log_table()
    lay = build_layout(keys, values)
    cs = CrossSection(jnp.asarray(keys, jnp.float32),
                      jnp.asarray(values, jnp.float32))
    rng = np.random.default_rng(1)
    E = rng.uniform(0.5, 2e6, size=(16, 128)).astype(np.float32)
    # clamp edges: below/above the whole table
    E[0, 0] = 1e-4
    E[0, 1] = 1e9
    out = np.asarray(_run_lookup_kernel(lay, E, 0, lay.nrows - 1))
    ref = np.asarray(cs.lookup(jnp.asarray(E)))
    np.testing.assert_allclose(out, ref, rtol=_INTERP_RTOL)


def test_lookup_banded_partial_band():
    """Out-of-band lanes return 0; in-band lanes stay exact."""
    keys, values = make_log_table()
    lay = build_layout(keys, values)
    cs = CrossSection(jnp.asarray(keys, jnp.float32),
                      jnp.asarray(values, jnp.float32))
    rng = np.random.default_rng(2)
    E = rng.uniform(1e3, 1e4, size=(8, 128)).astype(np.float32)
    working = np.ones(E.shape, bool)
    rlo, rhi = energy_band(jnp.asarray(E), jnp.asarray(working), lay.keys,
                           k_events=4)
    assert int(rhi) - int(rlo) < lay.nrows  # genuinely banded
    out = np.asarray(_run_lookup_kernel(lay, E, int(rlo), int(rhi)))
    ref = np.asarray(cs.lookup(jnp.asarray(E)))
    np.testing.assert_allclose(out, ref, rtol=_INTERP_RTOL)


def test_band_covers_k_event_decay():
    """After k worst-case elastic scatters, energy >= the band floor.

    The kernel's post-collision re-lookup energies are exactly these
    decayed values (omp3/neutral.c:264-270 kinematics); the band floor in
    energy_band must bound them or banded lookups would go stale.
    """
    keys, values = make_log_table()
    lay = build_layout(keys, values)
    for k in (1, 4, 8, 16):
        e0 = np.float32(1.0e4)
        e = e0
        for _ in range(k):
            e = np.float32(e * _MIN_SCATTER_FRAC)   # mu_cm = -1, worst case
        working = jnp.asarray([[True] * 128])
        E = jnp.full((1, 128), e0, jnp.float32)
        rlo, rhi = energy_band(E, working, lay.keys, k_events=k)
        # the decayed energy's row must be inside [rlo, rhi]
        idx = int(np.searchsorted(np.asarray(lay.keys), e, side="right")) - 1
        assert int(rlo) <= max(idx, 0) // 128 <= int(rhi)


def _table_deck_cfg(tmp_path, same_xs=True, **kw):
    keys, values = make_log_table()
    write_cs_file(str(tmp_path / "cs.cs"), keys, values)
    if same_xs:
        write_cs_file(str(tmp_path / "elastic_scatter.cs"), keys, values)
        write_cs_file(str(tmp_path / "capture.cs"), keys, values)
    else:
        write_cs_file(str(tmp_path / "elastic_scatter.cs"), keys, values)
        k2, v2 = make_log_table(n=3001, seed=5)
        write_cs_file(str(tmp_path / "capture.cs"), k2, 0.5 * v2)
    base = dict(nx=32, ny=32, dt=1e-4, niters=1, nparticles=16384,
                initial_energy=1.0, chunk_sweeps=8,
                source=SourceBox(0.2, 0.2, 0.6, 0.6),
                problems=(ProblemRegion(1.0e4, 0.0, 0.0, 1.0, 1.0),),
                dtype="float32", tally_dtype="float32",
                params_path=str(tmp_path / "deck.params"))
    base.update(kw)
    return SimConfig(**base)


@pytest.mark.slow
@pytest.mark.parametrize("same_xs", [True, False])
def test_table_deck_pallas_interpret_matches_xla(tmp_path, same_xs):
    cfg = _table_deck_cfg(tmp_path, same_xs=same_xs)

    sim_x = Simulation(cfg.with_(engine="xla"), quiet=True)
    assert not sim_x.cs_scatter.analytic and not sim_x.cs_scatter.quartic
    m_x = sim_x.step(1)

    sim_p = Simulation(cfg.with_(engine="pallas"), quiet=True)
    sim_p.pallas_interpret = True
    sim_p.k_events = 2
    assert sim_p.scatter_layout is not None
    assert (sim_p.absorb_layout is None) == same_xs  # deduped when equal
    m_p = sim_p.step(1)

    assert (m_p.nfacets, m_p.ncollisions, m_p.nprocessed) == \
        (m_x.nfacets, m_x.ncollisions, m_x.nprocessed)
    t_x = np.asarray(sim_x.tally, np.float64)
    t_p = np.asarray(sim_p.tally, np.float64)
    np.testing.assert_allclose(t_p.sum(), t_x.sum(), rtol=1e-6)
    big = np.abs(t_x) > 1e-6 * np.abs(t_x).max()
    np.testing.assert_allclose(t_p[big], t_x[big], rtol=2e-4)
    # end states bitwise identical (same physics expressions, same order)
    for f in ("x", "y", "energy", "cellx", "celly", "counter", "dead"):
        np.testing.assert_array_equal(np.asarray(getattr(sim_p.state, f)),
                                      np.asarray(getattr(sim_x.state, f)),
                                      err_msg=f)


def test_engine_pallas_requires_layout_or_analytic():
    from neutral_tpu.pallas_sweep import pallas_multi_sweep
    from neutral_tpu.transport import Geometry

    keys, values = make_log_table(n=257)
    cs = CrossSection(jnp.asarray(keys, jnp.float32),
                      jnp.asarray(values, jnp.float32))
    geom = Geometry(global_nx=8, global_ny=8, nx=8, ny=8, dx=0.1, dy=0.1,
                    regions=((0, 8, 0, 8, 1.0),))
    with pytest.raises(ValueError, match="analytic cross-sections"):
        pallas_multi_sweep(None, None, None, None, cs, cs, geom,
                           jnp.uint32(1), 1.0, jnp.zeros(4))


def test_table_deck_auto_engine_cpu_stays_xla(tmp_path):
    """engine=auto on CPU backends must still resolve to the XLA path."""
    cfg = _table_deck_cfg(tmp_path, nparticles=8192)
    sim = Simulation(cfg, quiet=True)
    assert sim.use_pallas is False and sim.use_flight is False


@pytest.mark.slow
def test_table_deck_fused_flight_interpret_matches_xla_flight(tmp_path):
    """Non-quartic tables through the fused Mosaic FLIGHT kernel
    (interpret): counts exact vs the XLA flight loop, tally to f32
    accumulation rounding.  Mixed vacuum + dense-block deck so pieces,
    collisions, rasterizer segments and flush rings all fire."""
    cfg = _table_deck_cfg(
        tmp_path, nx=32, ny=32, dt=2e-5, nparticles=256,
        initial_energy=1.0e4, chunk_sweeps=256,
        source=SourceBox(0.1, 0.1, 0.8, 0.8),
        problems=(ProblemRegion(0.0, 0.0, 0.0, 1.0, 1.0),
                  ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)))

    sim_x = Simulation(cfg.with_(engine="flight"), quiet=True)
    assert not sim_x.cs_scatter.analytic
    m_x = sim_x.step(1)           # CPU: the XLA flight loop
    t_x = np.asarray(sim_x.tally, np.float64)

    sim_f = Simulation(cfg.with_(engine="flight"), quiet=True)
    assert sim_f.scatter_layout is not None
    sim_f.flight_max_calls = 2
    sim_f.flight_k_pieces = 2
    m_f = sim_f._step_flight_fused(1, interpret=True)
    t_f = np.asarray(sim_f.tally, np.float64)

    assert (m_f.nfacets, m_f.ncollisions, m_f.nprocessed) == \
        (m_x.nfacets, m_x.ncollisions, m_x.nprocessed)
    np.testing.assert_allclose(t_f.sum(), t_x.sum(), rtol=1e-6)
    big = np.abs(t_x) > 1e-6 * np.abs(t_x).max()
    np.testing.assert_allclose(t_f[big], t_x[big], rtol=1e-4)


@pytest.mark.slow
def test_table_deck_spatial_pallas_interpret_matches_single(tmp_path):
    """Spatial y-slab decomposition on the fused Pallas path with a
    non-quartic table deck (interpret) == the single-device XLA engine:
    the table layouts ride into every shard's kernel and each shard
    derives its own live-energy band."""
    from neutral_tpu.parallel import SpatialSimulation

    cfg = _table_deck_cfg(tmp_path, nparticles=1024, nx=64, ny=64,
                          dt=5e-5, chunk_sweeps=8,
                          initial_energy=1.0e4,
                          source=SourceBox(0.3, 0.3, 0.4, 0.4))
    single = Simulation(cfg.with_(engine="xla"), quiet=True)
    single.step(1)

    spatial = SpatialSimulation(cfg.with_(engine="pallas"), quiet=True)
    assert spatial.use_pallas and spatial.scatter_layout is not None
    spatial.pallas_interpret = True
    spatial.k_events = 4
    spatial.step(1)

    a, b = single.step_metrics[0], spatial.step_metrics[0]
    assert (a.nfacets, a.ncollisions) == (b.nfacets, b.ncollisions)
    np.testing.assert_allclose(
        np.asarray(single.tally, np.float64).sum(),
        np.asarray(spatial.host_tally(), np.float64).sum(), rtol=1e-6)
