"""Transport engine vs the sequential history oracle, plus invariants.

The oracle (neutral_tpu/oracle.py) re-implements the reference's history
loop independently; in float64 the vectorized event engine must reproduce
its event counts *exactly* (same RNG streams, same branch decisions) and
its tally up to accumulation-order rounding.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neutral_tpu import (SimConfig, SourceBox, ProblemRegion, build_mesh,
                         CrossSection, inject_particles, Geometry,
                         run_timestep)
from neutral_tpu import oracle, xs


def make_problem(kind: str) -> SimConfig:
    if kind == "scatter":
        problems = (ProblemRegion(1.0e4, 0, 0, 1, 1),)
        e0, np_, iters = 1.0e3, 30, 2
        src = SourceBox(0.2, 0.2, 0.6, 0.6)
    elif kind == "stream":
        problems = (ProblemRegion(1.0e-30, 0, 0, 1, 1),)
        e0, np_, iters = 1.0e6, 40, 1
        src = SourceBox(0.45, 0.45, 0.1, 0.1)
    elif kind == "csp":
        problems = (ProblemRegion(1.0e-30, 0, 0, 1, 1),
                    ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2))
        e0, np_, iters = 1.0e4, 25, 4
        src = SourceBox(0.1, 0.1, 0.2, 0.2)
    elif kind == "split":
        problems = (ProblemRegion(1.0e-30, 0.0, 0.0, 1.0, 0.5),
                    ProblemRegion(1.0e3, 0.0, 0.5, 1.0, 0.5))
        e0, np_, iters = 2.5e4, 25, 1
        src = SourceBox(0.4, 0.4, 0.2, 0.2)
    else:
        raise ValueError(kind)
    return SimConfig(nx=48, ny=48, width=1.0, height=1.0, dt=1e-7,
                     niters=iters, nparticles=np_, initial_energy=e0,
                     source=src, problems=problems, dtype="float64",
                     tally_dtype="float64")


def run_jax(cfg: SimConfig, dtype=jnp.float64, pad_to=None):
    mesh = build_mesh(cfg, dtype=dtype)
    tab = CrossSection.resonance(dtype=dtype)
    geom = Geometry(cfg.nx, cfg.ny, cfg.nx, cfg.ny)
    st = inject_particles(
        mesh, nparticles=cfg.nparticles,
        source_x0=cfg.source.xpos * cfg.width,
        source_y0=cfg.source.ypos * cfg.height,
        source_width=cfg.source.width * cfg.width,
        source_height=cfg.source.height * cfg.height,
        initial_energy=cfg.initial_energy, dt=cfg.dt, dtype=dtype,
        pad_to=pad_to)
    tally = jnp.zeros(cfg.nx * cfg.ny, dtype)
    stats = []
    for tt in range(1, cfg.niters + 1):
        st, tally, counts, nproc, nsweeps = run_timestep(
            st, tally, mesh, tab, tab, geom, cfg.dt, jnp.uint32(tt),
            1.0 / cfg.nparticles)
        nf, nc = counts.totals()
        stats.append(dict(nf=nf, nc=nc, nproc=int(nproc)))
    return np.asarray(tally).reshape(cfg.ny, cfg.nx), stats, st


def run_oracle(cfg: SimConfig):
    mesh = build_mesh(cfg, dtype=jnp.float64)
    edgex = np.asarray(mesh.edgex)
    edgey = np.asarray(mesh.edgey)
    density = np.asarray(mesh.density)
    ek, ev = xs.make_resonance_table()
    parts = oracle.inject(
        cfg.nparticles, edgex=edgex, edgey=edgey,
        source_x0=cfg.source.xpos * cfg.width,
        source_y0=cfg.source.ypos * cfg.height,
        source_w=cfg.source.width * cfg.width,
        source_h=cfg.source.height * cfg.height,
        initial_energy=cfg.initial_energy, dt=cfg.dt)
    tally = np.zeros((cfg.ny, cfg.nx))
    stats = []
    for tt in range(1, cfg.niters + 1):
        r = oracle.run_timestep(parts, tally, edgex=edgex, edgey=edgey,
                                density=density, cs_scatter=(ek, ev),
                                cs_absorb=(ek, ev), dt=cfg.dt, master_key=tt,
                                ntotal=cfg.nparticles)
        stats.append(dict(nf=r.nfacets, nc=r.ncollisions, nproc=r.nprocessed))
    return tally, stats, parts


@pytest.mark.parametrize("kind", ["scatter", "stream", "csp", "split"])
def test_engine_matches_oracle_f64(kind):
    cfg = make_problem(kind)
    jt, jstats, jstate = run_jax(cfg)
    ot, ostats, oparts = run_oracle(cfg)
    # exact per-history equivalence: identical branch decisions every event
    assert jstats == ostats
    # tallies agree to accumulation-order rounding
    assert ot.sum() != 0.0
    np.testing.assert_allclose(jt, ot, rtol=1e-9, atol=1e-300)
    # terminal particle states agree
    dead_j = np.asarray(jstate.dead)[:cfg.nparticles]
    dead_o = np.array([p.dead for p in oparts])
    np.testing.assert_array_equal(dead_j, dead_o)


def test_padding_lanes_are_inert():
    cfg = make_problem("csp")
    jt, jstats, _ = run_jax(cfg)
    jt2, jstats2, _ = run_jax(cfg, pad_to=64)
    assert jstats == jstats2
    np.testing.assert_array_equal(jt, jt2)


def test_determinism_bitwise():
    cfg = make_problem("split")
    t1, s1, _ = run_jax(cfg)
    t2, s2, _ = run_jax(cfg)
    assert s1 == s2
    np.testing.assert_array_equal(t1, t2)


@pytest.mark.slow
def test_f32_within_validation_tolerance():
    cfg = make_problem("scatter").with_(nparticles=200)
    jt64, _, _ = run_jax(cfg, dtype=jnp.float64)
    jt32, _, _ = run_jax(cfg, dtype=jnp.float32)
    rel = abs(jt32.sum() - jt64.sum()) / abs(jt64.sum())
    assert rel < 1e-3  # the reference's validation tolerance


def test_stream_total_path_matches_analytic():
    """In near-vacuum, every particle deposits along its full census path:
    tally_sum = rate_per_meter * speed * dt (per-particle normalized)."""
    cfg = make_problem("stream")
    jt, stats, _ = run_jax(cfg)
    tab = CrossSection.resonance(dtype=jnp.float64)
    e0 = cfg.initial_energy
    sig = float(tab.lookup(jnp.asarray([e0], jnp.float64))[0])
    from neutral_tpu.constants import (AVOGADROS, BARNS, EV_TO_J, MASS_NO,
                                       MOLAR_MASS, PARTICLE_MASS)
    n_dens = 1.0e-30 * AVOGADROS / MOLAR_MASS
    a = MASS_NO
    heating = e0 * (1.0 - 0.5 * (a * a + a + 1) / ((a + 1) ** 2))
    rate = (2 * sig * BARNS) * heating * n_dens
    speed = np.sqrt(2 * e0 * EV_TO_J / PARTICLE_MASS)
    expect = rate * speed * cfg.dt
    assert jt.sum() == pytest.approx(expect, rel=1e-3)
    assert stats[0]["nc"] == 0  # no collisions in vacuum


def test_all_particles_die_in_dense_scatter():
    cfg = make_problem("scatter")
    _, stats, st = run_jax(cfg)
    assert bool(np.asarray(st.dead).all())
    assert stats[1] == dict(nf=0, nc=0, nproc=0)


@pytest.mark.slow
def test_f32_facet_count_parity_mixed_regime():
    """f32 facet-event counts track f64 on a mixed facet/collision deck.

    Round-1 residual: f32 inflated facet counts ~2x via mfp/census
    rounding near cell edges (ROADMAP "Fidelity").  The cell-local
    coordinate representation pins the ratio to ~0.97-0.98; this guards
    against regressions (acceptance: within [0.9, 1.1]).
    """
    from neutral_tpu.driver import Simulation

    def run(dtype):
        cfg = SimConfig(nx=2000, ny=2000, dt=4e-7, niters=1,
                        nparticles=1024, initial_energy=1.0e3,
                        source=SourceBox(0.2, 0.2, 0.6, 0.6),
                        problems=(ProblemRegion(3.0e2, 0, 0, 1, 1),),
                        dtype=dtype, tally_dtype=dtype)
        sim = Simulation(cfg, quiet=True)
        m = sim.step(1)
        return m.nfacets, m.ncollisions

    nf64, nc64 = run("float64")
    nf32, nc32 = run("float32")
    assert nf64 > 200  # the probe must exercise the facet path
    assert abs(nc32 - nc64) <= 0.01 * nc64
    assert 0.9 <= nf32 / nf64 <= 1.1, (nf32, nf64)
