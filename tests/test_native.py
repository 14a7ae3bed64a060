"""Native C++ engine tests: RNG bitwise parity + engine equivalence."""

import numpy as np
import pytest

from neutral_tpu import native, oracle, rng
from neutral_tpu.config import SimConfig, SourceBox, ProblemRegion
from neutral_tpu.mesh import build_density
from neutral_tpu.xs import make_resonance_table

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine not built")


def test_native_threefry_bitwise():
    cases = [((0, 0), (0, 0)), ((1, 0), (0, 0)), ((7, 0), (3, 1)),
             ((2**63, 5), (2**64 - 1, 42)), ((123456789, 0), (42, 7))]
    for ctr, key in cases:
        assert native.threefry2x64(*ctr, *key) == rng.threefry2x64_py(ctr, key)


def test_native_draw_matches_python():
    for pid, mk, c in [(0, 0, 0), (5, 3, 17), (999, 1, 2)]:
        a = native.draw2(pid, mk, c)
        b = rng.uniform2_py(pid, mk, c)
        assert a == b


@pytest.mark.slow
def test_native_vs_python_oracle_bitwise():
    """Full 2-step simulation: native == python oracle to the last bit."""
    n = 200
    cfg = SimConfig(nx=40, ny=40, dt=1e-7, niters=2, nparticles=n,
                    initial_energy=1.0e4,
                    source=SourceBox(0.1, 0.1, 0.2, 0.2),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),
                              ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)))
    sim = native.NativeSimulation(cfg)
    ev = [sim.step(tt) for tt in (1, 2)]

    edgex = np.arange(41) * (1.0 / 40)
    edgey = np.arange(41) * (1.0 / 40)
    dens = build_density(cfg)
    keys, vals = make_resonance_table()
    parts = oracle.inject(n, edgex=edgex, edgey=edgey, source_x0=0.1,
                          source_y0=0.1, source_w=0.2, source_h=0.2,
                          initial_energy=1e4, dt=1e-7)
    tally = np.zeros((40, 40))
    for tt in (1, 2):
        r = oracle.run_timestep(
            parts, tally, edgex=edgex, edgey=edgey, density=dens,
            cs_scatter=(keys, vals), cs_absorb=(keys, vals),
            dt=1e-7, master_key=tt, ntotal=n)
        assert (ev[tt - 1][0], ev[tt - 1][1]) == (r.nfacets, r.ncollisions)

    np.testing.assert_allclose(sim.tally.reshape(40, 40), tally,
                               rtol=1e-13, atol=0.0)
    # particle end states agree too
    np.testing.assert_allclose(sim.state.x,
                               np.array([p.x for p in parts]), rtol=1e-13)
    np.testing.assert_array_equal(sim.state.cellx,
                                  np.array([p.cellx for p in parts]))


def test_native_pcg64si_bitwise():
    """Native pcg64si_first matches the Python int oracle bit-for-bit."""
    for seed in (0, 1, 42, 10**15 + 10**4 + 6, 2**63, 2**64 - 1):
        assert native.pcg64si_first(seed) == rng.pcg64si_py(seed)


@pytest.mark.slow
def test_native_pcg_scheme_matches_jax_engine():
    """Native engine under rng=pcg64si agrees exactly with the f64 JAX engine."""
    import jax

    from neutral_tpu.driver import Simulation

    jax.config.update("jax_enable_x64", True)
    n = 300
    cfg = SimConfig(nx=40, ny=40, dt=1e-7, niters=2, nparticles=n,
                    initial_energy=1.0e4, rng="pcg64si",
                    source=SourceBox(0.1, 0.1, 0.2, 0.2),
                    problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),
                              ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                    dtype="float64", tally_dtype="float64")
    nsim = native.NativeSimulation(cfg)
    nat_ev = [nsim.step(tt) for tt in (1, 2)]

    jsim = Simulation(cfg, quiet=True)
    jsim.use_pallas = False
    for tt in (1, 2):
        m = jsim.step(tt)
        assert (m.nfacets, m.ncollisions) == (nat_ev[tt - 1][0],
                                              nat_ev[tt - 1][1])
    np.testing.assert_allclose(
        np.asarray(jsim.tally, np.float64).sum(), nsim.tally.sum(),
        rtol=1e-13)
