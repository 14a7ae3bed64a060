"""PCG64si RNG scheme tests (the oacc/raja backends' generator).

Known-answer vectors were produced by a throwaway C harness compiled
against the reference's vendored pcg_variants.h (seed -> first two
outputs of pcg64si_srandom_r + pcg64si_random_r).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from neutral_tpu import rng

VECS = [
    (0, 5248727431820822368, 8252840206086834016),
    (1, 13306069644767044370, 12077640073973512934),
    (42, 2856751291373192105, 16080178947257844508),
    (10000, 3727022140769141872, 8020145447733930180),
    (1000000000070003, 5929829701959902693, 2448986719082485483),
    (2**64 - 1, 4563350779154724108, 16775829213410073900),
]


def test_pcg_python_kats():
    for seed, a, b in VECS:
        assert rng.pcg64si_pair_py(seed) == (a, b)


def test_pcg_jax_u32_pairs_match_kats():
    seeds = np.array([v[0] for v in VECS], dtype=np.uint64)
    sh = jnp.asarray((seeds >> 32).astype(np.uint32))
    sl = jnp.asarray((seeds & 0xFFFFFFFF).astype(np.uint32))
    ah, al, bh, bl = rng.pcg64si_raw(sh, sl)
    got_a = (np.asarray(ah, np.uint64) << 32) | np.asarray(al, np.uint64)
    got_b = (np.asarray(bh, np.uint64) << 32) | np.asarray(bl, np.uint64)
    # pcg64si_raw returns first outputs of streams seeded (s, s+1):
    # column a must match the KAT first outputs exactly.
    assert list(got_a) == [v[1] for v in VECS]
    # and stream seeded s+1: check via python oracle
    for s, gb in zip(seeds.tolist(), got_b.tolist()):
        assert gb == rng.pcg64si_py((s + 1) % 2**64)


def test_pcg_uniform_pair_matches_oracle():
    for pid, mk, c in [(0, 0, 0), (7, 1, 3), (999, 2, 17)]:
        u = rng.uniform2_pcg_f64(jnp.uint32(pid), jnp.uint32(mk),
                                 jnp.uint32(c))
        e = rng.uniform2_pcg_py(pid, mk, c)
        assert (float(u[0]), float(u[1])) == e


def test_pcg_seed_formula():
    """seed = 1e15*mk + 1e4*pid + 2*counter, as oacc/neutral.c:714-715."""
    pid, mk, c = 7, 3, 5
    seed = 10**15 * mk + 10**4 * pid + 2 * c
    expect = (rng.pcg64si_py(seed) * rng._FACTOR64 + rng._HALF_FACTOR64)
    got, _ = rng.uniform2_pcg_py(pid, mk, c)
    assert got == expect


@pytest.mark.slow
def test_engine_runs_with_pcg_scheme():
    """End-to-end step under pcg64si lands within MC noise of threefry."""
    from neutral_tpu.config import SimConfig, SourceBox, ProblemRegion
    from neutral_tpu.driver import Simulation

    base = dict(nx=64, ny=64, dt=1e-7, niters=1, nparticles=2000,
                initial_energy=1.0e3,
                source=SourceBox(0.25, 0.25, 0.5, 0.5),
                problems=(ProblemRegion(1.0e4, 0.0, 0.0, 1.0, 1.0),),
                dtype="float64", tally_dtype="float64")
    a = Simulation(SimConfig(**base), quiet=True)
    a.step(1)
    b = Simulation(SimConfig(**base, rng="pcg64si"), quiet=True)
    b.step(1)
    ta = float(np.asarray(a.tally).sum())
    tb = float(np.asarray(b.tally).sum())
    assert abs(ta - tb) / ta < 0.1          # independent streams, same physics
    assert b.step_metrics[0].ncollisions > 1e6
