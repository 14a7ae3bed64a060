"""Per-deck throughput floors on the real chip (VERDICT r4 weak #3).

No test caught the round-4 2.3x scatter regression: the hardware tier
pinned only correctness.  This test runs each production deck end-to-end
(warm) and fails below 0.6x the last committed bench capture — loose
enough for the host's ~±7% tunnel variance plus a bad day, tight enough
that any 2x-class regression (like commit 8ccfcf0's census-cliff exit)
fails the tier the day it is written.

Floors come from the same source as the published tables
(bench/gen_perf_tables.latest_bench), so a new capture re-pins them
automatically.
"""

import os
import sys
import time

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR_FRAC = 0.6
DECKS = ("scatter", "stream", "csp", "split")


def _recorded_rates():
    sys.path.insert(0, os.path.join(HERE, "bench"))
    import gen_perf_tables as g

    src, recs = g.latest_bench()
    return src, {d: recs[d]["value"] for d in DECKS if d in recs}


def _measure(deck: str) -> float:
    import numpy as np
    import jax
    from neutral_tpu.config import load_config
    from neutral_tpu.driver import Simulation

    cfg = load_config(os.path.join(HERE, "problems", f"{deck}.params"))
    rate = 0.0
    for measured in (False, True):  # pass 1 warms trace/compile caches
        sim = Simulation(cfg, quiet=True)
        leaf = jax.tree_util.tree_leaves(sim.state)[0]
        np.asarray(leaf.reshape(-1)[:1])  # sync construction uploads
        events = 0
        t0 = time.perf_counter()
        for tt in range(1, cfg.niters + 1):
            m = sim.step(tt)
            events += m.nfacets + m.ncollisions
        if measured:
            rate = events / (time.perf_counter() - t0)
    return rate


@pytest.mark.parametrize("deck", DECKS)
def test_throughput_floor(deck):
    src, rates = _recorded_rates()
    if deck not in rates:
        pytest.skip(f"no recorded rate for {deck} in {src}")
    floor = FLOOR_FRAC * rates[deck]
    rate = _measure(deck)
    assert rate >= floor, (
        f"{deck}: {rate:.3e} events/s is below {FLOOR_FRAC}x the recorded "
        f"{rates[deck]:.3e} ({src}) — a throughput regression (or rerun "
        "on a healthier tunnel; variance is ~±7%)")
