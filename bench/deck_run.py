"""Warm, validated throughput measurement of one or more decks on the
real chip (the A/B workhorse: bench.py's measurement core without the
pcg/spatial sweeps).

For each deck: one warmup solve (absorbs per-process executable loads
through the axon tunnel), then a measured solve, then golden validation
(same contract as the driver).

Usage: python bench/deck_run.py <deck> [<deck> ...]
"""
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(here)
sys.path.insert(0, here)


def run(decks):
    import numpy as np
    import jax
    from neutral_tpu.config import load_config
    from neutral_tpu.driver import Simulation, within_tolerance

    for deck in decks:
        cfg = load_config(os.path.join(here, "problems", f"{deck}.params"))
        for measured in (False, True):
            sim = Simulation(cfg, quiet=True)
            leaf = jax.tree_util.tree_leaves(sim.state)[0]
            np.asarray(leaf.reshape(-1)[:1])
            events = 0
            t0 = time.perf_counter()
            for tt in range(1, cfg.niters + 1):
                m = sim.step(tt)
                events += m.nfacets + m.ncollisions
            dt = time.perf_counter() - t0
            if not measured:
                continue
            tally = float(np.asarray(sim.tally, np.float64).sum())
            ok = ""
            if cfg.expected_tally is not None:
                rel = (abs(tally - cfg.expected_tally)
                       / abs(cfg.expected_tally))
                good = within_tolerance(cfg.expected_tally, tally, 1e-3)
                ok = (f"  {'PASSED' if good else 'FAILED'}"
                      f" rel={rel:.2e}")
            print(f"{deck}: {events} events in {dt:.3f}s = "
                  f"{events / dt:.3e} ev/s{ok}", flush=True)


if __name__ == "__main__":
    run(sys.argv[1:] or ["csp"])
