"""A/B the walker-mode chunk length (flight_max_calls) on the real chip.

At big widths the fused flight chunk exits every max_calls kernel calls
so the host can check compaction cadence — each exit is a blocking ctrl
fetch (a tunnel round trip).  This probe measures the end-to-end solve
for a sweep of max_calls values on one deck.

Usage: python bench/maxcalls_ab.py <deck> [mc1 mc2 ...]
"""
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(here)
sys.path.insert(0, here)


def run(deck: str, mcs):
    import numpy as np
    import jax
    from neutral_tpu.config import load_config
    from neutral_tpu.driver import Simulation

    cfg = load_config(os.path.join(here, "problems", f"{deck}.params"))

    for mc in mcs:
        for measured in (False, True):
            sim = Simulation(cfg, quiet=True)
            if mc:
                sim.flight_max_calls = mc
            leaf = jax.tree_util.tree_leaves(sim.state)[0]
            np.asarray(leaf.reshape(-1)[:1])
            events = 0
            t0 = time.perf_counter()
            for tt in range(1, cfg.niters + 1):
                m = sim.step(tt)
                events += m.nfacets + m.ncollisions
            dt = time.perf_counter() - t0
            if measured:
                print(f"max_calls={mc or 'default'}: {events} events "
                      f"in {dt:.3f}s = {events / dt:.3e} ev/s", flush=True)


if __name__ == "__main__":
    mcs = [int(a) for a in sys.argv[2:]] or [0, 8, 16, 32]
    run(sys.argv[1], mcs)
