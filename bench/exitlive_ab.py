"""A/B the ring engine's in-kernel cliff exit (exit_live) on the real chip.

Usage: python bench/exitlive_ab.py <deck> [mode ...]
modes: on (driver default), off (threshold 0 -> chunk runs to max_sweeps)
"""
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(here)
sys.path.insert(0, here)


def run(deck: str, modes):
    import numpy as np
    import jax
    from neutral_tpu.config import load_config
    from neutral_tpu import driver as drv

    cfg = load_config(os.path.join(here, "problems", f"{deck}.params"))
    real_fn = drv._exit_live_for

    for mode in modes:
        drv._exit_live_for = real_fn if mode == "on" else (lambda c, m: 0)
        for measured in (False, True):
            sim = drv.Simulation(cfg, quiet=True)
            leaf = jax.tree_util.tree_leaves(sim.state)[0]
            np.asarray(leaf.reshape(-1)[:1])
            events = 0
            t0 = time.perf_counter()
            for tt in range(1, cfg.niters + 1):
                m = sim.step(tt)
                events += m.nfacets + m.ncollisions
            dt = time.perf_counter() - t0
            if measured:
                print(f"exit_live={mode}: {events} events in {dt:.3f}s "
                      f"= {events / dt:.3e} ev/s", flush=True)
    drv._exit_live_for = real_fn


if __name__ == "__main__":
    run(sys.argv[1], sys.argv[2:] or ["off", "on"])
