"""A/B the in-kernel cliff exit (exit_live/exit_collapse) on the real chip.

Usage: python bench/exitlive_ab.py <deck> [mode ...]
modes:
  off     exit_live=0 -> chunks always run to max_sweeps/max_calls
  halve   exit_collapse=2 (the round-4 shipped guard; regressed scatter)
  quarter exit_collapse=4

Measured 2026-08-19 (scatter, ring engine): off 2.169e9, quarter
1.660e9, halve 0.911e9 ev/s — ANY in-kernel exit loses on the ring
engine (the per-call live count alone costs ~1s/solve at 10M lanes), so
the driver ships _RING_EXIT=False; halve/quarter re-enable it here.
The flight engine keeps its exit (it lets max_calls run long).
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
    real_ffn = drv._flight_exit_live
    real_collapse = drv._EXIT_COLLAPSE

    for mode in modes:
        if mode == "off":
            drv._RING_EXIT = False
            drv._flight_exit_live = lambda c, m: 0
            drv._EXIT_COLLAPSE = real_collapse
        else:
            drv._RING_EXIT = True
            drv._flight_exit_live = real_ffn
            drv._EXIT_COLLAPSE = {"halve": 2, "quarter": 4}[mode]
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
                print(f"exit={mode}: {events} events in {dt:.3f}s "
                      f"= {events / dt:.3e} ev/s", flush=True)
    drv._RING_EXIT = False
    drv._exit_live_for = real_fn
    drv._flight_exit_live = real_ffn
    drv._EXIT_COLLAPSE = real_collapse


if __name__ == "__main__":
    run(sys.argv[1], sys.argv[2:] or ["off", "quarter", "halve"])
