"""A/B the in-kernel cliff exit (exit_live/exit_collapse) on the real chip.

Usage: python bench/exitlive_ab.py <deck> [mode ...]
modes:
  off     no in-kernel exit, no host cliff shortening
  act     activity exit (nf+nc collapse): free per-call detector,
          exits at the cliff's onset (measured SLOWER on scatter —
          see driver._RING_EXIT_ACT; the compaction response is the
          cost, not the detector)
  halve   live-count exit, exit_collapse=2 (the round-4 regression)
  quarter live-count exit, exit_collapse=4

Measured 2026-08-19 (scatter, ring engine): off 2.169e9, quarter
1.660e9, halve 0.911e9 ev/s — any LIVE-COUNT exit loses on the ring
engine (the per-call count_nonzero(working_mask) alone costs ~1s/solve
at 10M lanes).  The activity exit reuses the per-call event-count
reduction the metric contract already pays for, so only the exit's
compaction cadence differs from "off".
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
        drv._RING_EXIT_ACT = mode == "act"
        if mode in ("off", "act"):
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
    drv._RING_EXIT_ACT = False
    drv._exit_live_for = real_fn
    drv._flight_exit_live = real_ffn
    drv._EXIT_COLLAPSE = real_collapse


if __name__ == "__main__":
    run(sys.argv[1], sys.argv[2:] or ["off", "quarter", "halve"])
