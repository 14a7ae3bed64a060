"""Warm per-phase timing probe for one deck on the real chip.

bench.py measures end-to-end; this probe re-runs the measured pass with
NEUTRAL_TPU_DEBUG_PHASES=1 (per-phase host syncs + per-chunk prints) so
the wall-clock actually lands in the phase that produced it.  The warmup
pass runs with syncing off — executables are shared via the sim's
cfg-keyed jit identity, so the measured pass is warm.

Usage: python bench/phases_probe.py <deck> [engine]
"""
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(here)
sys.path.insert(0, here)


def run(deck: str, engine: str = "auto"):
    import numpy as np
    import jax
    from neutral_tpu.config import load_config
    from neutral_tpu.driver import Simulation

    cfg = load_config(os.path.join(here, "problems", f"{deck}.params"))
    if engine != "auto":
        cfg = cfg.with_(engine=engine)

    for measured in (False, True):
        os.environ.pop("NEUTRAL_TPU_DEBUG_PHASES", None)
        if measured:
            os.environ["NEUTRAL_TPU_DEBUG_PHASES"] = "1"
        sim = Simulation(cfg, quiet=True)
        leaf = jax.tree_util.tree_leaves(sim.state)[0]
        np.asarray(leaf.reshape(-1)[:1])
        agg = {}
        events = 0
        t0 = time.perf_counter()
        for tt in range(1, cfg.niters + 1):
            m = sim.step(tt)
            events += m.nfacets + m.ncollisions
            for k, v in (m.phases or {}).items():
                agg[k] = agg.get(k, 0.0) + v
        dt = time.perf_counter() - t0
        tag = "measured" if measured else "warmup"
        print(f"[{tag}] {deck}/{engine}: {events} events in {dt:.3f}s "
              f"= {events / dt:.3e} ev/s")
        if measured:
            tot = sum(agg.values())
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
                print(f"  {k:12s} {v:7.3f}s  ({100 * v / max(tot, 1e-9):.1f}%)")


if __name__ == "__main__":
    run(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "auto")
