"""A/B the tail walker-drain cadence (pallas_flight_chunk seg_repeat).

At compacted-tail widths the in-loop walker drain fires after every
fused kernel call (piece-plane rings), and its ~1.4 ms fixed cost
dominates the ~0.4 ms kernel: csp's tail chunk measured ~68 drains and
0.12-0.17 s per step (bench logs, 2026-08-21).  seg_repeat M runs M
sub-calls per drain over an (M*k)-plane ring, dividing the fixed cost
by M at the price of an M x larger drain scan.

Usage: python bench/segrepeat_ab.py [deck ...]     (default: csp split)
"""
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(here)
sys.path.insert(0, here)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(here, ".jax_cache"))


def run(decks):
    import numpy as np
    import jax
    from neutral_tpu.config import load_config
    from neutral_tpu.driver import Simulation

    for deck in decks:
        cfg = load_config(os.path.join(here, "problems",
                                       f"{deck}.params"))
        for sr in (1, 4, 8):
            for measured in (False, True):
                sim = Simulation(cfg, quiet=True)
                sim.flight_seg_repeat = sr
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
                print(f"{deck} sr={sr}: {events} ev in {dt:.3f}s = "
                      f"{events / dt:.3e} ev/s  tally={tally:.9e}",
                      flush=True)


if __name__ == "__main__":
    run(sys.argv[1:] or ["csp", "split"])
