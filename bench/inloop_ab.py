"""A/B the sharded flight path: separate walker drain vs in-loop+plane.

Runs the csp deck under --decomposition spatial2d twice on the available
devices — once with the default chunk structure (separate _walker_drain
dispatch per chunk, count-based segment rings) and once with
flight_sharded_inloop=True (in-loop walker drains + piece-plane rings,
the single-device design) — and prints one JSON line per variant.

An earlier round measured the embedded walker SLOWER in the sharded
program (shared program VMEM budget); this harness exists to re-measure
whenever the kernel or hardware changes.

Usage: python bench/inloop_ab.py [--deck csp] [--steps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def run(deck: str, steps: int, inloop: bool,
        interpret: bool = False) -> dict:
    import dataclasses

    import jax
    from neutral_tpu.config import load_config
    from neutral_tpu.parallel import Spatial2DSimulation

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "problems", f"{deck}.params"))
    cfg = dataclasses.replace(cfg, niters=steps, engine="flight")
    sim = Spatial2DSimulation(cfg, quiet=True)
    if interpret:
        # CPU smoke mode: fused Mosaic kernels in interpret, tiny chunks.
        sim.flight_fused_interpret = True
        sim.flight_max_calls = 2
        sim.flight_k_pieces = 2
    if inloop:
        # Must be set BEFORE the first step (self is a static jit key).
        sim.flight_sharded_inloop = True
    assert sim.use_flight, "A/B is about the flight path"

    events = 0
    times = []
    for tt in range(1, steps + 1):
        t0 = time.perf_counter()
        m = sim.step(tt)
        times.append(time.perf_counter() - t0)
        events += m.nfacets + m.ncollisions
    warm = times[1:] or times
    tally = float(np.asarray(sim.tally, np.float64).sum())
    return {
        "metric": f"{deck}_spatial2d_{'inloop' if inloop else 'default'}",
        "warm_step_s": round(float(np.mean(warm)), 3),
        "events_per_s": round(events / sum(times), 3),
        "tally": tally,
        "n_devices": len(jax.devices()),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--deck", default="csp")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()

    a = run(args.deck, args.steps, inloop=False, interpret=args.interpret)
    print(json.dumps(a), flush=True)
    b = run(args.deck, args.steps, inloop=True, interpret=args.interpret)
    print(json.dumps(b), flush=True)
    rel = abs(b["tally"] - a["tally"]) / max(abs(a["tally"]), 1e-300)
    print(json.dumps({"metric": "inloop_vs_default",
                      "speedup": round(a["warm_step_s"]
                                       / max(b["warm_step_s"], 1e-9), 3),
                      "tally_rel_diff": rel}), flush=True)


if __name__ == "__main__":
    main()
