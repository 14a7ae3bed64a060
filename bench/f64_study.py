"""f64-on-TPU study: cost and fidelity of emulated float64 transport.

The reference is float64 throughout (neutral_data.h:45-81); this
framework runs f32 on TPU (validating within the reference's 1e-3 on
every deck, f32 facet-parity pinned at 0.97-0.98 of f64 on the mixed
probe).  XLA:TPU emulates f64 in software — this script measures what a
full-precision TPU mode would actually cost, and what it buys, by
running the SAME shrunken mixed-regime deck on one chip in f32 and f64
(XLA sweep engine — the Mosaic kernels are f32-only) and on CPU f64 as
the exactness reference.

Usage: JAX_ENABLE_X64=1 python bench/f64_study.py
Prints one JSON line: events/s both ways, slowdown, facet parity.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

from neutral_tpu.config import SimConfig, SourceBox, ProblemRegion  # noqa: E402
from neutral_tpu.driver import Simulation, enable_compilation_cache  # noqa: E402


def _cfg(dtype):
    # Mixed regime: near-vacuum with a dense block — the configuration
    # whose facet counts exposed the f32 resolution artifact in round 1.
    return SimConfig(nx=512, ny=512, dt=1.0e-7, niters=1,
                     nparticles=100_000, initial_energy=1.0e4,
                     source=SourceBox(0.1, 0.1, 0.2, 0.2),
                     problems=(ProblemRegion(1.0e-30, 0.0, 0.0, 1.0, 1.0),
                               ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)),
                     dtype=dtype, tally_dtype=dtype, engine="xla")


def run(dtype):
    sim = Simulation(_cfg(dtype), quiet=True)
    t0 = time.perf_counter()
    m = sim.step(1)
    wall = time.perf_counter() - t0  # includes compile; report warm below
    sim2 = Simulation(_cfg(dtype), quiet=True)
    t0 = time.perf_counter()
    m = sim2.step(1)
    warm = time.perf_counter() - t0
    ev = m.nfacets + m.ncollisions
    return {"nfacets": m.nfacets, "ncollisions": m.ncollisions,
            "warm_s": round(warm, 3), "cold_s": round(wall, 3),
            "events_per_s": round(ev / warm, 1)}


def main() -> None:
    enable_compilation_cache()
    f32 = run("float32")
    f64 = run("float64")
    out = {
        "metric": "f64_on_tpu_study",
        "backend": jax.default_backend(),
        "f32": f32,
        "f64": f64,
        "f64_slowdown": round(f32["events_per_s"]
                              / max(f64["events_per_s"], 1e-9), 2),
        "facet_parity_f32_over_f64": round(
            f32["nfacets"] / max(f64["nfacets"], 1), 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
