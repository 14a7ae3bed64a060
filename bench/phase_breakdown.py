"""Phase-level timing breakdown of the single-chip Pallas scatter step.

Replicates driver.Simulation.step with block_until_ready + perf_counter
around every device dispatch so we can see where the solve time goes:
chunk sweeps vs ring drains vs compaction vs begin_timestep.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from neutral_tpu.config import load_config
from neutral_tpu.driver import Simulation


def timed(label, fn, *args, acc={}, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    acc.setdefault(label, [0.0, 0])
    acc[label][0] += dt
    acc[label][1] += 1
    return out, acc


def run(sim, tt, acc):
    from neutral_tpu.particles import live_count, merge_compacted, \
        select_working
    from neutral_tpu.transport import EventCounts, begin_timestep
    from neutral_tpu.pallas_sweep import drain_rings, make_rings, \
        pallas_sweep_chunk

    master_key = jnp.uint32(tt)
    (full, _) = timed("begin_timestep", begin_timestep, sim.state, sim.mesh,
                      sim.geom, sim.cs_scatter, sim.cfg.dt, master_key,
                      acc=acc)
    counts = EventCounts.zeros()
    inv_ntotal = 1.0 / sim.cfg.nparticles
    part, sel = full, None
    min_cap = sim.compact_min
    rc, rv, rn = make_rings(part.n, sim.tally.dtype)
    while True:
        max_sw = (sim.chunk_sweeps if part.n > 262144
                  else sim.chunk_sweeps * 8)
        out, _ = timed(f"chunk@{part.n}", pallas_sweep_chunk, part, sim.tally,
                       counts, rc, rv, rn, sim.cs_scatter, sim.cs_absorb,
                       sim.geom, master_key, inv_ntotal, max_sw,
                       k_events=sim.k_events, acc=acc)
        part, sim.tally, counts, rc, rv, rn, done, any_live = out
        if sel is None:
            full = part
        if not bool(any_live):
            break
        cap = part.n
        if sim.compact_enabled and cap > min_cap:
            live = int(live_count(part))
            target = max(min_cap, 1 << (max(live, 1) - 1).bit_length())
            if target <= cap // 2:
                out, _ = timed("drain(compact)", drain_rings, sim.tally,
                               rc, rv, rn, acc=acc)
                sim.tally, rc, rv, rn = out
                if sel is not None:
                    full = merge_compacted(full, part, sel)
                else:
                    full = part
                (ps, _) = timed("select_working", select_working, full,
                                target, acc=acc)
                part, sel = ps
                rc, rv, rn = make_rings(target, sim.tally.dtype)
    out, _ = timed("drain(final)", drain_rings, sim.tally, rc, rv, rn, acc=acc)
    sim.tally, rc, rv, rn = out
    if sel is not None:
        full = merge_compacted(full, part, sel)
    else:
        full = part
    sim.state = full
    return counts


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(here)
    cfg = load_config("problems/scatter.params")
    sim = Simulation(cfg, quiet=True)
    # Warmup: the same phase-instrumented loop (compiles all ITS shapes).
    for tt in (1, 2):
        run(sim, tt, {})
    # Fresh sim, measured with phase timers.
    sim = Simulation(cfg, quiet=True)
    acc = {}
    t0 = time.perf_counter()
    for tt in (1, 2):
        run(sim, tt, acc)
    total = time.perf_counter() - t0
    print(f"total {total:.3f}s")
    for k, (t, n) in sorted(acc.items(), key=lambda kv: -kv[1][0]):
        print(f"{k:24s} {t:8.3f}s  x{n:4d}  ({t/n*1e3:8.2f} ms/call)")


if __name__ == "__main__":
    main()
