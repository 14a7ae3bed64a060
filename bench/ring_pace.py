"""Measure the ring engine's in-kernel pace on the real chip.

One warm full-width pallas_sweep_chunk at 100% occupancy (step-1 state,
before any census deaths), timed around block_until_ready — the
lane-sweeps/s number BASELINE.md's roofline quotes as "kernel pace".

Usage: python bench/ring_pace.py [deck] [sweeps]
"""
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(here)
sys.path.insert(0, here)


def run(deck="scatter", sweeps=128):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from neutral_tpu.config import load_config
    from neutral_tpu.driver import Simulation
    from neutral_tpu.pallas_sweep import make_rings, pallas_sweep_chunk
    from neutral_tpu.transport import EventCounts, begin_timestep

    cfg = load_config(os.path.join(here, "problems", f"{deck}.params"))
    sim = Simulation(cfg, quiet=True)
    part = begin_timestep(sim.state, sim.mesh, sim.geom, sim.cs_scatter,
                          cfg.dt, jnp.uint32(1))
    n = part.x.shape[0]
    rc, rv, rn = make_rings(n, sim.tally.dtype)
    tally, counts = sim.tally, EventCounts.zeros()

    for rep in range(3):
        t0 = time.perf_counter()
        (part, tally, counts, rc, rv, rn, done,
         n_work) = pallas_sweep_chunk(
            part, tally, counts, rc, rv, rn, sim.cs_scatter,
            sim.cs_absorb, sim.geom, jnp.uint32(1), 1.0 / cfg.nparticles,
            sweeps, k_events=sim.k_events,
            scatter_layout=sim.scatter_layout,
            absorb_layout=sim.absorb_layout,
            density_grid=(sim.mesh.density
                          if sim.geom.regions is None else None))
        done_i = int(done)     # blocks on the chunk
        live = int(n_work)
        dt = time.perf_counter() - t0
        ls = n * done_i
        print(f"rep{rep}: {done_i} sweeps x {n} lanes in {dt:.3f}s = "
              f"{ls / dt:.3e} lane-sweeps/s (live after: {live})",
              flush=True)


if __name__ == "__main__":
    deck = sys.argv[1] if len(sys.argv) > 1 else "scatter"
    sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    run(deck, sweeps)
