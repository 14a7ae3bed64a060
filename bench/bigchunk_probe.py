"""Split the csp full-width chunk cost: flight kernel vs walker drain.

The phase table (NEUTRAL_TPU_DEBUG_PHASES) shows csp's warm step is
dominated by ONE full-width chunk (~0.48 s for a single k=8-piece
kernel call + in-loop walker drain).  This probe runs the same call
sequence OUTSIDE the fused chunk loop with block_until_ready around
each part, and reports the ring occupancy (real segments vs S x N
slots) that the drain pays for.

Usage: python bench/bigchunk_probe.py [deck] [repeat]
"""
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(here)
sys.path.insert(0, here)


def main(deck="csp", repeat=3):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from neutral_tpu.config import load_config
    from neutral_tpu.driver import Simulation
    from neutral_tpu.pallas_flight import make_seg_ring, pallas_flight_multi
    from neutral_tpu.pallas_sweep import make_rings
    from functools import partial
    from neutral_tpu.raster import (TILE, grid_shape,
                                    rasterize_walk_rings_impl)
    from neutral_tpu.transport import EventCounts, begin_timestep

    cfg = load_config(os.path.join(here, "problems", f"{deck}.params"))
    sim = Simulation(cfg, quiet=True)
    nty, ntx = grid_shape(cfg.nx, cfg.ny, TILE)
    master_key = jnp.uint32(1)
    full = begin_timestep(sim.state, sim.mesh, sim.geom, sim.cs_scatter,
                          cfg.dt, master_key)
    k_pieces = 8
    fr = make_rings(full.n, sim.tally.dtype, ring_slots=8)
    sr = make_seg_ring(full.n, sim.dtype, s_slots=k_pieces)
    rbuf = jnp.zeros((nty * TILE, ntx * TILE), jnp.float32)

    multi = jax.jit(
        lambda s, fr, sr, t: pallas_flight_multi(
            s, fr, sr, sim.cs_scatter, sim.cs_absorb, sim.geom,
            master_key, 1.0 / cfg.nparticles, t, k_pieces=k_pieces,
            seg_plane=True, scatter_layout=sim.scatter_layout,
            absorb_layout=sim.absorb_layout))

    for it in range(repeat):
        state = full
        t0 = time.perf_counter()
        state, fr2, (sf, sn), nfac, ncol = multi(state, fr, sr, sim.tally)
        jax.block_until_ready(sf)
        t1 = time.perf_counter()
        nseg = int(jnp.sum((sf[4] != 0).astype(jnp.int32)))
        times = {}
        for compact in (False, True):
            drain = jax.jit(partial(
                rasterize_walk_rings_impl, tile=TILE, ntx=ntx, nty=nty,
                kk_authoritative=True, compact=compact))
            rb2, _ = drain(rbuf.copy(), sf, sn)  # compile warmup
            jax.block_until_ready(rb2)
            t2 = time.perf_counter()
            rb2, (sf3, sn3) = drain(rbuf.copy(), sf, sn)
            jax.block_until_ready(rb2)
            times[compact] = time.perf_counter() - t2
        slots = sf[4].size
        print(f"[{it}] kernel={t1 - t0:.3f}s  nseg={nseg}/{slots} "
              f"({100.0 * nseg / slots:.2f}%)  "
              f"drain_sparse={times[False]:.3f}s "
              f"drain_compact={times[True]:.3f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "csp",
         int(sys.argv[2]) if len(sys.argv) > 2 else 3)
