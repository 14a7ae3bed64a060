"""Measure ONE v5e-16 shard's production slice on the real chip.

BASELINE.md's scaled-config memory model (4096^2 mesh, 1e8 particles,
4x4 spatial2d over 16 chips => ~6.25M lanes/chip at 2x headroom 12.5M
lane slots, 1024^2 tally block) was paper-only until this run: allocate
exactly one shard's slice — lanes, 16-slot flush rings, 4-slot segment
rings, segment buffer, block raster buffer — and drive the fused
windowed flight kernel through real chunks, recording HBM high-water
and steady-state chunk time.

Usage: python bench/v5e16_slice.py [--lanes 12582912] [--stream|--csp]
Prints one JSON line.
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
import jax
import jax.numpy as jnp

from neutral_tpu.config import SimConfig, SourceBox, ProblemRegion
from neutral_tpu.driver import enable_compilation_cache, load_cross_sections
from neutral_tpu.flight import disjoint_rects
from neutral_tpu.mesh import region_cell_bounds
from neutral_tpu.particles import inject_particles
from neutral_tpu.pallas_flight import make_seg_ring, pallas_flight_chunk
from neutral_tpu.pallas_sweep import drain_rings, make_rings
from neutral_tpu.raster import TILE, grid_shape
from neutral_tpu.transport import EventCounts, Geometry, begin_timestep
from neutral_tpu.mesh import build_mesh


def hbm_stats():
    st = jax.devices()[0].memory_stats() or {}
    return (st.get("bytes_in_use", 0), st.get("peak_bytes_in_use", 0))


def nbytes(*trees):
    """Analytic allocation total (the axon plugin exposes no memory_stats)."""
    total = 0
    for t in trees:
        for leaf in jax.tree_util.tree_leaves(t):
            total += leaf.size * leaf.dtype.itemsize
    return total


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=12 * 1024 * 1024 + 512 * 1024)
    p.add_argument("--csp", action="store_true",
                   help="csp-style deck (dense block) instead of stream")
    args = p.parse_args()
    enable_compilation_cache()

    # Global 4096^2 problem; THIS shard owns block (1,1) of a 4x4 grid.
    G, B = 4096, 1024
    x_off_i, y_off_i = B, B
    if args.csp:
        problems = (ProblemRegion(1.0e-30, 0.0, 0.0, 1.0, 1.0),
                    ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2))
    else:
        problems = (ProblemRegion(1.0e-30, 0.0, 0.0, 1.0, 1.0),)
    # dt chosen so a census (speed*dt ~ 0.07 of the domain) completes
    # INSIDE the 0.25-wide block: the slice harness has no migration, so
    # wall-exited lanes would freeze and end the measurement early.
    cfg = SimConfig(nx=G, ny=G, dt=5.0e-9, niters=1,
                    nparticles=args.lanes, initial_energy=1.0e6,
                    # source inside this shard's block
                    source=SourceBox(0.30, 0.30, 0.15, 0.15),
                    problems=problems,
                    dtype="float32", tally_dtype="float32")
    regions = region_cell_bounds(cfg)
    geom = Geometry(global_nx=G, global_ny=G, nx=B, ny=B,
                    dx=cfg.width / G, dy=cfg.height / G,
                    regions=regions, rng_scheme="threefry",
                    rects=disjoint_rects(regions, G, G))
    mesh2d = build_mesh(cfg, dtype=jnp.float32, with_density=False)
    cs_s, cs_a = load_cross_sections(cfg, dtype=jnp.float32)

    n = args.lanes
    state = inject_particles(
        mesh2d, nparticles=n,
        source_x0=cfg.source.xpos, source_y0=cfg.source.ypos,
        source_width=cfg.source.width, source_height=cfg.source.height,
        initial_energy=cfg.initial_energy, dt=cfg.dt,
        dtype=jnp.float32, pad_to=n, rng_scheme="threefry",
        local_coords=None)
    # Production per-shard buffers (16-slot flush rings — the sizing
    # question BASELINE.md's table leaves open — 4-slot segment rings).
    tally = jnp.zeros(B * B, jnp.float32)
    fc, fv, fn = make_rings(n, jnp.float32, ring_slots=16)
    sf, sn = make_seg_ring(n, jnp.float32, s_slots=4)
    SCAP = 1 << 20
    segbuf = jnp.zeros((SCAP, 8), jnp.float32)
    nty, ntx = grid_shape(B, B, TILE)
    rbuf = jnp.zeros((nty * TILE, ntx * TILE), jnp.float32)
    jax.block_until_ready(tally)
    _ = float(tally[0])
    use0, peak0 = hbm_stats()

    z = jnp.zeros((), jnp.int32)
    xo = jnp.int32(x_off_i)
    yo = jnp.int32(y_off_i)
    alloc_gb = nbytes(state, tally, fc, fv, fn, sf, sn, segbuf,
                      rbuf) / 2**30
    times = []
    pieces = 0
    for tt in range(1, 5):           # full census steps; step 1 is cold
        t0 = time.perf_counter()
        state = begin_timestep(state, mesh2d, geom, cs_s, cfg.dt,
                               jnp.uint32(tt))
        while True:
            (state, tally, c, fc, fv, fn, sf, sn, segbuf, rbuf,
             ctrl) = pallas_flight_chunk(
                state, tally, EventCounts.zeros(), fc, fv, fn, sf, sn,
                segbuf, z, z, rbuf, cs_s, cs_a, geom, jnp.uint32(tt),
                1.0 / cfg.nparticles, 16, k_pieces=8, tile=TILE,
                pair_cap=1 << 30, x_off=xo, y_off=yo,
                use_ring_walker=True, ntx=ntx, nty=nty)
            done, _sb, _sp, live, _npend = (
                int(v) for v in np.asarray(ctrl))
            pieces += done
            if not live:
                break
        tally, fc, fv, fn = drain_rings(tally, fc, fv, fn)
        _ = float(tally[0])
        dt_s = time.perf_counter() - t0
        times.append(dt_s)
        print(f"step {tt}: {dt_s:.2f}s", flush=True)
    use1, peak1 = hbm_stats()
    warm = times[1:]
    out = {
        "metric": "v5e16_slice",
        "lanes": n,
        "block": B,
        "ring_slots": 16,
        "alloc_gb": round(alloc_gb, 3),
        "hbm_in_use_gb": round(use1 / 2**30, 3),
        "hbm_peak_gb": round(peak1 / 2**30, 3),
        "warm_step_s": round(float(np.mean(warm)), 3),
        "steps": len(times),
        "kernel_calls_pieces": pieces,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
