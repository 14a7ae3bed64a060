"""Microbenchmark the VMEM-resident segment walker on the real chip.

Pins the three cost terms of raster._walk_kernel so the flight-deck
roofline (BASELINE.md) is a measurement, not a hypothesis:

  * per-CALL fixed cost — the 67 MB acc buffer HBM->VMEM->HBM round
    trip + the (8, S*N) plane stack + chunk-occupancy pass (scenario
    "empty": rings with every kk == 0);
  * per-SEGMENT scalar setup — short segments (1 tile visit) isolate
    setup + one visit;
  * per-VISIT cost — long segments at several angles (visits scale with
    tile crossings; the slope mix shows whether the full 128x128 tile
    update or the DMA dominates).

Usage: python bench/walker_probe.py [n_lanes ...]
"""
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(here)
sys.path.insert(0, here)

import numpy as np


def ring_of(n, s_slots, frac, angle_deg, length_cells, ncells, rng):
    """Piece-plane ring: plane 0 holds `frac*n` segments, rest kk=0."""
    import jax.numpy as jnp
    nseg = int(n * frac)
    th = np.deg2rad(angle_deg)
    dx, dy = np.cos(th), np.sin(th)
    lim = ncells - 2.0
    x0 = rng.uniform(1.0, max(lim - length_cells * abs(dx), 2.0), n)
    y0 = rng.uniform(1.0, max(lim - length_cells * abs(dy), 2.0), n)
    x1 = np.clip(x0 + length_cells * dx, 0, lim)
    y1 = np.clip(y0 + length_cells * dy, 0, lim)
    kk = np.zeros(n, np.float32)
    kk[:nseg] = 1e-6
    fields = []
    for base in (x0, y0, x1, y1, kk):
        pl = np.zeros((s_slots, n), np.float32)
        pl[0] = base
        fields.append(jnp.asarray(pl))
    return tuple(fields), jnp.zeros((n,), jnp.int32), nseg


def run(widths):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from functools import partial
    from neutral_tpu.raster import (TILE, grid_shape,
                                    rasterize_walk_rings_impl)

    NCELLS = 4000
    nty, ntx = grid_shape(NCELLS, NCELLS, TILE)
    rng = np.random.default_rng(0)
    print(f"grid {NCELLS}^2 cells -> {nty}x{ntx} tiles of {TILE} "
          f"(acc buffer {nty * ntx * TILE * TILE * 4 / 1e6:.0f} MB)")

    # R walker calls chained INSIDE one jit: a single host dispatch+sync
    # (~30 ms through the axon tunnel) amortizes over R device-side
    # calls, so the diff between R and 2R isolates device cost per call.
    @partial(jax.jit, static_argnames=("reps",), donate_argnums=(0,))
    def many(buf, fields, sn, *, reps):
        def body(i, b):
            b, _ = rasterize_walk_rings_impl(b, fields, sn, ntx=ntx,
                                             nty=nty,
                                             kk_authoritative=True)
            return b
        return lax.fori_loop(0, reps, body, buf)

    def timed(fields, sn, reps):
        best = None
        for r in range(3):
            buf = jnp.zeros((nty * TILE, ntx * TILE), jnp.float32)
            t0 = time.perf_counter()
            buf = many(buf, fields, sn, reps=reps)
            np.asarray(buf.reshape(-1)[:1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    scenarios = [
        # (label, frac_occupied, angle_deg, length_cells)
        ("empty (fixed cost)", 0.0, 45.0, 100),
        ("short 2-cell diag", 1.0, 45.0, 2),
        ("long 550 horizontal", 1.0, 0.5, 550),
        ("long 550 diag45", 1.0, 45.0, 550),
        ("long 550 steep85", 1.0, 85.0, 550),
        ("long 1600 diag45", 1.0, 45.0, 1600),
    ]
    R = 8
    for n in widths:
        s_slots = 8
        print(f"\n== {n} lanes x {s_slots} planes "
              f"(device cost per call: (t2R - tR) / {R}) ==")
        for (label, frac, ang, ln) in scenarios:
            fields, sn, nseg = ring_of(n, s_slots, frac, ang, ln,
                                       NCELLS, rng)
            th = np.deg2rad(ang)
            visits = 1 + ln * (abs(np.cos(th)) + abs(np.sin(th))) / TILE
            t1 = timed(fields, sn, R)
            t2 = timed(fields, sn, 2 * R)
            dt = (t2 - t1) / R
            per_seg = dt / max(nseg, 1) * 1e9
            per_vis = per_seg / visits
            print(f"  {label:24s} {dt * 1e3:8.2f} ms/call"
                  + ("" if not nseg else
                     f"  {per_seg:8.1f} ns/seg  ~{visits:5.1f} vis/seg"
                     f"  {per_vis:6.1f} ns/visit"))


if __name__ == "__main__":
    widths = [int(a) for a in sys.argv[1:]] or [65536, 1048576]
    run(widths)
