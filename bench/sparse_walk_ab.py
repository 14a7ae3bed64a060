"""A/B the skip-links walker on sparse rings (the ring-direct drain shape).

The ring-direct drain streams S x N plane slots whose occupancy is often
a few percent: every 256-entry chunk has >=1 live entry (so the
occupied-chunks prefetch can't skip it) but the serial scan still pays
256 sentinel iterations per chunk.  Skip-links (raster._skip_links, row
15) hop real entries directly.  This probe measures ms/call for both
paths across occupancy fractions at ring shapes matching the csp deck
(8 planes x n lanes), with short segments so the per-visit term doesn't
drown the scan term.

Usage: python bench/sparse_walk_ab.py [n_lanes] [grid_cells]
"""
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(here)
sys.path.insert(0, here)

import numpy as np


def sparse_ring(n, s_slots, frac, ncells, rng):
    """All planes occupied at `frac`, positions uniform (worst case for
    the occupied-chunks skip: every chunk has a live entry)."""
    import jax.numpy as jnp
    fields = []
    m = s_slots * n
    kk = (rng.uniform(size=m) < frac).astype(np.float32) * 1e-6
    lim = ncells - 2.0
    x0 = rng.uniform(1.0, lim - 3.0, m).astype(np.float32)
    y0 = rng.uniform(1.0, lim - 3.0, m).astype(np.float32)
    for base in (x0, y0, x0 + 1.5, y0 + 1.5, kk):
        fields.append(jnp.asarray(base.reshape(s_slots, n)))
    return tuple(fields), jnp.zeros((n,), jnp.int32), int(kk.sum() / 1e-6)


def main(n=1 << 20, ncells=1024):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from functools import partial
    from neutral_tpu.raster import (TILE, grid_shape,
                                    rasterize_walk_rings_impl)

    nty, ntx = grid_shape(ncells, ncells, TILE)
    rng = np.random.default_rng(0)
    S = 8
    R = 8
    print(f"grid {ncells}^2 -> {nty}x{ntx} tiles; rings {S}x{n} "
          f"({S * n / 1e6:.1f}M slots)", flush=True)

    # Unrolled (NOT lax.fori_loop: a fori-wrapped walker takes >7 min
    # to Mosaic-compile vs ~10 s for the plain call chain).
    @partial(jax.jit, static_argnames=("reps", "skip"),
             donate_argnums=(0,))
    def many(buf, fields, sn, *, reps, skip):
        for _ in range(reps):
            buf, _ = rasterize_walk_rings_impl(buf, fields, sn, ntx=ntx,
                                               nty=nty,
                                               kk_authoritative=True,
                                               compact=skip)
        return buf

    def timed(fields, sn, reps, skip):
        best = None
        for _ in range(3):
            buf = jnp.zeros((nty * TILE, ntx * TILE), jnp.float32)
            t0 = time.perf_counter()
            buf = many(buf, fields, sn, reps=reps, skip=skip)
            np.asarray(buf.reshape(-1)[:1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    for frac in (0.005, 0.02, 0.1, 0.5, 1.0):
        fields, sn, nseg = sparse_ring(n, S, frac, ncells, rng)
        row = f"occ={frac:5.3f} ({nseg:>8d} segs):"
        for skip in (False, True):
            t1 = timed(fields, sn, R, skip)
            t2 = timed(fields, sn, 2 * R, skip)
            dt = (t2 - t1) / R
            row += f"  {'skip' if skip else 'scan'}={dt * 1e3:8.2f} ms"
        print(row, flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
