"""VMEM-resident cross-section table lookup for the Mosaic kernels.

The reference handles *arbitrary* cross-section tables with a per-particle
binary search + linear interpolation (omp3/neutral.c:498-517).  The XLA
engines replicate that with `searchsorted` gathers, but TPU has no hardware
vector gather — XLA serializes them at ~2e8/s, so table decks used to drop
off the fused Mosaic engines entirely (they demanded the closed-form
`analytic` tables).  This module gives the Mosaic kernels an exact,
general table path:

* The (n,) key/value arrays are laid out as (R, 128) VMEM tiles (`k0`),
  plus shifted copies (`k1` = keys[i+1]) and the matching value tiles, so
  one interpolation needs only *within-row* fetches.
* Per lookup, each lane's bracketing row is resolved by comparing its
  energy against scalar row-first keys (no gather), and the column by a
  7-step bisection inside the broadcast row via `tpu.dynamic_gather`
  (`jnp.take_along_axis` along lanes) — the only per-lane gather Mosaic
  has, and it reaches exactly the 128 lanes of a row.
* The row loop runs only over the *live energy band* [rlo, rhi]: elastic
  scatter is energy-non-increasing (e' = e*(A^2+2*A*mu+1)/(A+1)^2 with
  mu in (-1,1), so e' <= e — omp3/neutral.c:264-270) and absorption leaves
  energy unchanged, so a band computed from the live min/max energies with
  a k-event decay margin provably covers every lookup the kernel can make.
  The caller recomputes the band between kernel calls (energy_band) — two
  cheap XLA reductions — and passes it in as SMEM scalars.

Results are bitwise-identical to the XLA path's bracketing (both compute
max{i: keys[i] <= E} clipped to [0, n-2], then the same interpolation
expression); end-to-end parity is pinned in tests/test_pallas_table.py.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .constants import MASS_NO

_LANES = 128

# Worst-case single-scatter energy multiplier ((A-1)/(A+1))^2 — the
# elastic-kinematics floor (omp3/neutral.c:264-270 with mu_cm = -1).
_MIN_SCATTER_FRAC = ((MASS_NO - 1.0) / (MASS_NO + 1.0)) ** 2


class TableLayout(NamedTuple):
    """Mosaic-friendly layout of one cross-section table.

    All tiles are (R, 128) in the state dtype; `keys` keeps the original
    (n,) sorted array for the caller-side band search.  Flat index
    i = r*128 + j maps to tile [r, j]:

      k0[i] = keys[i]   (i <= n-2; k0[i >= n-1] = +inf so the bisection
                         can never select the last entry — the reference
                         clips its index to n-2, omp3/neutral.c:505-511)
      k1[i] = keys[i+1], v0[i] = values[i], v1[i] = values[i+1]

    k0 carries one extra all-inf row so the row loop can read row r+1's
    first key unconditionally.
    """
    k0: jnp.ndarray
    k1: jnp.ndarray
    v0: jnp.ndarray
    v1: jnp.ndarray
    keys: jnp.ndarray

    @property
    def nrows(self) -> int:
        return self.k1.shape[0]        # k0 has one extra sentinel row


def build_layout(keys, values, dtype=jnp.float32) -> TableLayout:
    """Host-side layout build (numpy; runs once per table)."""
    keys = np.asarray(keys, np.float64)
    values = np.asarray(values, np.float64)
    n = keys.shape[0]
    if n < 2:
        raise ValueError("cross-section table needs >= 2 entries")
    nrows = max((n + _LANES - 1) // _LANES, 1)
    pad = nrows * _LANES

    k0 = np.full(pad + _LANES, np.inf, np.float64)   # +1 sentinel row
    k0[: n - 1] = keys[: n - 1]          # entry n-1 stays +inf (clip)
    k1 = np.full(pad, keys[n - 1], np.float64)
    k1[: n - 1] = keys[1:n]
    v0 = np.full(pad, values[n - 2], np.float64)
    v0[: n - 1] = values[: n - 1]
    v1 = np.full(pad, values[n - 1], np.float64)
    v1[: n - 1] = values[1:n]

    as_tile = lambda a: jnp.asarray(a.reshape(-1, _LANES), dtype)
    return TableLayout(as_tile(k0), as_tile(k1), as_tile(v0), as_tile(v1),
                       jnp.asarray(keys, dtype))


def energy_band(energy, working, keys, k_events: int):
    """(rlo, rhi) row band covering every lookup of the next k_events.

    `working` masks the lanes that can do physics this call; the floor
    applies the worst-case k-event scatter decay (plus float slack) so
    in-kernel post-collision re-lookups stay in band.  Returns int32
    scalars; an all-dead batch yields an empty/clamped band (the kernel's
    any-work early-out never reads it).
    """
    n = keys.shape[0]
    inf = jnp.asarray(jnp.inf, energy.dtype)
    e_min = jnp.min(jnp.where(working, energy, inf))
    e_max = jnp.max(jnp.where(working, energy, -inf))
    margin = (_MIN_SCATTER_FRAC ** k_events) * 0.98
    e_lo = e_min * jnp.asarray(margin, energy.dtype)
    ilo = jnp.clip(jnp.searchsorted(keys, e_lo, side="right") - 1, 0, n - 2)
    ihi = jnp.clip(jnp.searchsorted(keys, e_max, side="right") - 1, 0, n - 2)
    return ((ilo // _LANES).astype(jnp.int32),
            (ihi // _LANES).astype(jnp.int32))


class BandedTable(NamedTuple):
    """Duck-types CrossSection.lookup inside a Mosaic kernel.

    Fields hold the layout *refs* (VMEM) plus the band scalars; sweep_core
    and collision_physics only ever call `.lookup(energy)`.
    """
    k0: object
    k1: object
    v0: object
    v1: object
    rlo: object
    rhi: object

    def lookup(self, energy):
        return lookup_banded(energy, self.k0, self.k1, self.v0, self.v1,
                             self.rlo, self.rhi)


def _row(ref, r, shape):
    """Broadcast table row r (dynamic) across the lane-block shape."""
    import jax.experimental.pallas as pl
    return jnp.broadcast_to(ref[pl.ds(r, 1), :], shape)


def _first(ref, r):
    """Scalar first key of row r (dynamic row index)."""
    import jax.experimental.pallas as pl
    return ref[pl.ds(r, 1), pl.ds(0, 1)][0, 0]


def lookup_banded(E, k0_ref, k1_ref, v0_ref, v1_ref, rlo, rhi):
    """Interpolated table value at E for every lane (exact semantics).

    Row resolution: lane belongs to row r iff k0[r,0] <= E < k0[r+1,0]
    (clamped at the band edges, matching the reference's index clip).
    Column: max j with row[j] <= E via 7-step bisection on the broadcast
    row — each step one lane-gather.  Rows with no in-band lane are
    skipped (occupancy guard).  Out-of-band lanes return 0; callers mask
    them (sweep_core's `live`), exactly like the analytic path's
    garbage-in-masked-lanes behavior.
    """
    shape = E.shape

    def body(r, val):
        first = _first(k0_ref, r)
        nxt = _first(k0_ref, r + 1)     # k0 has a trailing +inf row
        in_row = (((E >= first) | (r == rlo))
                  & ((E < nxt) | (r == rhi)))

        def hit(v):
            row_k0 = _row(k0_ref, r, shape)
            col = jnp.zeros(shape, jnp.int32)
            for b in (64, 32, 16, 8, 4, 2, 1):
                cand = col + b
                kc = jnp.take_along_axis(row_k0, cand, axis=1)
                col = jnp.where(E >= kc, cand, col)
            kc0 = jnp.take_along_axis(row_k0, col, axis=1)
            kc1 = jnp.take_along_axis(_row(k1_ref, r, shape), col, axis=1)
            vc0 = jnp.take_along_axis(_row(v0_ref, r, shape), col, axis=1)
            vc1 = jnp.take_along_axis(_row(v1_ref, r, shape), col, axis=1)
            interp = vc0 + ((E - kc0) / (kc1 - kc0)) * (vc1 - vc0)
            return jnp.where(in_row, interp, v)

        return lax.cond(jnp.any(in_row), hit, lambda v: v, val)

    return lax.fori_loop(rlo, rhi + 1, body, jnp.zeros_like(E))
