"""Unit tests for the pending-flush ring drain (dense + sparse paths)."""

import numpy as np
import jax.numpy as jnp

from neutral_tpu import pallas_sweep as ps


def _reference_drain(tally, rc, rv):
    t = np.asarray(tally, np.float64).copy()
    cells = np.asarray(rc).ravel()
    vals = np.asarray(rv, np.float64).ravel()
    for c, v in zip(cells, vals):
        if c >= 0:
            t[c] += v
    return t


def _make_rings(n, S, rng, deep_lanes, deep_depth):
    """Rings where every lane has 1 entry and a few lanes go deep."""
    rc = np.full((S, n), -1, np.int32)
    rv = np.zeros((S, n), np.float32)
    rn = np.zeros(n, np.int32)
    rc[0] = rng.integers(0, 1000, n)
    rv[0] = rng.random(n, dtype=np.float32)
    rn[:] = 1
    idx = rng.choice(n, size=deep_lanes, replace=False)
    for s in range(1, deep_depth):
        rc[s, idx] = rng.integers(0, 1000, deep_lanes)
        rv[s, idx] = rng.random(deep_lanes, dtype=np.float32)
    rn[idx] = deep_depth
    return rc, rv, rn


def _check(n, S, deep_lanes, deep_depth):
    rng = np.random.default_rng(42)
    rc, rv, rn = _make_rings(n, S, rng, deep_lanes, deep_depth)
    tally = jnp.zeros(1000, jnp.float32)
    out, rc2, rv2, rn2 = ps.drain_rings(
        tally, jnp.asarray(rc), jnp.asarray(rv), jnp.asarray(rn))
    expect = _reference_drain(tally, rc, rv)
    np.testing.assert_allclose(np.asarray(out, np.float64), expect,
                               rtol=2e-5)
    assert int(jnp.max(rn2)) == 0 and int(jnp.max(rc2)) == -1


def test_drain_small_full_width():
    """n below the sparse threshold: full-width row drains."""
    _check(n=4096, S=8, deep_lanes=7, deep_depth=6)


def test_drain_large_sparse_path():
    """n above 4*_SPARSE_CAP with few deep lanes: compacted deep drain."""
    _check(n=4 * ps._SPARSE_CAP + 8192, S=6, deep_lanes=100, deep_depth=5)


def test_drain_large_dense_fallback():
    """More deep lanes than _SPARSE_CAP: falls back to full-width rows."""
    n = 4 * ps._SPARSE_CAP + 8192
    _check(n=n, S=4, deep_lanes=ps._SPARSE_CAP + 1000, deep_depth=4)
