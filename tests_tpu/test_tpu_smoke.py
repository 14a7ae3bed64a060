"""Real-chip Mosaic-kernel smoke tests: each production kernel vs its
XLA twin, on shrunken decks (minutes, not the 25-min CPU battery).

Interpret-mode parity (tests/) has historically not implied Mosaic
hardware correctness — these run the ACTUAL compiled kernels.  Event
counts between engines are integer physics decisions; on HARDWARE the
Mosaic and XLA compilations fuse FMAs differently, so near-tie
comparisons (d_coll vs d_exit etc.) can flip on a handful of lanes —
measured deltas are <= 3e-6 relative (e.g. 45 of 15.2M collisions on
the dense deck).  Counts therefore pin to rtol 1e-4 here (exactness is
pinned by the CPU interpret battery, where roundings coincide); a real
kernel regression shows up orders of magnitude above that.  Tallies
compare to accumulation-order rounding.  Reference contract being
smoked: omp3/neutral.c:303-495 physics + main.c:118-125 counters.
"""

import numpy as np
import pytest


def _mk_cfg(**kw):
    from neutral_tpu.config import ProblemRegion, SimConfig, SourceBox
    base = dict(nx=256, ny=256, width=10.0, height=10.0, dt=1e-6, niters=1,
                nparticles=16384, initial_energy=1.0e4,
                source=SourceBox(0.2, 0.2, 0.6, 0.6),
                problems=(ProblemRegion(1.0e2, 0.0, 0.0, 1.0, 1.0),),
                dtype="float32", tally_dtype="float32")
    base.update(kw)
    return SimConfig(**base)


def _run(cfg):
    from neutral_tpu.driver import Simulation
    sim = Simulation(cfg, quiet=True)
    nf = nc = 0
    for tt in range(1, cfg.niters + 1):
        m = sim.step(tt)
        nf += m.nfacets
        nc += m.ncollisions
    return np.asarray(sim.tally, np.float64), nf, nc


def _compare(cfg_fast, engine):
    """Run `engine` vs the XLA sweep on the same deck; pin agreement.

    A flipped near-tie decision re-routes that PARTICLE's whole
    remaining history: its deposits land in different cells (one-
    particle-magnitude deltas along two tracks) and its event counts
    shift by a few.  So: event-count deltas bounded by a fraction of
    TOTAL events (decision count), global tally sum tight, and per-cell
    agreement for all but a handful of track cells.
    """
    t_x, nf_x, nc_x = _run(cfg_fast.with_(engine="xla"))
    t_k, nf_k, nc_k = _run(cfg_fast.with_(engine=engine))
    budget = max(1e-5 * (nf_x + nc_x), 2)
    assert (abs(nf_k - nf_x) <= budget
            and abs(nc_k - nc_x) <= budget), (
        f"{engine}: counts ({nf_k}, {nc_k}) != xla ({nf_x}, {nc_x})")
    np.testing.assert_allclose(t_k.sum(), t_x.sum(), rtol=1e-5)
    viol = np.abs(t_k - t_x) > 5e-4 * np.abs(t_x) + 1e-7
    assert viol.mean() < 5e-3, (
        f"{engine}: {viol.sum()} / {viol.size} cells off "
        f"(max rel {np.nanmax(np.abs(t_k - t_x) / np.abs(t_x)):.2e})")
    assert np.abs(t_k - t_x).sum() <= 1e-4 * np.abs(t_x).sum()


@pytest.mark.parametrize("rng", ["threefry", "pcg64si"])
def test_ring_engine_vs_xla(rng):
    """Fused Mosaic ring kernel (pallas_sweep) on a dense uniform deck
    (collision-dominated — the scatter regime)."""
    _compare(_mk_cfg(rng=rng), "pallas")


def test_flight_engine_mixed_deck_vs_xla():
    """Fused Mosaic flight kernel + in-loop ring-direct walker on a
    vacuum+dense-block deck (the csp regime)."""
    from neutral_tpu.config import ProblemRegion
    cfg = _mk_cfg(dt=2e-6, initial_energy=1.0e4,
                  problems=(ProblemRegion(0.0, 0.0, 0.0, 1.0, 1.0),
                            ProblemRegion(1.0e3, 0.4, 0.4, 0.2, 0.2)))
    _compare(cfg, "flight")


def test_flight_engine_streaming_deck_vs_xla():
    """Flight engine on a near-vacuum deck (the stream regime: long
    pieces, rasterizer-dominated)."""
    from neutral_tpu.config import ProblemRegion
    cfg = _mk_cfg(dt=5e-7, initial_energy=1.0e6,
                  problems=(ProblemRegion(1.0e-2, 0.0, 0.0, 1.0, 1.0),))
    _compare(cfg, "flight")


def test_walker_raster_vs_xla_dda():
    """VMEM-resident segment walker kernel vs the XLA DDA rasterizer on
    random segments (including axis-degenerate ones)."""
    import jax.numpy as jnp
    from neutral_tpu.raster import (TILE, grid_shape, rasterize_walk,
                                    rasterize_xla)

    nx = ny = 384
    nty, ntx = grid_shape(nx, ny, TILE)
    r = np.random.default_rng(11)
    nseg = 3000
    segs = np.zeros((4096, 8), np.float32)
    segs[:nseg, 0] = r.uniform(0, nx, nseg)
    segs[:nseg, 1] = r.uniform(0, ny, nseg)
    segs[:nseg, 2] = r.uniform(0, nx, nseg)
    segs[:nseg, 3] = r.uniform(0, ny, nseg)
    # a block of axis-parallel segments (the degenerate fast paths)
    segs[:300, 2] = segs[:300, 0]
    segs[300:600, 3] = segs[300:600, 1]
    segs[:nseg, 4] = r.uniform(0.1, 2.0, nseg)

    buf = jnp.zeros((nty * TILE, ntx * TILE), jnp.float32)
    out_w = np.asarray(rasterize_walk(buf, jnp.asarray(segs),
                                      jnp.int32(nseg), tile=TILE,
                                      ntx=ntx, nty=nty))[:ny, :nx]
    flat = rasterize_xla(jnp.zeros(nx * ny, jnp.float32),
                         jnp.asarray(segs), jnp.int32(nseg), nx=nx, ny=ny,
                         max_steps=nx + ny + 2)
    out_x = np.asarray(flat).reshape(ny, nx)
    np.testing.assert_allclose(out_w.sum(), out_x.sum(), rtol=1e-5)
    np.testing.assert_allclose(out_w, out_x, rtol=2e-3, atol=1e-4)


def test_sorted_pair_raster_vs_xla_dda():
    """Sorted-pair Mosaic rasterizer (raster_drain — the big-mesh
    fallback) vs the XLA DDA."""
    import jax.numpy as jnp
    from neutral_tpu.raster import (TILE, grid_shape, raster_drain,
                                    rasterize_xla)

    nx = ny = 384
    nty, ntx = grid_shape(nx, ny, TILE)
    r = np.random.default_rng(13)
    nseg = 2000
    segs = np.zeros((2048, 8), np.float32)
    segs[:nseg, 0] = r.uniform(0, nx, nseg)
    segs[:nseg, 1] = r.uniform(0, ny, nseg)
    segs[:nseg, 2] = r.uniform(0, nx, nseg)
    segs[:nseg, 3] = r.uniform(0, ny, nseg)
    segs[:nseg, 4] = r.uniform(0.1, 2.0, nseg)

    buf = jnp.zeros((nty * TILE, ntx * TILE), jnp.float32)
    out_p = np.asarray(raster_drain(buf, jnp.asarray(segs),
                                    jnp.int32(nseg), tile=TILE, ntx=ntx,
                                    nty=nty, pair_cap=1 << 20))[:ny, :nx]
    flat = rasterize_xla(jnp.zeros(nx * ny, jnp.float32),
                         jnp.asarray(segs), jnp.int32(nseg), nx=nx, ny=ny,
                         max_steps=nx + ny + 2)
    out_x = np.asarray(flat).reshape(ny, nx)
    np.testing.assert_allclose(out_p.sum(), out_x.sum(), rtol=1e-5)
    np.testing.assert_allclose(out_p, out_x, rtol=2e-3, atol=1e-4)


def test_ring_engine_table_mode_vs_xla(tmp_path):
    """General (non-quartic) cs tables through the banded VMEM lookup
    (pallas_table.py) on the real chip — the reference's arbitrary-table
    capability (omp3/neutral.c:498-517) on the Mosaic ring engine."""
    from neutral_tpu.xs import write_cs_file

    rng = np.random.default_rng(17)
    n = 4097
    keys = np.logspace(-2, 8, n)
    keys = np.sort(keys * (1.0 + 0.05 * rng.random(n) / n))
    u = np.linspace(0.0, 1.0, n)
    values = 1.0 + 1e3 * (1.0 - u) * (1.0 + 0.2 * np.sin(37 * u))
    write_cs_file(str(tmp_path / "elastic_scatter.cs"), keys, values)
    write_cs_file(str(tmp_path / "capture.cs"), keys, values)

    cfg = _mk_cfg(params_path=str(tmp_path / "deck.params"))
    from neutral_tpu.driver import Simulation
    sim = Simulation(cfg.with_(engine="pallas"), quiet=True)
    assert sim.scatter_layout is not None, "table mode not engaged"
    _compare(cfg, "pallas")


def test_banded_walker_vs_whole_buffer():
    """Row-band tiled walker on the real chip == whole-buffer walker
    (the VMEM-cap remover: raster._walk_banded band clipping)."""
    import jax.numpy as jnp
    from neutral_tpu.raster import TILE, grid_shape, rasterize_walk

    nx = ny = 512
    nty, ntx = grid_shape(nx, ny, TILE)
    r = np.random.default_rng(29)
    nseg = 2048
    segs = np.zeros((2048, 8), np.float32)
    segs[:nseg, 0] = r.uniform(0, nx, nseg)
    segs[:nseg, 1] = r.uniform(0, ny, nseg)
    segs[:nseg, 2] = r.uniform(0, nx, nseg)
    segs[:nseg, 3] = r.uniform(0, ny, nseg)
    segs[:300, 2] = segs[:300, 0]          # vertical
    segs[300:600, 3] = segs[300:600, 1]    # horizontal
    segs[:nseg, 4] = r.uniform(0.1, 2.0, nseg)

    buf = jnp.zeros((nty * TILE, ntx * TILE), jnp.float32)
    whole = np.asarray(rasterize_walk(buf, jnp.asarray(segs),
                                      jnp.int32(nseg), tile=TILE,
                                      ntx=ntx, nty=nty))
    buf = jnp.zeros((nty * TILE, ntx * TILE), jnp.float32)
    banded = np.asarray(rasterize_walk(buf, jnp.asarray(segs),
                                       jnp.int32(nseg), tile=TILE,
                                       ntx=ntx, nty=nty, band_nty=1))
    np.testing.assert_allclose(banded.sum(), whole.sum(), rtol=1e-6)
    np.testing.assert_allclose(banded, whole, rtol=2e-3, atol=1e-4)
