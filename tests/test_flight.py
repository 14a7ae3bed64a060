"""Free-flight engine + segment rasterizer correctness.

The flight engine (neutral_tpu/flight.py) must reproduce the facet-stepping
engine's physics: identical RNG streams (draws only at collisions), equal
event counts, and tallies equal to accumulation-order rounding in float64.
The rasterizer stack is pinned bottom-up: numpy per-cell-overlap oracle ->
XLA DDA fallback -> pair expansion -> Mosaic kernel (interpret mode).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neutral_tpu import SimConfig, SourceBox, ProblemRegion
from neutral_tpu.driver import Simulation
from neutral_tpu.flight import disjoint_rects, u64_sum_u32
from neutral_tpu.mesh import build_density, region_cell_bounds
from neutral_tpu import raster


# ---------------------------------------------------------------------------
# disjoint rect decomposition
# ---------------------------------------------------------------------------

def _density_from_rects(rects, nx, ny):
    out = np.zeros((ny, nx))
    seen = np.zeros((ny, nx), int)
    for (ix0, ix1, iy0, iy1, d) in rects:
        out[iy0:iy1, ix0:ix1] = d
        seen[iy0:iy1, ix0:ix1] += 1
    return out, seen


def test_disjoint_rects_cover_exactly():
    rng = np.random.default_rng(7)
    for _ in range(20):
        nx, ny = rng.integers(4, 40, 2)
        nreg = rng.integers(1, 5)
        regions = []
        for _ in range(nreg):
            x0, x1 = sorted(rng.integers(0, nx + 1, 2))
            y0, y1 = sorted(rng.integers(0, ny + 1, 2))
            regions.append((int(x0), int(max(x1, x0 + 1)), int(y0),
                            int(max(y1, y0 + 1)), float(rng.uniform(1, 9))))
        rects = disjoint_rects(tuple(regions), int(nx), int(ny))
        got, seen = _density_from_rects(rects, nx, ny)
        assert (seen == 1).all(), "rects must partition the domain"
        want = np.zeros((ny, nx))
        for (ix0, ix1, iy0, iy1, d) in regions:
            want[iy0:iy1, ix0:ix1] = d
        np.testing.assert_array_equal(got, want)


def test_disjoint_rects_match_build_density():
    cfg = SimConfig(nx=64, ny=48, width=1.0, height=1.0,
                    problems=(ProblemRegion(1.0e-30, 0, 0, 1, 1),
                              ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2)))
    rects = disjoint_rects(region_cell_bounds(cfg), cfg.nx, cfg.ny)
    got, seen = _density_from_rects(rects, cfg.nx, cfg.ny)
    assert (seen == 1).all()
    np.testing.assert_array_equal(got, build_density(cfg))


def test_u64_sum_u32():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1 << 16, 100_001).astype(np.uint32)
    hi, lo = u64_sum_u32(jnp.asarray(v))
    total = int(hi) * (1 << 32) + int(lo)
    assert total == int(v.astype(np.uint64).sum())


# ---------------------------------------------------------------------------
# rasterizer stack
# ---------------------------------------------------------------------------

def _random_segs(rng, n, nx, ny, boundary_aligned=True):
    """Random segments in cell units; optionally on integer boundaries
    (the flight engine emits boundary-to-boundary interiors)."""
    x0 = rng.uniform(0, nx, n)
    y0 = rng.uniform(0, ny, n)
    x1 = rng.uniform(0, nx, n)
    y1 = rng.uniform(0, ny, n)
    if boundary_aligned:
        x0, y0 = np.floor(x0), np.round(y0, 3)
    kk = rng.uniform(0.5, 2.0, n)
    segs = np.zeros((n, 8), np.float64)
    segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3], segs[:, 4] = (
        x0, y0, x1, y1, kk)
    return segs


def test_rasterize_xla_matches_ref():
    rng = np.random.default_rng(11)
    nx, ny = 56, 40
    segs = _random_segs(rng, 37, nx, ny)
    flat = raster.rasterize_xla(jnp.zeros(nx * ny, jnp.float64),
                                jnp.asarray(segs), jnp.int32(segs.shape[0]),
                                nx=nx, ny=ny, max_steps=nx + ny + 2)
    want = raster.rasterize_ref(np.zeros((ny, nx)), segs[:, :5])
    np.testing.assert_allclose(np.asarray(flat).reshape(ny, nx), want,
                               rtol=1e-12, atol=1e-13)
    # conservation: every segment deposits exactly kk (fully inside grid)
    np.testing.assert_allclose(float(flat.sum()), segs[:, 4].sum(),
                               rtol=1e-12)


def test_rasterize_xla_respects_nseg():
    rng = np.random.default_rng(2)
    nx = ny = 16
    segs = _random_segs(rng, 10, nx, ny)
    flat = raster.rasterize_xla(jnp.zeros(nx * ny, jnp.float64),
                                jnp.asarray(segs), jnp.int32(4),
                                nx=nx, ny=ny, max_steps=nx + ny + 2)
    want = raster.rasterize_ref(np.zeros((ny, nx)), segs[:4, :5])
    np.testing.assert_allclose(np.asarray(flat).reshape(ny, nx), want,
                               rtol=1e-12, atol=1e-13)


def test_expand_pairs_visit_all_crossed_tiles():
    rng = np.random.default_rng(5)
    tile, ntx, nty = 8, 6, 5
    nx, ny = tile * ntx, tile * nty
    segs = _random_segs(rng, 25, nx, ny, boundary_aligned=False)
    scap, pcap = 32, 1024
    buf = np.zeros((scap, 8), np.float32)
    buf[:25] = segs.astype(np.float32)
    key, seg_idx, offsets = raster.expand_pairs(
        jnp.asarray(buf), jnp.int32(25), tile=tile, ntx=ntx, nty=nty,
        pair_cap=pcap)
    key = np.asarray(key)
    seg_idx = np.asarray(seg_idx)
    offsets = np.asarray(offsets)
    # per-tile ranges must be consistent
    assert offsets[0] == 0
    assert (np.diff(offsets) >= 0).all()
    got = {}
    for t in range(ntx * nty):
        for p in range(offsets[t], offsets[t + 1]):
            assert key[p] == t
            got.setdefault(int(seg_idx[p]), set()).add(t)
    # oracle: dense supersampling of each segment
    for s in range(25):
        x0, y0, x1, y1 = buf[s, :4].astype(np.float64)
        ts = np.linspace(0, 1, 20001)
        tx = np.clip((x0 + ts * (x1 - x0)) / tile, 0, ntx - 1e-9).astype(int)
        ty = np.clip((y0 + ts * (y1 - y0)) / tile, 0, nty - 1e-9).astype(int)
        want = set(map(int, ty * ntx + tx))
        have = got.get(s, set())
        # expansion must visit every supersampled tile; it may add tiles
        # only at corner grazings (measure-zero contributions)
        assert want <= have, f"segment {s}: missing {want - have}"
        assert len(have - want) <= 2


def test_raster_drain_interpret_matches_ref():
    rng = np.random.default_rng(13)
    tile, ntx, nty = 8, 4, 3
    nx, ny = tile * ntx, tile * nty
    n = 23
    segs = _random_segs(rng, n, nx, ny).astype(np.float32)
    scap, pcap = 32, 2048
    buf = np.zeros((scap, 8), np.float32)
    buf[:n] = segs
    out = raster.raster_drain(jnp.zeros((ny, nx), jnp.float32),
                              jnp.asarray(buf), jnp.int32(n), tile=tile,
                              ntx=ntx, nty=nty, pair_cap=pcap,
                              interpret=True)
    want = raster.rasterize_ref(np.zeros((ny, nx)),
                                segs[:, :5].astype(np.float64))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=1e-5)


def test_rasterize_walk_interpret_matches_ref():
    """VMEM-resident segment walker == per-cell overlap oracle,
    including garbage rows past nseg and axis-parallel/degenerate
    segments."""
    rng = np.random.default_rng(13)
    tile, ntx, nty = 8, 4, 3
    nx, ny = tile * ntx, tile * nty
    n = 23
    segs = np.zeros((32, 8), np.float32)
    segs[:n] = _random_segs(rng, n, nx, ny).astype(np.float32)
    segs[n:] = rng.uniform(0, nx, (32 - n, 8))  # must be ignored
    out = raster.rasterize_walk(jnp.zeros((ny, nx), jnp.float32),
                                jnp.asarray(segs), jnp.int32(n),
                                tile=tile, ntx=ntx, nty=nty,
                                interpret=True)
    want = raster.rasterize_ref(np.zeros((ny, nx)),
                                segs[:n, :5].astype(np.float64))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=1e-5)

    edge = np.zeros((8, 8), np.float32)
    edge[0] = [2.0, 3.0, 29.0, 3.0, 1.0, 0, 0, 0]    # horizontal
    edge[1] = [5.0, 0.5, 5.0, 23.5, 2.0, 0, 0, 0]    # vertical
    edge[2] = [4.0, 4.0, 4.0, 4.0, 3.0, 0, 0, 0]     # zero-length
    edge[3] = [0.0, 0.0, 32.0, 24.0, 1.5, 0, 0, 0]   # full diagonal
    # endpoints EXACTLY on tile boundaries (flight pieces end on rect
    # walls): rounding must not walk the DDA past the clipped end tile
    edge[4] = [8.0, 8.0, 24.0, 16.0, 1.0, 0, 0, 0]
    edge[5] = [16.0, 0.0, 16.0, 24.0, 1.0, 0, 0, 0]
    edge[6] = [0.0, 8.0, 32.0, 8.0, 1.0, 0, 0, 0]
    out2 = raster.rasterize_walk(jnp.zeros((ny, nx), jnp.float32),
                                 jnp.asarray(edge), jnp.int32(7),
                                 tile=tile, ntx=ntx, nty=nty,
                                 interpret=True)
    want2 = raster.rasterize_ref(np.zeros((ny, nx)),
                                 edge[:7, :5].astype(np.float64))
    np.testing.assert_allclose(np.asarray(out2), want2, rtol=2e-4,
                               atol=1e-5)


def test_dense_links_and_counts_properties():
    """The walker's dense-index row and occupancy-count blocks: per
    256-chunk, row 15 leads with the ascending indices of live entries
    and the counts block matches, across occupancy extremes (empty,
    singleton, full, random)."""
    C = raster._CHUNK
    rng = np.random.default_rng(3)
    nc = 7
    kk = (rng.uniform(size=nc * C) < 0.07).astype(np.float32)
    kk[:C] = 0.0                       # empty chunk
    kk[C:2 * C] = 0.0
    kk[C + 200] = 1.0                  # singleton
    kk[2 * C:3 * C] = 1.0              # full chunk
    dense = np.asarray(raster._dense_links(jnp.asarray(kk))).reshape(
        nc, C).astype(np.int64)
    occ = np.asarray(raster._occupied_chunks(jnp.asarray(kk), True))
    n_occ, idx_blk, cnt_blk = occ[0], occ[1:1 + nc], occ[1 + nc:]
    live_chunks = [c for c in range(nc) if kk[c * C:(c + 1) * C].any()]
    assert n_occ == len(live_chunks)
    assert list(idx_blk[:n_occ]) == live_chunks
    for pos, c in enumerate(live_chunks):
        want = np.flatnonzero(kk[c * C:(c + 1) * C])
        assert cnt_blk[pos] == len(want)
        np.testing.assert_array_equal(dense[c, :len(want)], want)


def test_rasterize_walk_rings_interpret_matches_ref():
    """Ring-direct walker: (S, N) ring planes deposit like the flat
    batch, stale slots (>= sn) are ignored, rings come back empty."""
    rng = np.random.default_rng(7)
    tile, ntx, nty = 8, 4, 3
    nx, ny = tile * ntx, tile * nty
    S, N = 3, 16
    sf = [rng.uniform(0, nx, (S, N)).astype(np.float32)
          for _ in range(5)]
    sf[1] = rng.uniform(0, ny, (S, N)).astype(np.float32)
    sf[3] = rng.uniform(0, ny, (S, N)).astype(np.float32)
    sf[4] = rng.uniform(0.5, 2.0, (S, N)).astype(np.float32)
    sn = rng.integers(0, S + 1, N).astype(np.int32)
    out, (sf2, sn2) = raster.rasterize_walk_rings(
        jnp.zeros((ny, nx), jnp.float32),
        tuple(jnp.asarray(f) for f in sf), jnp.asarray(sn),
        tile=tile, ntx=ntx, nty=nty, interpret=True)
    segs = []
    for lane in range(N):
        for s in range(sn[lane]):
            segs.append([sf[0][s, lane], sf[1][s, lane], sf[2][s, lane],
                         sf[3][s, lane], sf[4][s, lane]])
    want = raster.rasterize_ref(np.zeros((ny, nx)),
                                np.asarray(segs, np.float64))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4,
                               atol=1e-5)
    assert int(jnp.max(sn2)) == 0

    # All-empty rings: the occupancy list is empty (zero chunks fetched)
    # and the buffer must come back unchanged.
    base = jnp.asarray(np.arange(ny * nx, dtype=np.float32).reshape(ny, nx))
    out0, (_, sn0) = raster.rasterize_walk_rings(
        base + 0.0, tuple(jnp.asarray(f) for f in sf),
        jnp.zeros(N, jnp.int32), tile=tile, ntx=ntx, nty=nty,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(base))
    assert int(jnp.max(sn0)) == 0
    assert float(jnp.max(jnp.abs(sf2[4]))) == 0.0


# ---------------------------------------------------------------------------
# flight engine vs the facet-stepping engine (driver level, f64)
# ---------------------------------------------------------------------------

def make_cfg(kind, n=400, nx=64, iters=2, dtype="float64"):
    if kind == "stream":
        problems = (ProblemRegion(1.0e-30, 0, 0, 1, 1),)
        e0 = 1.0e6
        src = SourceBox(0.45, 0.45, 0.1, 0.1)
    elif kind == "csp":
        problems = (ProblemRegion(1.0e-30, 0, 0, 1, 1),
                    ProblemRegion(1.0e4, 0.4, 0.4, 0.2, 0.2))
        e0 = 1.0e4
        src = SourceBox(0.1, 0.1, 0.2, 0.2)
    elif kind == "split":
        problems = (ProblemRegion(1.0e-30, 0.0, 0.0, 1.0, 0.5),
                    ProblemRegion(1.0e3, 0.0, 0.5, 1.0, 0.5))
        e0 = 2.5e4
        src = SourceBox(0.4, 0.4, 0.2, 0.2)
    elif kind == "scatter":
        problems = (ProblemRegion(1.0e4, 0, 0, 1, 1),)
        e0 = 1.0e3
        src = SourceBox(0.2, 0.2, 0.6, 0.6)
    else:
        raise ValueError(kind)
    return SimConfig(nx=nx, ny=nx, width=1.0, height=1.0, dt=1e-7,
                     niters=iters, nparticles=n, initial_energy=e0,
                     source=src, problems=problems, dtype=dtype,
                     tally_dtype=dtype)


def _run(cfg, engine):
    sim = Simulation(cfg.with_(engine=engine), quiet=True)
    stats = []
    for tt in range(1, cfg.niters + 1):
        m = sim.step(tt)
        stats.append((m.nfacets, m.ncollisions, m.nprocessed))
    return np.asarray(sim.tally, np.float64), stats


@pytest.mark.parametrize("kind", ["stream", "csp", "split", "scatter"])
def test_flight_matches_xla_engine_f64(kind):
    cfg = make_cfg(kind)
    t_x, s_x = _run(cfg, "xla")
    t_f, s_f = _run(cfg, "flight")
    # identical RNG streams => identical event counts per step
    assert s_f == s_x
    np.testing.assert_allclose(t_f.sum(), t_x.sum(), rtol=1e-11)
    np.testing.assert_allclose(t_f, t_x, rtol=1e-7, atol=1e-30)


def test_flight_f32_within_tolerance_of_f64():
    cfg = make_cfg("csp", n=600, iters=3)
    t_x, _ = _run(cfg, "xla")
    t_f, _ = _run(cfg.with_(dtype="float32", tally_dtype="float32"),
                  "flight")
    assert abs(t_f.sum() - t_x.sum()) / abs(t_x.sum()) < 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["stream", "csp"])
def test_step_flight_fused_interpret_matches_xla(kind):
    """Single-device fused flight step (interpret Mosaic kernels, incl.
    the IN-LOOP walker drain) == the XLA flight engine: exact event
    counts, tally to f32 accumulation rounding.  32x32 mesh => the
    walker path (ntx=nty=1) is the one exercised."""
    cfg = make_cfg(kind, n=256, nx=32, iters=1, dtype="float32")
    if kind == "csp":
        # Long census: the absorber kills lanes progressively, so the
        # fused compaction ladder (compact_flight) actually fires
        # (verified: two ladder steps at this dt).
        cfg = cfg.with_(dt=1e-5)
    t_x, s_x = _run(cfg, "flight")          # XLA flight path on CPU

    sim = Simulation(cfg.with_(engine="flight"), quiet=True)
    # Interpret executes Mosaic per-op: keep the call/piece counts tiny
    # (many chunk re-entries still cover the in-loop drain cadence).
    sim.flight_max_calls = 2
    sim.flight_k_pieces = 2
    # Let the death tail trigger the fused compaction ladder
    # (compact_flight) under the driver: csp's absorber kills lanes
    # progressively, so live < cap//2 happens mid-step.
    sim.compact_min = 128
    m = sim._step_flight_fused(1, interpret=True)
    assert (m.nfacets, m.ncollisions, m.nprocessed) == s_x[0]
    t_f = np.asarray(sim.tally, np.float64)
    t_r = t_x.reshape(t_f.shape)
    np.testing.assert_allclose(t_f.sum(), t_x.sum(), rtol=1e-6)
    # Per-cell agreement on SIGNIFICANT cells only: sliver cells at
    # region boundaries hold K * (difference of O(1) f32 distances) —
    # pure cancellation noise, ~1e-9 of the total mass, on which the
    # engines legitimately disagree by 100%+ relative (verified: the
    # pre-fused XLA engines disagree there too).  A real misplacement
    # bug moves significant mass and still trips both checks below.
    big = np.abs(t_r) > 1e-6 * np.abs(t_r).max()
    np.testing.assert_allclose(t_f[big], t_r[big], rtol=1e-4)
    assert np.all(np.abs(t_f[~big]) < 1e-5 * np.abs(t_r).max())


def _fused_kernel_state(n=256, nx=32):
    """Small mid-flight state + geometry for kernel unit tests."""
    import jax.numpy as jnp
    from neutral_tpu.driver import Simulation
    from neutral_tpu.transport import begin_timestep
    cfg = make_cfg("split", n=n, nx=nx, iters=1, dtype="float32")
    sim = Simulation(cfg.with_(engine="flight"), quiet=True)
    state = begin_timestep(sim.state, sim.mesh, sim.geom, sim.cs_scatter,
                           cfg.dt, jnp.uint32(1))
    state = jax.tree_util.tree_map(lambda a: a[:n], state)
    return sim, state, cfg


@pytest.mark.slow
def test_pallas_flight_multi_interpret_matches_core(monkeypatch):
    """One fused kernel call (interpret) == k XLA flight_core steps with
    the same ring-insert logic, lane for lane."""
    import jax.numpy as jnp
    from neutral_tpu.flight import flight_core
    from neutral_tpu.pallas_flight import (make_seg_ring,
                                           pallas_flight_multi)
    from neutral_tpu.pallas_sweep import make_rings

    k_pieces, f_slots, s_slots = 4, 8, 4
    sim, state, cfg = _fused_kernel_state()
    mk = jnp.uint32(1)
    inv = 1.0 / cfg.nparticles
    tally = jnp.zeros(1, jnp.float32)

    fring = make_rings(state.n, jnp.float32, ring_slots=f_slots)
    sring = make_seg_ring(state.n, jnp.float32, s_slots=s_slots)
    out_state, out_fring, out_sring, nfac, ncol = pallas_flight_multi(
        state, fring, sring, sim.cs_scatter, sim.cs_absorb, sim.geom, mk,
        inv, tally, k_pieces=k_pieces, interpret=True)

    # XLA emulation with identical ring-insert logic
    s = state
    fc, fv, fn = make_rings(state.n, jnp.float32, ring_slots=f_slots)
    (sf, sn) = make_seg_ring(state.n, jnp.float32, s_slots=s_slots)
    sf = list(sf)
    nfac_ref = jnp.zeros(state.n, jnp.uint32)
    ncol_ref = jnp.zeros(state.n, jnp.int32)
    for _ in range(k_pieces):
        gate = (fn < f_slots - 1) & (sn < s_slots)
        (s, f1, c1, v1, f2, c2, v2, emit, gx0, gy0, gx1, gy1, kk,
         nf_lane, is_coll) = flight_core(s, sim.geom, sim.cs_scatter,
                                         sim.cs_absorb, mk, inv,
                                         jnp.float32, gate=gate)
        f1 = f1 & (v1 != 0)     # kernel skips zero-valued flushes
        f2 = f2 & (v2 != 0)
        for slot in range(f_slots):
            hit = f1 & (fn == slot)
            fc = fc.at[slot].set(jnp.where(hit, c1, fc[slot]))
            fv = fv.at[slot].set(jnp.where(hit, v1, fv[slot]))
        fn = fn + f1.astype(jnp.int32)
        for slot in range(f_slots):
            hit = f2 & (fn == slot)
            fc = fc.at[slot].set(jnp.where(hit, c2, fc[slot]))
            fv = fv.at[slot].set(jnp.where(hit, v2, fv[slot]))
        fn = fn + f2.astype(jnp.int32)
        segv = (gx0, gy0, gx1, gy1, kk)
        for slot in range(s_slots):
            hit = emit & (sn == slot)
            for f in range(5):
                sf[f] = sf[f].at[slot].set(
                    jnp.where(hit, segv[f], sf[f][slot]))
        sn = sn + emit.astype(jnp.int32)
        nfac_ref = nfac_ref + nf_lane
        ncol_ref = ncol_ref + is_coll.astype(jnp.int32)

    # Interpret-mode pallas and jitted XLA round differently at the ulp
    # level (fma fusion); decisions, draws and integer state must agree
    # exactly, floats to ~1e-5.
    for f in out_state.__dataclass_fields__:
        a = np.asarray(getattr(out_state, f))
        b = np.asarray(getattr(s, f))
        if a.dtype.kind in "iub":
            np.testing.assert_array_equal(a, b, err_msg=f)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-30,
                                       err_msg=f)
    np.testing.assert_array_equal(np.asarray(out_fring[2]), np.asarray(fn))
    np.testing.assert_array_equal(np.asarray(out_fring[0]), np.asarray(fc))
    np.testing.assert_allclose(np.asarray(out_fring[1]), np.asarray(fv),
                               rtol=2e-3, atol=1e-32)
    np.testing.assert_array_equal(np.asarray(out_sring[1]), np.asarray(sn))
    for f in range(5):
        np.testing.assert_allclose(np.asarray(out_sring[0][f]),
                                   np.asarray(sf[f]), rtol=2e-3,
                                   atol=1e-32)
    np.testing.assert_array_equal(np.asarray(nfac), np.asarray(nfac_ref))
    np.testing.assert_array_equal(np.asarray(ncol), np.asarray(ncol_ref))


@pytest.mark.slow
def test_pallas_flight_multi_seg_plane_interpret_matches_core():
    """Piece-plane segment rings: one fused call (interpret) == k XLA
    flight_core steps with plane-p appends — piece p's segment lands in
    plane p with kk == 0 for non-emitting pieces, and the flush rings
    keep the count-ladder semantics with a flush-only gate."""
    import jax.numpy as jnp
    from neutral_tpu.flight import flight_core
    from neutral_tpu.pallas_flight import (make_seg_ring,
                                           pallas_flight_multi)
    from neutral_tpu.pallas_sweep import make_rings

    k_pieces, f_slots, s_slots = 4, 8, 4
    sim, state, cfg = _fused_kernel_state()
    mk = jnp.uint32(1)
    inv = 1.0 / cfg.nparticles
    tally = jnp.zeros(1, jnp.float32)

    fring = make_rings(state.n, jnp.float32, ring_slots=f_slots)
    sring = make_seg_ring(state.n, jnp.float32, s_slots=s_slots)
    out_state, out_fring, out_sring, nfac, ncol = pallas_flight_multi(
        state, fring, sring, sim.cs_scatter, sim.cs_absorb, sim.geom, mk,
        inv, tally, k_pieces=k_pieces, interpret=True, seg_plane=True)

    s = state
    fc, fv, fn = make_rings(state.n, jnp.float32, ring_slots=f_slots)
    (sf, sn) = make_seg_ring(state.n, jnp.float32, s_slots=s_slots)
    sf = list(sf)
    for p in range(k_pieces):
        gate = fn < f_slots - 1
        (s, f1, c1, v1, f2, c2, v2, emit, gx0, gy0, gx1, gy1, kk,
         nf_lane, is_coll) = flight_core(s, sim.geom, sim.cs_scatter,
                                         sim.cs_absorb, mk, inv,
                                         jnp.float32, gate=gate)
        f1 = f1 & (v1 != 0)     # kernel skips zero-valued flushes
        f2 = f2 & (v2 != 0)
        for slot in range(f_slots):
            hit = f1 & (fn == slot)
            fc = fc.at[slot].set(jnp.where(hit, c1, fc[slot]))
            fv = fv.at[slot].set(jnp.where(hit, v1, fv[slot]))
        fn = fn + f1.astype(jnp.int32)
        for slot in range(f_slots):
            hit = f2 & (fn == slot)
            fc = fc.at[slot].set(jnp.where(hit, c2, fc[slot]))
            fv = fv.at[slot].set(jnp.where(hit, v2, fv[slot]))
        fn = fn + f2.astype(jnp.int32)
        for f, v in enumerate((gx0, gy0, gx1, gy1)):
            sf[f] = sf[f].at[p].set(v)
        sf[4] = sf[4].at[p].set(jnp.where(emit, kk, 0.0))
        sn = sn + emit.astype(jnp.int32)

    for f in out_state.__dataclass_fields__:
        a = np.asarray(getattr(out_state, f))
        b = np.asarray(getattr(s, f))
        if a.dtype.kind in "iub":
            np.testing.assert_array_equal(a, b, err_msg=f)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-30,
                                       err_msg=f)
    np.testing.assert_array_equal(np.asarray(out_fring[2]), np.asarray(fn))
    np.testing.assert_array_equal(np.asarray(out_fring[0]), np.asarray(fc))
    np.testing.assert_array_equal(np.asarray(out_sring[1]), np.asarray(sn))
    # kk == 0 entries are skip sentinels: only compare where kk != 0,
    # but the kk plane itself must match everywhere (exactly the
    # emitting (piece, lane) slots are nonzero).
    kk_out = np.asarray(out_sring[0][4])
    kk_ref = np.asarray(sf[4])
    np.testing.assert_array_equal(kk_out != 0, kk_ref != 0)
    live = kk_ref != 0
    for f in range(5):
        np.testing.assert_allclose(np.asarray(out_sring[0][f])[live],
                                   np.asarray(sf[f])[live], rtol=2e-3,
                                   atol=1e-32)


def test_extract_segments_budget_gating():
    """Partial ring extraction: lanes move all-or-nothing under row and
    pair budgets; non-extracted lanes keep their ring state."""
    import jax.numpy as jnp
    from neutral_tpu.pallas_flight import extract_ring_segments

    n, s_slots = 8, 3
    rng = np.random.default_rng(0)
    sf = tuple(jnp.asarray(rng.uniform(0, 256, (s_slots, n)), jnp.float32)
               for _ in range(5))
    sn = jnp.asarray([3, 0, 2, 3, 1, 3, 3, 2], jnp.int32)
    scap = 7          # fits lanes 0 (3 rows), 2 (2), skips 3 (3 > room 2)
    segbuf = jnp.zeros((scap, 8), jnp.float32)
    zero = jnp.zeros((), jnp.int32)
    segbuf, sbase, spairs, (sf2, sn2), left = extract_ring_segments(
        sf, sn, segbuf, zero, zero, tile=128, pair_cap=1 << 20)
    assert bool(left)
    # prefix gating: lanes 0 (3 rows) + 1 (0) + 2 (2) fit; lane 3 (3 rows)
    # would exceed scap=7, blocking it and everything after
    assert int(sbase) == 5
    taken = np.asarray(sn2) == 0
    kept = ~taken
    # ring counts of non-extracted lanes unchanged
    np.testing.assert_array_equal(np.asarray(sn2)[kept],
                                  np.asarray(sn)[kept])
    # extracted rows carry the right field values, grouped per lane
    rows = np.asarray(segbuf)[:int(sbase)]
    want = []
    total = 0
    for lane in range(n):
        cnt = int(np.asarray(sn)[lane])
        if cnt and total + cnt <= scap:
            for slot in range(cnt):
                want.append([float(np.asarray(sf[f])[slot, lane])
                             for f in range(5)])
            total += cnt
        elif cnt:
            break
    got = sorted(map(tuple, rows[:, :5].tolist()))
    assert got == sorted(map(tuple, want))


def test_flight_tiny_buffers_stall_and_recover():
    cfg = make_cfg("stream", n=300, iters=1)
    t_big, s_big = _run(cfg, "flight")
    sim = Simulation(cfg.with_(engine="flight"), quiet=True)
    sim.flight_seg_cap = 64          # force many drain stalls
    sim.flight_flush_cap = 128
    sim.flight_pair_cap = 4096
    m = sim.step(1)
    t_small = np.asarray(sim.tally, np.float64)
    assert (m.nfacets, m.ncollisions, m.nprocessed) == s_big[0]
    np.testing.assert_allclose(t_small, t_big.reshape(t_small.shape),
                               rtol=1e-9, atol=1e-33)


def test_select_working_padded_preserves_arrivals():
    """Padded compaction: free slots map to dead husks; arrivals written
    into them merge back losslessly; censused lanes stay intact."""
    from neutral_tpu.particles import (ParticleState, merge_compacted,
                                       select_working_padded)
    n = 16
    rng = np.random.default_rng(1)
    f32 = jnp.float32
    dead = jnp.asarray([0, 1, 0, 1, 1, 0, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1],
                       bool)
    dt = jnp.asarray([1, 0, 0, 0, 0, 1, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0],
                     f32)  # lane 2 is censused-alive: must survive
    state = ParticleState(
        x=jnp.arange(n, dtype=f32), y=jnp.zeros(n, f32),
        omega_x=jnp.ones(n, f32), omega_y=jnp.zeros(n, f32),
        energy=jnp.ones(n, f32), weight=jnp.ones(n, f32),
        dt_to_census=dt, mfp_to_collision=jnp.zeros(n, f32),
        deposit=jnp.zeros(n, f32),
        cellx=jnp.zeros(n, jnp.int32), celly=jnp.zeros(n, jnp.int32),
        dead=dead, pid=jnp.arange(n, dtype=jnp.uint32),
        counter=jnp.zeros(n, jnp.uint32))
    part, sel = select_working_padded(state, 8)
    work = np.flatnonzero(np.asarray(~dead & (dt > 0))).tolist()
    sel_np = np.asarray(sel)
    assert sel_np[:len(work)].tolist() == work
    # remaining slots are dead husks (free) — never the censused lane 2
    assert 2 not in sel_np[len(work):]
    assert np.asarray(part.dead)[len(work):].all()
    # simulate a migration arrival into a free slot, then merge
    slot = len(work)
    part2 = jax.tree_util.tree_map(lambda a: a, part)
    fields = {f: getattr(part2, f) for f in part2.__dataclass_fields__}
    fields["x"] = part2.x.at[slot].set(99.0)
    fields["dead"] = part2.dead.at[slot].set(False)
    fields["dt_to_census"] = part2.dt_to_census.at[slot].set(0.5)
    part2 = ParticleState(**fields)
    full = merge_compacted(state, part2, sel)
    lane = int(sel_np[slot])
    assert float(np.asarray(full.x)[lane]) == 99.0
    assert not bool(np.asarray(full.dead)[lane])
    # censused lane 2 untouched
    assert float(np.asarray(full.x)[2]) == 2.0
    assert not bool(np.asarray(full.dead)[2])


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_flight_sharded_matches_single_device():
    """Sharded flight engine (8-way CPU mesh) == single-device flight:
    identical event counts (pid-keyed RNG), tallies to rounding."""
    from neutral_tpu.parallel import ShardedSimulation
    for kind in ("stream", "csp"):
        cfg = make_cfg(kind, n=600, iters=2).with_(engine="flight")
        single = Simulation(cfg, quiet=True)
        shard = ShardedSimulation(cfg, quiet=True)
        assert shard.use_flight
        for tt in range(1, cfg.niters + 1):
            a = single.step(tt)
            b = shard.step(tt)
            assert (a.nfacets, a.ncollisions, a.nprocessed) == \
                (b.nfacets, b.ncollisions, b.nprocessed), kind
        np.testing.assert_allclose(
            np.asarray(single.tally, np.float64),
            np.asarray(shard.tally, np.float64),
            rtol=1e-9, atol=1e-33)


def test_flight_checkpoint_roundtrip(tmp_path):
    """Flight engine checkpoints (global-coordinate convention) resume
    bitwise-identically."""
    cfg = make_cfg("csp", n=400, iters=3)
    ref = Simulation(cfg.with_(engine="flight"), quiet=True)
    stats = []
    for tt in range(1, 4):
        m = ref.step(tt)
        stats.append((m.nfacets, m.ncollisions))

    a = Simulation(cfg.with_(engine="flight"), quiet=True)
    m1 = a.step(1)
    path = str(tmp_path / "fl.npz")
    a.checkpoint(path, 1)
    b = Simulation(cfg.with_(engine="flight"), quiet=True)
    assert b.restore(path) == 1
    out = [(m1.nfacets, m1.ncollisions)]
    for tt in range(2, 4):
        m = b.step(tt)
        out.append((m.nfacets, m.ncollisions))
    assert out == stats
    np.testing.assert_array_equal(np.asarray(b.tally), np.asarray(ref.tally))


def test_flight_rejects_mismatched_coords(tmp_path):
    """A stepping-engine (cell-local f32) checkpoint cannot silently load
    into the flight engine's global-coordinate state."""
    cfg = make_cfg("csp", n=400, iters=2, dtype="float32")
    a = Simulation(cfg.with_(engine="xla"), quiet=True)
    a.step(1)
    path = str(tmp_path / "cl.npz")
    a.checkpoint(path, 1)
    b = Simulation(cfg.with_(engine="flight"), quiet=True)
    with pytest.raises(ValueError, match="coord"):
        b.restore(path)


def test_rasterize_walk_banded_matches_unbanded():
    """Row-band tiled walker (band_nty < nty) == the whole-buffer walker
    == the per-cell oracle: deposit-exact band clipping (kk scaled by
    the covered t-fraction; seams telescope), including degenerate
    segments and endpoints on band boundaries.  Removes the VMEM cap
    (the old ~4992^2-cells-per-shard walker_fits gate)."""
    rng = np.random.default_rng(21)
    tile, ntx, nty = 8, 4, 6
    nx, ny = tile * ntx, tile * nty
    n = 40
    segs = np.zeros((64, 8), np.float32)
    segs[:n] = _random_segs(rng, n, nx, ny).astype(np.float32)
    # degenerate + band-boundary cases
    segs[0] = [2.0, 3.0, 29.0, 3.0, 1.0, 0, 0, 0]      # horizontal
    segs[1] = [5.0, 0.5, 5.0, ny - 0.5, 2.0, 0, 0, 0]  # vertical, all bands
    segs[2] = [4.0, 16.0, 4.0, 16.0, 3.0, 0, 0, 0]     # zero-length on seam
    segs[3] = [0.0, 0.0, nx, ny, 1.5, 0, 0, 0]         # full diagonal
    segs[4] = [1.0, 16.0, 30.0, 16.0, 1.0, 0, 0, 0]    # horizontal on seam

    whole = raster.rasterize_walk(jnp.zeros((ny, nx), jnp.float32),
                                  jnp.asarray(segs), jnp.int32(n),
                                  tile=tile, ntx=ntx, nty=nty,
                                  interpret=True)
    want = raster.rasterize_ref(np.zeros((ny, nx)),
                                segs[:n, :5].astype(np.float64))
    for band_nty in (1, 2, 4):
        out = raster.rasterize_walk(jnp.zeros((ny, nx), jnp.float32),
                                    jnp.asarray(segs), jnp.int32(n),
                                    tile=tile, ntx=ntx, nty=nty,
                                    interpret=True, band_nty=band_nty)
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(whole),
                                   rtol=1e-5, atol=1e-6)
        # conservation: banded total mass == unbanded (seam telescoping)
        np.testing.assert_allclose(float(jnp.sum(out)),
                                   float(jnp.sum(whole)), rtol=1e-6)


def test_rasterize_walk_rings_banded_matches_unbanded():
    """Ring-direct banded walker drain == unbanded (the production
    in-loop drain path under pallas_flight_chunk with band_nty set)."""
    rng = np.random.default_rng(23)
    tile, ntx, nty = 8, 4, 6
    nx, ny = tile * ntx, tile * nty
    S, N = 3, 16
    sf = [rng.uniform(0, nx, (S, N)).astype(np.float32) for _ in range(5)]
    sf[1] = rng.uniform(0, ny, (S, N)).astype(np.float32)
    sf[3] = rng.uniform(0, ny, (S, N)).astype(np.float32)
    sf[4] = rng.uniform(0.5, 2.0, (S, N)).astype(np.float32)
    sn = rng.integers(0, S + 1, N).astype(np.int32)
    whole, _ = raster.rasterize_walk_rings(
        jnp.zeros((ny, nx), jnp.float32),
        tuple(jnp.asarray(f) for f in sf), jnp.asarray(sn),
        tile=tile, ntx=ntx, nty=nty, interpret=True)
    out, (sf2, sn2) = raster.rasterize_walk_rings(
        jnp.zeros((ny, nx), jnp.float32),
        tuple(jnp.asarray(f) for f in sf), jnp.asarray(sn),
        tile=tile, ntx=ntx, nty=nty, interpret=True, band_nty=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(whole),
                               rtol=1e-5, atol=1e-6)
    assert int(jnp.max(sn2)) == 0 and float(jnp.max(jnp.abs(sf2[4]))) == 0.0
