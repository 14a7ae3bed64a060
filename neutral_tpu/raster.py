"""Dense tile rasterizer: line-segment energy deposition without scatters.

The flight engine (flight.py) emits boundary-to-boundary line segments
whose per-cell tally deposit is kk * (fraction of the segment inside the
cell).  Depositing them through XLA's scatter costs ~10ns per CELL entry,
serialized (the round-1 tally wall).  This module instead:

  1. expands each segment into its (tile, segment) crossing pairs in
     closed form (merged-arithmetic-progression walk, pure vector math),
  2. groups pairs by tile with ONE key/value sort + a tiny searchsorted,
  3. runs a Mosaic kernel over the tile grid: each 128x128-cell tally tile
     stays resident in VMEM while every segment crossing it deposits into
     all cells at once with ~15 VPU ops — the classic clipped-overlap
     formula L(cell) = max(0, min(tx_out,ty_out) - max(tx_in,ty_in)) in
     the segment's affine t-parameter (anisotropy-safe).

Measured on one v5e chip: ~17M pairs/s (a full-mesh diagonal segment
crosses ~60 tiles, i.e. ~4000 cells deposited per microsecond — ~25x the
XLA scatter path), with sort+gather overhead ~0.2s per 8M-pair batch.

A pure-XLA DDA fallback (rasterize_xla) provides the same semantics for
CPU runs and as the oracle for kernel tests.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128          # tally tile side (cells)
_CHUNK = 256        # pairs DMA'd per kernel inner chunk
_BIG = 1.0e30


def grid_shape(nx: int, ny: int, tile: int = TILE) -> tuple[int, int]:
    """(nty, ntx) tile-grid shape covering an (ny, nx) cell mesh."""
    return (-(-ny // tile), -(-nx // tile))


# ---------------------------------------------------------------------------
# Pair expansion: k-th tile crossed by a segment, in closed form
# ---------------------------------------------------------------------------

def _clipfloor(u, n):
    return jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 1)


def _kth_tile(gx0, gy0, gx1, gy1, k, tile, ntx, nty):
    """Tile id after k boundary crossings along each segment.

    The tile-boundary crossing times along the ray are the merge of two
    arithmetic progressions (x-walls and y-walls); the number of x-steps
    among the first k crossings is found by an 8-step vector binary
    search, making the k-th visited tile O(1) per (segment, k) pair.
    """
    f32 = gx0.dtype
    inv = np.dtype(f32).type(1.0 / tile)
    u0x = gx0 * inv
    u1x = gx1 * inv
    u0y = gy0 * inv
    u1y = gy1 * inv
    ax = _clipfloor(u0x, ntx)
    bx = _clipfloor(u1x, ntx)
    ay = _clipfloor(u0y, nty)
    by = _clipfloor(u1y, nty)
    mx = jnp.abs(bx - ax)
    my = jnp.abs(by - ay)
    sx = jnp.sign(bx - ax)
    sy = jnp.sign(by - ay)
    dux = u1x - u0x
    duy = u1y - u0y
    safe_dux = jnp.where(mx > 0, dux, jnp.asarray(1.0, f32))
    safe_duy = jnp.where(my > 0, duy, jnp.asarray(1.0, f32))
    hx = jnp.abs(1.0 / safe_dux)
    hy = jnp.abs(1.0 / safe_duy)
    bx1 = jnp.where(sx > 0, ax + 1, ax).astype(f32)
    by1 = jnp.where(sy > 0, ay + 1, ay).astype(f32)
    x1t = (bx1 - u0x) / safe_dux
    y1t = (by1 - u0y) / safe_duy
    big = jnp.asarray(_BIG, f32)

    def xt(i):
        t = x1t + (i - 1).astype(f32) * hx
        return jnp.where(i <= 0, -big, jnp.where(i > mx, big, t))

    def yt(j):
        t = y1t + (j - 1).astype(f32) * hy
        return jnp.where(j <= 0, -big, jnp.where(j > my, big, t))

    lo = jnp.maximum(0, k - my)
    hi = jnp.minimum(k, mx)
    for _ in range(8):
        mid = (lo + hi + 1) >> 1
        ok = (xt(mid) <= yt(k - mid + 1)) & (mid <= hi)
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, jnp.minimum(hi, mid - 1))
    i = lo
    tx = ax + sx * i
    ty = ay + sy * (k - i)
    return ty * ntx + tx


def expand_pairs(segbuf, nseg, *, tile: int, ntx: int, nty: int,
                 pair_cap: int):
    """Segments -> (sorted tile keys, sorted pair seg-indices, offsets).

    Compact expansion (no per-segment padding): slot j belongs to segment
    seg_of_slot(j), its crossing ordinal is j - start(segment) — both
    recovered with cumsum/cummax instead of searchsorted (which measures
    ~170ns/query on TPU).  Invalid slots get the sentinel key `ntiles`,
    sort to the end, and are excluded by offsets[ntiles].
    """
    scap = segbuf.shape[0]
    ntiles = ntx * nty
    valid = jnp.arange(scap) < nseg
    gx0 = segbuf[:, 0]
    gy0 = segbuf[:, 1]
    gx1 = segbuf[:, 2]
    gy1 = segbuf[:, 3]
    inv = np.float32(1.0 / tile)
    tx0 = _clipfloor(gx0 * inv, ntx)
    tx1 = _clipfloor(gx1 * inv, ntx)
    ty0 = _clipfloor(gy0 * inv, nty)
    ty1 = _clipfloor(gy1 * inv, nty)
    m = jnp.where(valid,
                  jnp.abs(tx1 - tx0) + jnp.abs(ty1 - ty0) + 1, 0)
    start = jnp.cumsum(m) - m                    # exclusive prefix
    total = start[-1] + m[-1]

    # seg_of_slot / k_of_slot via marker + cumsum/cummax (gather-free)
    slots = jnp.arange(pair_cap, dtype=jnp.int32)
    marker = jnp.zeros(pair_cap, jnp.int32).at[
        jnp.where(m > 0, start, pair_cap)].add(1, mode="drop")
    seg_of_slot = jnp.cumsum(marker) - 1
    start_of_slot = lax.cummax(jnp.where(marker > 0, slots, -1))
    k = slots - start_of_slot
    slot_ok = (slots < total) & (seg_of_slot >= 0)

    # One row-gather instead of four scalar gathers: TPU row gathers cost
    # ~1ns/element vs ~8ns for scalar gathers (microbenchmarked).
    rows = segbuf[jnp.clip(seg_of_slot, 0, scap - 1), :4]
    key = _kth_tile(rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3], k,
                    tile, ntx, nty)
    key = jnp.where(slot_ok, key, ntiles)
    key, seg_idx = lax.sort_key_val(key, seg_of_slot)
    offsets = jnp.searchsorted(key, jnp.arange(ntiles + 1, dtype=jnp.int32)
                               ).astype(jnp.int32)
    return key, seg_idx, offsets


# ---------------------------------------------------------------------------
# Mosaic tile kernel
# ---------------------------------------------------------------------------

def _raster_kernel(ntx, tsz, offs_ref, pair_hbm, buf_in, buf_out,
                   scratch, sems):
    """Deposit sorted (segment x tile) pairs into the resident tile.

    Per-pair math is the clipped-overlap formula in AFFINE form: the
    expansion precomputes (ax, bxlo, bxhi, ay, bylo, byhi, kk) per pair
    (tile offset folded in) so the per-axis entry/exit times are single
    fused multiply-adds — tlo_ax = v*a + blo, thi_ax = v*a + bhi — and
    the 0/1 clamps fold into the LANE side only (min/max distribute over
    the clamp), leaving just two column-vector ops per pair.  Mosaic
    materializes column ops as full-width VREGs, so this halves the
    kernel's per-pair cost vs the naive 6-column-op form.
    """
    g = pl.program_id(0) * ntx + pl.program_id(1)
    base = offs_ref[g]
    end = offs_ref[g + 1]

    colv = lax.broadcasted_iota(jnp.int32, (1, tsz), 1).astype(jnp.float32)
    rowv = lax.broadcasted_iota(jnp.int32, (tsz, 1), 0).astype(jnp.float32)

    chunk = jnp.asarray(_CHUNK, base.dtype)
    c0 = base // chunk
    c1 = lax.div(end + (chunk - 1), chunk)

    def get_dma(slot, ci):
        off = pl.multiple_of(ci * _CHUNK, _CHUNK)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, _CHUNK)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(c1 > c0)
    def _():
        get_dma(0, c0).start()

    def outer(ci, acc):
        slot = (ci - c0) % 2

        @pl.when(ci + 1 < c1)
        def _():
            get_dma((ci - c0 + 1) % 2, ci + 1).start()

        get_dma(slot, ci).wait()
        cstart = ci * _CHUNK
        p_lo = jnp.maximum(base - cstart, 0)
        p_hi = jnp.minimum(end - cstart, _CHUNK)

        def inner(p, acc):
            ax = scratch[slot, 0, p]
            bxlo = scratch[slot, 1, p]
            bxhi = scratch[slot, 2, p]
            ay = scratch[slot, 3, p]
            bylo = scratch[slot, 4, p]
            byhi = scratch[slot, 5, p]
            kk = scratch[slot, 6, p]
            one = jnp.float32(1.0)
            zero = jnp.float32(0.0)
            txm = colv * ax
            tx_lo = jnp.maximum(txm + bxlo, zero)   # lane ops (cheap)
            tx_hi = jnp.minimum(txm + bxhi, one)
            ty_lo = rowv * ay + bylo                # 2 column ops total
            ty_hi = rowv * ay + byhi
            tin = jnp.maximum(tx_lo, ty_lo)
            tout = jnp.minimum(tx_hi, ty_hi)
            ll = jnp.maximum(tout - tin, zero)
            return acc + kk * ll

        return lax.fori_loop(p_lo, p_hi, inner, acc)

    buf_out[:] = lax.fori_loop(c0, c1, outer, buf_in[:])


def _pair_fields(segbuf, seg_idx, key, *, tile, ntx):
    """(8, pair_cap) f32 AFFINE pair constants in sorted order.

    Per pair the kernel evaluates the axis entry/exit times as single
    fused multiply-adds: t_lo = v*a + b_lo, t_hi = v*a + b_hi with the
    pair's tile origin folded into b (so the kernel needs no per-tile
    shifts).  min(t1, t1+iv) = t1 + min(iv, 0) collapses the per-axis
    min/max to precomputed offsets.  ivx/ivy are inverse segment extents
    in cell units; exact zeros are nudged so 0 * inv stays finite (the
    overlap clips saturate correctly for axis-parallel segments).
    Fields: [ax, bxlo, bxhi, ay, bylo, byhi, kk, 0].
    """
    rows = segbuf[jnp.clip(seg_idx, 0, segbuf.shape[0] - 1)]
    gx0 = rows[:, 0]
    gy0 = rows[:, 1]
    dgx = rows[:, 2] - gx0
    dgy = rows[:, 3] - gy0
    tiny = jnp.float32(1.0e-12)
    ivx = 1.0 / jnp.where(jnp.abs(dgx) < tiny,
                          jnp.where(dgx < 0, -tiny, tiny), dgx)
    ivy = 1.0 / jnp.where(jnp.abs(dgy) < tiny,
                          jnp.where(dgy < 0, -tiny, tiny), dgy)
    kk = rows[:, 4]
    f32 = jnp.float32
    tx0 = ((key % ntx) * tile).astype(f32)
    ty0 = ((key // ntx) * tile).astype(f32)
    zero = jnp.zeros_like(gx0)
    bx = (tx0 - gx0) * ivx
    by = (ty0 - gy0) * ivy
    return jnp.stack([ivx,
                      bx + jnp.minimum(ivx, zero),
                      bx + jnp.maximum(ivx, zero),
                      ivy,
                      by + jnp.minimum(ivy, zero),
                      by + jnp.maximum(ivy, zero),
                      kk, zero], axis=0)


def raster_drain_impl(buf, segbuf, nseg, *, tile: int = TILE, ntx: int,
                      nty: int, pair_cap: int, interpret: bool = False):
    """Unjitted raster drain (shard_map-composable); see raster_drain."""
    key, seg_idx, offsets = expand_pairs(segbuf, nseg, tile=tile, ntx=ntx,
                                         nty=nty, pair_cap=pair_cap)
    pair_data = _pair_fields(segbuf, seg_idx, key, tile=tile, ntx=ntx)
    out = pl.pallas_call(
        partial(_raster_kernel, ntx, tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nty, ntx),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec((tile, tile), lambda gy, gx, sref: (gy, gx),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, tile),
                                   lambda gy, gx, sref: (gy, gx),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((2, 8, _CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nty * tile, ntx * tile),
                                       jnp.float32),
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(offsets, pair_data, buf)
    return out


@partial(jax.jit, static_argnames=("tile", "ntx", "nty", "pair_cap",
                                   "interpret"),
         donate_argnums=(0,))
def raster_drain(buf, segbuf, nseg, *, tile: int = TILE, ntx: int,
                 nty: int, pair_cap: int, interpret: bool = False):
    """Deposit `nseg` buffered segments into the (nty*tile, ntx*tile) buf."""
    return raster_drain_impl(buf, segbuf, nseg, tile=tile, ntx=ntx,
                             nty=nty, pair_cap=pair_cap,
                             interpret=interpret)


# ---------------------------------------------------------------------------
# VMEM-resident segment walker: rasterize with NO pair expansion
# ---------------------------------------------------------------------------
#
# On v5e the whole padded tally buffer of a 4000^2 mesh (67 MB f32) fits
# in VMEM.  This kernel keeps it resident and walks each segment across
# its tiles with a scalar DDA, depositing into dynamically-sliced
# (tile, tile) windows (sublane offsets are tile-aligned, which Mosaic
# supports).  Grid steps are sequential on a TensorCore, so read-modify-
# write needs no atomics.  Compared to the sorted-pair pipeline this
# removes the expansion entirely — the marker/cumsum machinery, two
# ~10 ns/elem gathers and the sort cost more than the kernel itself —
# at the price of one dynamic-slice load/store per (segment, tile) visit.

def _walk_kernel(ntx, nty, tsz, skip_links, nc_total, occ_ref, seg_hbm,
                 buf_in, buf_out, acc_vmem, scratch, sems, buf_sem):
    # occ_ref (scalar prefetch): [n_occupied, chunk_idx_0, chunk_idx_1,
    # ...] — only chunks with at least one live (kk != 0) entry are
    # listed, so an all-empty chunk costs NOTHING here (no DMA, no
    # per-entry scan).  Ring-direct drains stream slot-major ring
    # planes whose high-slot chunks are mostly empty; the caller
    # computes the occupancy list with two cheap vector passes.
    # With skip_links the list carries a second block of nc_total
    # per-occupied-chunk LIVE COUNTS (same packing as the indices), and
    # plane row 15 holds the chunk-local live indices densely packed in
    # ascending order (_dense_links) — the serial loop then runs
    # exactly `cnt` dependence-free iterations instead of a
    # 256-iteration sentinel scan per chunk (ring-direct drains stream
    # S x N plane slots whose occupancy is often a few percent).
    c1 = occ_ref[0]
    # The accumulator lives in VMEM *scratch* (an aliased in/out VMEM
    # window would be allocated twice and overflow VMEM); explicit
    # HBM->VMEM->HBM copies bracket the walk (~67 MB ≈ 0.1 ms each).
    pltpu.make_async_copy(buf_in, acc_vmem, buf_sem).start()
    pltpu.make_async_copy(buf_in, acc_vmem, buf_sem).wait()
    colv = lax.broadcasted_iota(jnp.int32, (1, tsz), 1).astype(jnp.float32)
    rowv = lax.broadcasted_iota(jnp.int32, (tsz, 1), 0).astype(jnp.float32)

    def get_dma(slot, ci):
        off = pl.multiple_of(occ_ref[1 + ci] * _CHUNK, _CHUNK)
        return pltpu.make_async_copy(
            seg_hbm.at[:, pl.ds(off, _CHUNK)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(c1 > 0)
    def _():
        get_dma(0, 0).start()

    f32 = jnp.float32
    i32 = jnp.int32
    zero = f32(0.0)
    one = f32(1.0)
    tszf = f32(tsz)
    big = f32(_BIG)

    def outer(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < c1)
        def _():
            get_dma((ci + 1) % 2, ci + 1).start()

        get_dma(slot, ci).wait()
        p_hi = _CHUNK  # tail entries carry the kk == 0 skip sentinel

        def per_seg(p, _):
            # kk == 0 is the skip sentinel (ring-direct streams carry
            # mostly-empty slots): gate ALL scalar setup behind it.
            kk = scratch[slot, 4, p]

            @pl.when(kk != zero)
            def _seg():
                do_seg(p, kk)

            return 0

        def dense_seg(j, _):
            # Dense-index walk (row 15 = chunk-local indices of the
            # live entries packed ascending, _dense_links): entry j IS
            # live — no kk gate, no sentinel scan, and the reads are
            # dependence-free so the scalar unit can pipeline them.
            q = scratch[slot, 15, j].astype(i32)
            do_seg(q, scratch[slot, 4, q])
            return 0

        def do_seg(p, kk):
            # All per-segment setup scalars were PRECOMPUTED vectorized
            # (_setup_planes: ~45 scalar-unit ops incl. two divides
            # became ~3 ns of VPU work per segment); the serial loop
            # just reads them.  Measured on hardware (bench/
            # walker_probe.py): setup was ~80 ns of the ~150 ns
            # short-segment cost.
            gx0 = scratch[slot, 0, p]
            gy0 = scratch[slot, 1, p]
            ivx = scratch[slot, 2, p]
            ivy = scratch[slot, 3, p]
            tx = scratch[slot, 5, p].astype(i32)
            ty = scratch[slot, 6, p].astype(i32)
            txe = scratch[slot, 7, p].astype(i32)
            tye = scratch[slot, 8, p].astype(i32)
            m = scratch[slot, 9, p].astype(i32)
            t_nx = scratch[slot, 10, p]
            t_ny = scratch[slot, 11, p]
            hx = scratch[slot, 12, p]
            hy = scratch[slot, 13, p]
            flags = scratch[slot, 14, p]
            degx = (flags == one) | (flags == f32(3.0))
            degy = flags >= f32(2.0)
            sx = jnp.where(ivx >= zero, i32(1), i32(-1))
            sy = jnp.where(ivy >= zero, i32(1), i32(-1))

            def visit(carry):
                tx, ty, t_nx, t_ny = carry
                # per-tile affine constants (scalar)
                bx = (tx.astype(f32) * tszf - gx0) * ivx
                by = (ty.astype(f32) * tszf - gy0) * ivy
                bxlo = bx + jnp.minimum(ivx, zero)
                bxhi = bx + jnp.maximum(ivx, zero)
                bylo = by + jnp.minimum(ivy, zero)
                byhi = by + jnp.maximum(ivy, zero)
                txm = colv * ivx
                # Degenerate x: whole [0,1] t-window in gx0's column,
                # empty (lo=1 > hi=0) everywhere else.
                gx0l = gx0 - tx.astype(f32) * tszf
                in_col = (colv <= gx0l) & (gx0l < colv + one)
                tx_lo = jnp.where(degx,
                                  jnp.where(in_col, zero, one),
                                  jnp.maximum(txm + bxlo, zero))
                tx_hi = jnp.where(degx,
                                  jnp.where(in_col, one, zero),
                                  jnp.minimum(txm + bxhi, one))
                gy0l = gy0 - ty.astype(f32) * tszf
                in_row = (rowv <= gy0l) & (gy0l < rowv + one)
                ty_lo = jnp.where(degy,
                                  jnp.where(in_row, zero, one),
                                  rowv * ivy + bylo)
                ty_hi = jnp.where(degy,
                                  jnp.where(in_row, one, zero),
                                  rowv * ivy + byhi)
                tin = jnp.maximum(tx_lo, ty_lo)
                tout = jnp.minimum(tx_hi, ty_hi)
                ll = jnp.maximum(tout - tin, zero)
                ry = pl.multiple_of(ty * tsz, tsz)
                rx = pl.multiple_of(tx * tsz, tsz)
                cur = acc_vmem[pl.ds(ry, tsz), pl.ds(rx, tsz)]
                acc_vmem[pl.ds(ry, tsz), pl.ds(rx, tsz)] = cur + kk * ll

            def step(i, carry):
                tx, ty, t_nx, t_ny = carry
                visit(carry)
                go_x = t_nx <= t_ny
                tx = jnp.where(go_x, tx + sx, tx)
                ty = jnp.where(go_x, ty, ty + sy)
                # An axis that reached its end tile is exhausted (BIG):
                # endpoint-on-boundary rounding must never walk past the
                # clipped end tile — an OOB store would halt the device.
                t_nx = jnp.where(go_x,
                                 jnp.where(tx == txe, big, t_nx + hx),
                                 t_nx)
                t_ny = jnp.where(go_x, t_ny,
                                 jnp.where(ty == tye, big, t_ny + hy))
                return tx, ty, t_nx, t_ny

            carry = lax.fori_loop(0, m, step, (tx, ty, t_nx, t_ny))
            visit(carry)  # final tile

        if skip_links:
            # Dynamic trip count (the kernel already runs a
            # dynamic-bound fori over each segment's tile visits; a
            # lax.while_loop here instead measured 16x slower to
            # Mosaic-compile).
            lax.fori_loop(0, occ_ref[1 + nc_total + ci], dense_seg, 0)
        else:
            lax.fori_loop(0, p_hi, per_seg, 0)
        return 0

    lax.fori_loop(0, c1, outer, 0)
    pltpu.make_async_copy(acc_vmem, buf_out, buf_sem).start()
    pltpu.make_async_copy(acc_vmem, buf_out, buf_sem).wait()


def _occupied_chunks(kk_flat, with_counts=False):
    """[n_occ, idx...] i32 vector of _CHUNK-chunks with any kk != 0.

    The compaction is a chunk-count-sized scatter (~nc entries), so the
    cost is two vector passes over the kk plane — microseconds against
    the scan time the kernel saves on empty chunks.  With with_counts a
    second nc-sized block holds each occupied chunk's LIVE-entry count
    (packed in the same order), for the dense-index serial loop.
    """
    nc = kk_flat.shape[0] // _CHUNK
    live = (kk_flat != 0).reshape(nc, _CHUNK)
    cnt = jnp.sum(live.astype(jnp.int32), axis=1)
    occ = cnt > 0
    pos = jnp.cumsum(occ.astype(jnp.int32)) - 1
    dest = jnp.where(occ, pos, nc)
    occ_list = jnp.zeros((nc,), jnp.int32).at[dest].set(
        jnp.arange(nc, dtype=jnp.int32), mode="drop")
    n_occ = jnp.sum(occ.astype(jnp.int32)).reshape(1)
    if not with_counts:
        return jnp.concatenate([n_occ, occ_list])
    cnt_list = jnp.zeros((nc,), jnp.int32).at[dest].set(cnt, mode="drop")
    return jnp.concatenate([n_occ, occ_list, cnt_list])


def _walk_call(buf, planes, occ, *, tile, ntx, nty, interpret,
               skip_links=False):
    """pallas_call wrapper over (rows>=5, M) f32 segment planes."""
    rows = planes.shape[0]
    nc_total = planes.shape[1] // _CHUNK
    out = pl.pallas_call(
        partial(_walk_kernel, ntx, nty, tile, skip_links, nc_total),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            scratch_shapes=[
                pltpu.VMEM((nty * tile, ntx * tile), jnp.float32),
                pltpu.SMEM((2, rows, _CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nty * tile, ntx * tile),
                                       jnp.float32),
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
    )(occ, planes, buf)
    return out


def band_rows(ntx: int, nty: int, tile: int = TILE,
              budget_bytes: int = 100 * 1024 * 1024) -> int:
    """Tile-rows per walker band under the VMEM residency budget (>=1)."""
    per_row = ntx * tile * tile * 4
    return max(budget_bytes // per_row, 1)


def _clip_to_band(gx0, gy0, gx1, gy1, kk, y0f, y1f):
    """Clip segments to the y-band [y0, y1) (cell units), band-local y.

    Deposit-exact re-parameterization: the clipped sub-segment covers
    t in [a, b] of the original, so scaling kk by (b - a) makes every
    per-cell deposit kk' * ds == kk * dt.  Adjacent bands compute the
    SAME boundary t from the same expression ((y_edge - gy0) / dgy), so
    per-segment coverage telescopes exactly — no double or lost deposit
    at seams (bands are whole tile rows, so a cell belongs to exactly
    one band).  Near-horizontal segments (the walker's degenerate class)
    belong wholly to the band containing gy0.
    """
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    dgx = gx1 - gx0
    dgy = gy1 - gy0
    degy = jnp.abs(dgy) < jnp.float32(1.0e-6)
    safe = jnp.where(degy, one, dgy)
    ta = (y0f - gy0) / safe
    tb = (y1f - gy0) / safe
    a = jnp.clip(jnp.minimum(ta, tb), zero, one)
    b = jnp.clip(jnp.maximum(ta, tb), zero, one)
    in_deg = (gy0 >= y0f) & (gy0 < y1f)
    a = jnp.where(degy, zero, a)
    b = jnp.where(degy, jnp.where(in_deg, one, zero), b)
    frac = jnp.maximum(b - a, zero)
    nkk = jnp.where(frac > zero, kk * frac, zero)
    return (gx0 + a * dgx, gy0 + a * dgy - y0f,
            gx0 + b * dgx, gy0 + b * dgy - y0f, nkk)


def _setup_planes(gx0, gy0, gx1, gy1, kk, *, tsz, ntx, nty):
    """Vectorized per-segment walker setup -> 16 plane rows.

    The walker's per-segment scalar setup (~45 scalar-unit ops including
    two divides, ~80 ns/segment measured by bench/walker_probe.py) is
    hoisted out of the kernel's serial loop into one elementwise VPU
    pass (~3 ns/segment), shipped to the kernel as extra plane rows.
    Same formulas, same f32 ops, so deposits are unchanged.

    Row layout (row 4 = kk stays the occupancy/skip sentinel):
      0 gx0, 1 gy0, 2 ivx, 3 ivy, 4 kk, 5 tx0, 6 ty0, 7 txe, 8 tye,
      9 m (tile crossings), 10 t_nx0, 11 t_ny0, 12 hx, 13 hy,
      14 flags (degx + 2*degy), 15 zero pad.
    Tile indices and m are < 2^15, exact in f32.

    Axis-degenerate segments (vertical/horizontal to within a
    micro-cell) get an EXACT column/row membership window in the kernel
    instead of the 1/tiny giant-slope affine form: the latter relies on
    exact cancellation of ~1e12-scale products, which a single
    compiler-fused FMA silently breaks (t windows off by 1e4+).
    """
    f32 = jnp.float32
    i32 = jnp.int32
    one = f32(1.0)
    tiny = f32(1.0e-12)
    deg = f32(1.0e-6)
    big = f32(_BIG)
    tszf = f32(tsz)
    inv_tsz = f32(1.0 / tsz)

    dgx = gx1 - gx0
    dgy = gy1 - gy0
    degx = jnp.abs(dgx) < deg
    degy = jnp.abs(dgy) < deg
    ivx = one / jnp.where(degx, jnp.where(dgx < 0, -tiny, tiny), dgx)
    ivy = one / jnp.where(degy, jnp.where(dgy < 0, -tiny, tiny), dgy)

    def cfloor(u, n):
        return jnp.clip(jnp.floor(u).astype(i32), 0, n - 1)

    tx = cfloor(gx0 * inv_tsz, ntx)
    ty = cfloor(gy0 * inv_tsz, nty)
    txe = cfloor(gx1 * inv_tsz, ntx)
    tye = cfloor(gy1 * inv_tsz, nty)
    m = (jnp.abs(txe - tx) + jnp.abs(tye - ty)).astype(f32)

    # t of the next x / y tile-boundary crossing, and increments (all in
    # the segment's affine t parameter).  Sign convention matches the
    # kernel's sx/sy = sign(ivx/ivy): dgx == -0.0 gives +tiny.
    hx = jnp.abs(tszf * ivx)
    hy = jnp.abs(tszf * ivy)
    bx1 = jnp.where(ivx >= 0, tx + 1, tx).astype(f32) * tszf
    by1 = jnp.where(ivy >= 0, ty + 1, ty).astype(f32) * tszf
    t_nx0 = jnp.where(txe == tx, big, (bx1 - gx0) * ivx)
    t_ny0 = jnp.where(tye == ty, big, (by1 - gy0) * ivy)
    flags = degx.astype(f32) + f32(2.0) * degy.astype(f32)
    return [gx0, gy0, ivx, ivy, kk, tx.astype(f32), ty.astype(f32),
            txe.astype(f32), tye.astype(f32), m, t_nx0, t_ny0, hx, hy,
            flags]


def _dense_links(kk):
    """Chunk-local dense live-index row (f32) for the walker.

    Per 256-entry chunk, the indices of live (kk != 0) entries packed
    at the front in ASCENDING order (dead indices follow, also
    ascending) — a stable 256-wide sort vectorized over all chunks.
    The kernel's serial loop then runs exactly cnt dependence-free
    iterations per chunk (_walk_kernel `dense_seg`) in the SAME order
    the sentinel scan would visit them, so deposits are bitwise
    identical.
    """
    nc = kk.shape[0] // _CHUNK
    idx = jnp.broadcast_to(jnp.arange(_CHUNK, dtype=jnp.int32),
                           (nc, _CHUNK))
    keys = jnp.where(kk.reshape(nc, _CHUNK) != 0, idx, idx + _CHUNK)
    order = jnp.sort(keys, axis=1) % _CHUNK
    return order.astype(jnp.float32).reshape(-1)


def _walk_banded(buf, fields, *, tile: int, ntx: int, nty: int,
                 interpret: bool, band_nty: int | None = None,
                 skip_links: bool = False):
    """Walker drain of flat field vectors (gx0, gy0, gx1, gy1, kk).

    With band_nty < nty the buffer is processed in horizontal bands of
    band_nty tile-rows so each band's slice fits the kernel's VMEM
    residency (the ~4992^2-cells-per-shard cap removed): segments are
    clipped to each band (deposit-exact, see _clip_to_band) and bands
    run as separate kernel calls over slices of the same buffer.  The
    per-band chunk-occupancy list skips ring chunks with no segment
    touching the band, so total scalar DDA work stays ~one pass over
    the segments.
    """
    gx0, gy0, gx1, gy1, kk = fields
    m = gx0.shape[0]
    pad = (-m) % _CHUNK
    zrow = jnp.zeros(m + pad, gx0.dtype)

    def planes_of(fields, ntyb):
        setup = _setup_planes(*fields, tsz=tile, ntx=ntx, nty=ntyb)
        padded = [jnp.concatenate([f, zrow[:pad]]) if pad else f
                  for f in setup]
        # 16 rows (15 setup + dense-index row 15, or a zero pad): Mosaic
        # HBM slices must be aligned to the (8, 128) tiling along the
        # leading dim.
        last = _dense_links(padded[4]) if skip_links else zrow
        return jnp.stack(padded + [last], axis=0)

    if band_nty is None or band_nty >= nty:
        planes = planes_of([gx0, gy0, gx1, gy1, kk], nty)
        return _walk_call(buf, planes,
                          _occupied_chunks(planes[4], skip_links),
                          tile=tile, ntx=ntx, nty=nty, interpret=interpret,
                          skip_links=skip_links)

    for b in range(-(-nty // band_nty)):
        t0 = b * band_nty
        ntyb = min(band_nty, nty - t0)
        y0 = t0 * tile
        cf = _clip_to_band(gx0, gy0, gx1, gy1, kk,
                           jnp.float32(y0), jnp.float32(y0 + ntyb * tile))
        planes = planes_of(list(cf), ntyb)
        sub = lax.slice(buf, (y0, 0), (y0 + ntyb * tile, buf.shape[1]))
        sub = _walk_call(sub, planes,
                         _occupied_chunks(planes[4], skip_links),
                         tile=tile, ntx=ntx, nty=ntyb, interpret=interpret,
                         skip_links=skip_links)
        buf = lax.dynamic_update_slice(buf, sub, (y0, 0))
    return buf


def rasterize_walk_impl(buf, segbuf, nseg, *, tile: int = TILE, ntx: int,
                        nty: int, interpret: bool = False,
                        band_nty: int | None = None):
    """Walker-kernel raster drain (unjitted; see rasterize_walk).

    segbuf rows [gx0, gy0, gx1, gy1, kk, ...] in cell units; rows at
    index >= nseg (or with kk == 0) are skipped.  buf must be the padded
    (nty*tile, ntx*tile) f32 accumulation buffer — VMEM-resident per
    call, either whole (~67 MB for a 4000^2 mesh on v5e's 128 MB VMEM)
    or in band_nty-tile-row bands for bigger meshes (_walk_banded).
    """
    scap = segbuf.shape[0]
    kk = jnp.where(jnp.arange(scap) < nseg, segbuf[:, 4], 0.0)
    fields = (segbuf[:, 0], segbuf[:, 1], segbuf[:, 2], segbuf[:, 3], kk)
    return _walk_banded(buf, fields, tile=tile, ntx=ntx, nty=nty,
                        interpret=interpret, band_nty=band_nty,
                        skip_links=True)


def rasterize_walk_rings_impl(buf, sfields, sn, *, tile: int = TILE,
                              ntx: int, nty: int,
                              interpret: bool = False,
                              kk_authoritative: bool = False,
                              band_nty: int | None = None,
                              compact: bool = True):
    """Walker raster drain straight from the per-lane segment rings.

    `sfields` are the 5 (S, N) ring planes [gx0, gy0, gx1, gy1, kk] and
    `sn` the per-lane counts (pallas_flight.make_seg_ring).  No
    extraction scatter, no flat segment buffer: the kernel streams the
    ring planes and skips entries whose kk is 0 — entries past a lane's
    count are masked to 0 here, so stale slots never deposit.  With
    `kk_authoritative` (piece-plane rings: entries live at their piece's
    plane, not at slot < count) the count mask is skipped — the flight
    kernel already wrote kk == 0 into every non-emitting plane entry.
    Returns (buf', reset (sfields, sn)) with the rings emptied (kk plane
    zeroed = the skip sentinel; other planes keep stale values, which
    the flight kernel overwrites on append).
    """
    S, n = sfields[0].shape
    if kk_authoritative:
        kk = sfields[4]
    else:
        valid = (jnp.arange(S, dtype=jnp.int32)[:, None] < sn[None, :])
        kk = jnp.where(valid, sfields[4], 0.0)
    fields = tuple(f.reshape(-1) for f in sfields[:4]) + (kk.reshape(-1),)
    buf = _walk_banded(buf, fields, tile=tile, ntx=ntx, nty=nty,
                       interpret=interpret, band_nty=band_nty,
                       skip_links=compact)
    sfields = (sfields[0], sfields[1], sfields[2], sfields[3],
               jnp.zeros_like(sfields[4]))
    return buf, (sfields, jnp.zeros_like(sn))


@partial(jax.jit, static_argnames=("tile", "ntx", "nty", "interpret",
                                   "band_nty"),
         donate_argnums=(0,))
def rasterize_walk(buf, segbuf, nseg, *, tile: int = TILE, ntx: int,
                   nty: int, interpret: bool = False,
                   band_nty: int | None = None):
    """Deposit `nseg` buffered segments via the VMEM-resident walker."""
    return rasterize_walk_impl(buf, segbuf, nseg, tile=tile, ntx=ntx,
                               nty=nty, interpret=interpret,
                               band_nty=band_nty)


@partial(jax.jit, static_argnames=("tile", "ntx", "nty", "interpret",
                                   "band_nty", "compact"),
         donate_argnums=(0,))
def rasterize_walk_rings(buf, sfields, sn, *, tile: int = TILE, ntx: int,
                         nty: int, interpret: bool = False,
                         band_nty: int | None = None,
                         compact: bool = True):
    """Jitted ring-direct walker drain; see rasterize_walk_rings_impl."""
    return rasterize_walk_rings_impl(buf, sfields, sn, tile=tile,
                                     ntx=ntx, nty=nty,
                                     interpret=interpret,
                                     band_nty=band_nty, compact=compact)


def walker_fits(ntx: int, nty: int, tile: int = TILE,
                budget_bytes: int = 100 * 1024 * 1024) -> bool:
    """Whether the walker can rasterize this grid (possibly in bands).

    Row-band tiling (_walk_banded) removes the old whole-buffer cap
    (~4992^2 cells per shard): only ONE band of tile rows must fit the
    VMEM residency budget, i.e. the constraint is mesh WIDTH
    (ntx <= ~25k cells at the 100 MB budget), not area.
    """
    return ntx * tile * tile * 4 <= budget_bytes


# ---------------------------------------------------------------------------
# Pure-XLA fallbacks (CPU path / test oracles)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nx", "ny", "max_steps"),
         donate_argnums=(0,))
def rasterize_xla(tally_flat, segbuf, nseg, *, nx: int, ny: int,
                  max_steps: int):
    """DDA fallback: walk each segment cell by cell, scatter per step.

    Same deposit semantics as the Mosaic kernel (kk * t-fraction per
    cell); O(nseg) scatter entries per DDA step, so only suitable for
    CPU/test scales.  max_steps must be >= the longest segment's cell
    count (nx + ny + 2 is always safe).
    """
    scap = segbuf.shape[0]
    valid = jnp.arange(scap) < nseg
    gx0 = segbuf[:, 0]
    gy0 = segbuf[:, 1]
    dgx = segbuf[:, 2] - gx0
    dgy = segbuf[:, 3] - gy0
    kk = jnp.where(valid, segbuf[:, 4], 0.0).astype(tally_flat.dtype)
    tiny = jnp.asarray(1e-12, segbuf.dtype)
    ivx = 1.0 / jnp.where(jnp.abs(dgx) < tiny,
                          jnp.where(dgx < 0, -tiny, tiny), dgx)
    ivy = 1.0 / jnp.where(jnp.abs(dgy) < tiny,
                          jnp.where(dgy < 0, -tiny, tiny), dgy)
    sx = jnp.where(dgx > 0, 1, jnp.where(dgx < 0, -1, 0))
    sy = jnp.where(dgy > 0, 1, jnp.where(dgy < 0, -1, 0))
    cx = _clipfloor(gx0, nx)
    cy = _clipfloor(gy0, ny)

    def t_next(cx, cy):
        ex = jnp.where(sx > 0, cx + 1, cx).astype(segbuf.dtype)
        ey = jnp.where(sy > 0, cy + 1, cy).astype(segbuf.dtype)
        tx = jnp.where(sx == 0, jnp.asarray(_BIG, segbuf.dtype),
                       (ex - gx0) * ivx)
        ty = jnp.where(sy == 0, jnp.asarray(_BIG, segbuf.dtype),
                       (ey - gy0) * ivy)
        return tx, ty

    def cond(carry):
        _, _, _, t_cur, it = carry
        return jnp.any(valid & (t_cur < 1.0)) & (it < max_steps)

    def body(carry):
        tally, cx, cy, t_cur, it = carry
        tx, ty = t_next(cx, cy)
        tn = jnp.minimum(jnp.minimum(tx, ty), 1.0)
        frac = jnp.maximum(tn - t_cur, 0.0).astype(tally.dtype)
        # An edge crossing that rounds to just below t=1.0 can step cx/cy
        # one past the grid; cy*nx+cx would then wrap into the next row.
        # Route those float-noise fractions to the sentinel instead —
        # the clipped-overlap semantics of the Mosaic kernel and oracle.
        inb = (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
        idx = jnp.where(valid & inb & (t_cur < 1.0), cy * nx + cx, nx * ny)
        tally = tally.at[idx].add(kk * frac, mode="drop")
        step_x = (tx <= ty) & (tx < 1.0)
        step_y = (~step_x) & (ty < 1.0)
        cx = cx + jnp.where(step_x, sx, 0)
        cy = cy + jnp.where(step_y, sy, 0)
        return (tally, cx, cy, tn, it + 1)

    # while_loop (not scan): the walk ends when every segment finishes,
    # so short-segment batches don't pay the worst-case diagonal length.
    (tally_flat, _, _, _, _) = lax.while_loop(
        cond, body,
        (tally_flat, cx, cy, jnp.zeros_like(gx0), jnp.zeros((), jnp.int32)))
    return tally_flat


def rasterize_ref(buf2d: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """Brute-force per-cell overlap oracle (numpy, tests only).

    segs rows: [gx0, gy0, gx1, gy1, kk].
    """
    ny, nx = buf2d.shape
    cols = np.arange(nx, dtype=np.float64)[None, :]
    rows = np.arange(ny, dtype=np.float64)[:, None]
    out = buf2d.astype(np.float64).copy()
    for (gx0, gy0, gx1, gy1, kk) in segs:
        dgx = gx1 - gx0
        dgy = gy1 - gy0
        ivx = 1.0 / (dgx if abs(dgx) > 1e-300 else 1e-300)
        ivy = 1.0 / (dgy if abs(dgy) > 1e-300 else 1e-300)
        t1 = (cols - gx0) * ivx
        t2 = t1 + ivx
        txin = np.clip(np.minimum(t1, t2), 0.0, 1.0)
        txout = np.clip(np.maximum(t1, t2), 0.0, 1.0)
        t3 = (rows - gy0) * ivy
        t4 = t3 + ivy
        tyin = np.clip(np.minimum(t3, t4), 0.0, 1.0)
        tyout = np.clip(np.maximum(t3, t4), 0.0, 1.0)
        ll = np.maximum(np.minimum(txout, tyout)
                        - np.maximum(txin, tyin), 0.0)
        out += kk * ll
    return out
