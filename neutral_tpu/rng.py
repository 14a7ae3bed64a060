"""Counter-based RNG: Threefry-2x64 (20 rounds), TPU-native.

The reproducibility backbone of the framework.  Each particle history draws
from an independent, order-independent stream keyed by

    key     = (particle_id, master_key)       # master_key = timestep index
    counter = (draw_counter, 0)

exactly the scheme of the reference mini-app (reference: omp3/neutral.c:632-652,
which feeds Random123's threefry2x64 — Random123/threefry.h:734, 20 rounds).
Because every lane of a vectorized event sweep carries its *own* draw counter,
histories remain bitwise identical to a sequential history-based tracker no
matter how particles are batched, sharded or reordered.

Threefry is a public algorithm (Salmon, Moraes, Dror & Shaw, SC'11).  This is
an independent implementation on uint32 pairs: TPUs have no native 64-bit
integer datapath, so each u64 word is carried as (hi, lo) uint32 lanes and the
add/rotate/xor mix is expressed with 32-bit ops only.  That makes the
generator jit-compatible on TPU without `jax_enable_x64`, and exactly
bit-equal to the u64 reference everywhere.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Threefry-2x64 rotation distances (public constants from the Threefish/
# Threefry specification).
_ROTATIONS = (16, 42, 12, 31, 16, 32, 24, 21)

# Skein key-schedule parity constant, split into (hi, lo) uint32 halves.
_PARITY_HI = np.uint32(0x1BD11BDA)
_PARITY_LO = np.uint32(0xA9FC1A22)

# Default round count for threefry2x64 (the "safe" 20-round variant the
# reference uses via its threefry2x64() default).
N_ROUNDS = 20

_u32 = jnp.uint32


def _add64(ahi, alo, bhi, blo):
    """(hi, lo) + (hi, lo) with carry, modulo 2^64."""
    lo = alo + blo
    carry = (lo < alo).astype(_u32)
    hi = ahi + bhi + carry
    return hi, lo


def _rotl64(hi, lo, r):
    """Rotate a (hi, lo) uint64 left by the static amount r."""
    if r == 32:
        return lo, hi
    if r > 32:
        hi, lo = lo, hi
        r -= 32
    r = np.uint32(r)
    inv = np.uint32(32 - int(r))
    nhi = (hi << r) | (lo >> inv)
    nlo = (lo << r) | (hi >> inv)
    return nhi, nlo


def threefry2x64(ctr0_hi, ctr0_lo, ctr1_hi, ctr1_lo,
                 key0_hi, key0_lo, key1_hi, key1_lo,
                 rounds: int = N_ROUNDS):
    """Threefry-2x64 block cipher on uint32-pair words.

    All eight inputs are uint32 arrays (broadcastable).  Returns the two
    output u64 words as four uint32 arrays (x0_hi, x0_lo, x1_hi, x1_lo).
    """
    ks0_hi, ks0_lo = key0_hi, key0_lo
    ks1_hi, ks1_lo = key1_hi, key1_lo
    ks2_hi = _PARITY_HI ^ ks0_hi ^ ks1_hi
    ks2_lo = _PARITY_LO ^ ks0_lo ^ ks1_lo
    ks = ((ks0_hi, ks0_lo), (ks1_hi, ks1_lo), (ks2_hi, ks2_lo))

    x0_hi, x0_lo = _add64(ctr0_hi, ctr0_lo, ks0_hi, ks0_lo)
    x1_hi, x1_lo = _add64(ctr1_hi, ctr1_lo, ks1_hi, ks1_lo)

    for r in range(rounds):
        x0_hi, x0_lo = _add64(x0_hi, x0_lo, x1_hi, x1_lo)
        x1_hi, x1_lo = _rotl64(x1_hi, x1_lo, _ROTATIONS[r % 8])
        x1_hi = x1_hi ^ x0_hi
        x1_lo = x1_lo ^ x0_lo
        if (r + 1) % 4 == 0:
            j = (r + 1) // 4
            a = ks[j % 3]
            b = ks[(j + 1) % 3]
            x0_hi, x0_lo = _add64(x0_hi, x0_lo, a[0], a[1])
            x1_hi, x1_lo = _add64(x1_hi, x1_lo, b[0], b[1])
            # Inject the round-number tweak into the second word.
            x1_hi, x1_lo = _add64(x1_hi, x1_lo, _u32(0), _u32(j))

    return x0_hi, x0_lo, x1_hi, x1_lo


def _split64(x) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split integer array (any int dtype, values < 2^64) into u32 (hi, lo)."""
    x = jnp.asarray(x)
    if x.dtype in (jnp.uint64, jnp.int64):
        hi = (x >> 32).astype(_u32)
        lo = (x & 0xFFFFFFFF).astype(_u32)
    else:
        hi = jnp.zeros_like(x, dtype=_u32)
        lo = x.astype(_u32)
    return hi, lo


def raw_draw(pkey, master_key, counter):
    """One Threefry-2x64 draw per lane.

    Mirrors the reference stream contract: ctr = (counter, 0),
    key = (pkey, master_key).  Inputs are integer arrays (uint32 values are
    fine — particle ids, timestep indices and per-history draw counters all
    fit in 32 bits for any practical run; 64-bit inputs are also accepted).

    Returns four uint32 arrays: (v0_hi, v0_lo, v1_hi, v1_lo).
    """
    c_hi, c_lo = _split64(counter)
    p_hi, p_lo = _split64(pkey)
    m_hi, m_lo = _split64(master_key)
    zero = jnp.zeros_like(c_hi)
    return threefry2x64(c_hi, c_lo, zero, zero, p_hi, p_lo, m_hi, m_lo)


# (0, 1) uniform mapping constants, as in the reference:
#   u = v * 2^-64 + 2^-65  — strictly inside (0, 1).
_FACTOR64 = float(np.ldexp(1.0, -64))
_HALF_FACTOR64 = float(np.ldexp(1.0, -65))
_FACTOR32_HI = float(np.ldexp(1.0, -32))   # weight of the hi word
_FACTOR32_LO = float(np.ldexp(1.0, -64))   # weight of the lo word


def uniform2_f64(pkey, master_key, counter):
    """Two float64 uniforms in (0,1) per lane — bit-identical to the reference.

    Requires jax_enable_x64.  hi*2^-32 and lo*2^-64 are both exact in f64, the
    single rounding of their sum matches C's (double)u64 conversion, and the
    final +2^-65 matches the reference's half-factor offset.
    """
    v0h, v0l, v1h, v1l = raw_draw(pkey, master_key, counter)

    def conv(hi, lo):
        # Reassemble the u64 and convert once — identical rounding to C's
        # (double)u64, and robust against XLA FMA contraction (the *factor
        # product is exact, so a fused multiply-add cannot change the sum).
        v = (hi.astype(jnp.uint64) << 32) | lo.astype(jnp.uint64)
        return v.astype(jnp.float64) * _FACTOR64 + _HALF_FACTOR64

    return conv(v0h, v0l), conv(v1h, v1l)


def uniform2_f32(pkey, master_key, counter):
    """Two float32 uniforms in (0,1) per lane (TPU fast path).

    Uses the high 32 bits of each 64-bit output word:  u = hi*2^-32 + 2^-33.
    Statistically equivalent to the f64 mapping (agrees to ~1e-8), strictly
    inside (0,1) so log(u) is always finite.
    """
    v0h, _, v1h, _ = raw_draw(pkey, master_key, counter)

    def conv(hi):
        # u32 -> f32 via 16-bit halves: both halves are exact in f32 and
        # the single rounding of their sum equals a direct round-nearest
        # u32 cast bit-for-bit — but uses only i32->f32 casts, which is
        # what Mosaic (Pallas TPU) supports.
        hi_top = (hi >> np.uint32(16)).astype(jnp.int32).astype(jnp.float32)
        hi_low = (hi & np.uint32(0xFFFF)).astype(jnp.int32).astype(
            jnp.float32)
        as_f32 = hi_top * np.float32(65536.0) + hi_low
        return as_f32 * np.float32(_FACTOR32_HI) + np.float32(
            np.ldexp(1.0, -33))

    return conv(v0h), conv(v1h)


def uniform2(pkey, master_key, counter, dtype):
    """Dtype-dispatching pair draw."""
    if jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        return uniform2_f32(pkey, master_key, counter)
    return uniform2_f64(pkey, master_key, counter)


# ----------------------------------------------------------------------------
# Pure-Python oracle (ints) — used by unit tests to pin the JAX implementation
# and by the host-side tooling.  Kept here so there is exactly one statement
# of the algorithm's constants.
# ----------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1


def threefry2x64_py(ctr: tuple[int, int], key: tuple[int, int],
                    rounds: int = N_ROUNDS) -> tuple[int, int]:
    """Reference implementation on Python ints (arbitrary precision)."""
    ks = [key[0] & _MASK64, key[1] & _MASK64, 0]
    ks[2] = (0x1BD11BDAA9FC1A22 ^ ks[0] ^ ks[1]) & _MASK64
    x0 = (ctr[0] + ks[0]) & _MASK64
    x1 = (ctr[1] + ks[1]) & _MASK64
    for r in range(rounds):
        x0 = (x0 + x1) & _MASK64
        rot = _ROTATIONS[r % 8]
        x1 = ((x1 << rot) | (x1 >> (64 - rot))) & _MASK64
        x1 ^= x0
        if (r + 1) % 4 == 0:
            j = (r + 1) // 4
            x0 = (x0 + ks[j % 3]) & _MASK64
            x1 = (x1 + ks[(j + 1) % 3] + j) & _MASK64
    return x0, x1


def uniform2_py(pkey: int, master_key: int, counter: int) -> tuple[float, float]:
    """The reference's draw → (0,1) double mapping, on Python floats."""
    v0, v1 = threefry2x64_py((counter, 0), (pkey, master_key))
    return (v0 * _FACTOR64 + _HALF_FACTOR64, v1 * _FACTOR64 + _HALF_FACTOR64)


# ----------------------------------------------------------------------------
# PCG64si (pcg_oneseq_64_rxs_m_xs_64) — the RNG scheme of the reference's
# oacc/raja backends (reference: oacc/neutral.c:710-719 seeds a fresh
# generator per draw with seed = counter + 1e15*master_key + 1e4*pid).
# PCG is a public algorithm (M.E. O'Neill); this is an independent
# implementation on uint32 pairs, validated against vectors produced by the
# reference's vendored header.  Selected via rng_scheme="pcg64si".
# ----------------------------------------------------------------------------

_PCG_MULT = 6364136223846793005
_PCG_INC = 1442695040888963407
_PCG_OUT_MULT = 12605985483714917081
_MASTER_KEY_OFF = 10 ** 15
_PARTICLE_KEY_OFF = 10 ** 4


def pcg64si_py(seed: int) -> int:
    """First output of a freshly seeded PCG64si stream (Python ints)."""
    state = ((_PCG_INC + seed) * _PCG_MULT + _PCG_INC) & _MASK64
    word = (((state >> ((state >> 59) + 5)) ^ state) * _PCG_OUT_MULT) \
        & _MASK64
    return ((word >> 43) ^ word) & _MASK64


def pcg64si_pair_py(seed: int) -> tuple[int, int]:
    """First two outputs of a freshly seeded PCG64si stream."""
    s0 = ((_PCG_INC + seed) * _PCG_MULT + _PCG_INC) & _MASK64
    s1 = (s0 * _PCG_MULT + _PCG_INC) & _MASK64

    def out(state):
        word = (((state >> ((state >> 59) + 5)) ^ state) * _PCG_OUT_MULT) \
            & _MASK64
        return ((word >> 43) ^ word) & _MASK64

    return out(s0), out(s1)


def uniform2_pcg_py(pkey: int, master_key: int, counter: int):
    """Pair draw under the pcg64si scheme (consecutive per-draw seeds).

    The reference's pcg backends draw ONE double per seeded generator with
    a per-draw counter; this framework consumes uniforms in pairs, so pair
    p uses draw counters (2p, 2p+1).  The generator, seeding formula and
    (0,1) mapping are exactly the reference's; only the draw bookkeeping
    follows this framework's pair-based event scheme (the reference's own
    backends agree only statistically across RNG schemes too).
    """
    base = (_MASTER_KEY_OFF * master_key + _PARTICLE_KEY_OFF * pkey
            + 2 * counter) & _MASK64
    v0 = pcg64si_py(base)
    v1 = pcg64si_py((base + 1) & _MASK64)
    return (v0 * _FACTOR64 + _HALF_FACTOR64,
            v1 * _FACTOR64 + _HALF_FACTOR64)


# -- uint32-pair building blocks ---------------------------------------------

def _mul32x32(a, b):
    """Full 64-bit product of two u32 arrays as (hi, lo) u32."""
    m16 = _u32(0xFFFF)
    a0 = a & m16
    a1 = a >> _u32(16)
    b0 = b & m16
    b1 = b >> _u32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> _u32(16)) + (p01 & m16) + (p10 & m16)
    lo = (p00 & m16) | ((mid & m16) << _u32(16))
    hi = p11 + (p01 >> _u32(16)) + (p10 >> _u32(16)) + (mid >> _u32(16))
    return hi, lo


def _mul64_lo(ahi, alo, bhi, blo):
    """(a * b) mod 2^64 on (hi, lo) u32 pairs."""
    hi, lo = _mul32x32(alo, blo)
    hi = hi + alo * bhi + ahi * blo
    return hi, lo


def _shr64_dyn(hi, lo, r):
    """(hi, lo) >> r for per-lane shift amounts r in [1, 63]."""
    big = r >= _u32(32)
    rs = r & _u32(31)
    nz = rs > _u32(0)
    inv = (_u32(32) - rs) & _u32(31)
    lo_small = (lo >> rs) | jnp.where(nz, hi << inv, _u32(0))
    hi_small = jnp.where(nz, hi >> rs, hi)
    lo_small = jnp.where(nz, lo_small, lo)
    lo_big = jnp.where(nz, hi >> rs, hi)
    return (jnp.where(big, _u32(0), hi_small),
            jnp.where(big, lo_big, lo_small))


_PCG_MULT_HI = np.uint32(_PCG_MULT >> 32)
_PCG_MULT_LO = np.uint32(_PCG_MULT & 0xFFFFFFFF)
_PCG_INC_HI = np.uint32(_PCG_INC >> 32)
_PCG_INC_LO = np.uint32(_PCG_INC & 0xFFFFFFFF)
_PCG_OMULT_HI = np.uint32(_PCG_OUT_MULT >> 32)
_PCG_OMULT_LO = np.uint32(_PCG_OUT_MULT & 0xFFFFFFFF)
_MKOFF_HI = np.uint32(_MASTER_KEY_OFF >> 32)
_MKOFF_LO = np.uint32(_MASTER_KEY_OFF & 0xFFFFFFFF)


def _pcg_step(hi, lo):
    hi, lo = _mul64_lo(hi, lo, _PCG_MULT_HI, _PCG_MULT_LO)
    return _add64(hi, lo, _PCG_INC_HI, _PCG_INC_LO)


def _pcg_out(hi, lo):
    """rxs_m_xs_64 output permutation on (hi, lo) u32 pairs."""
    r = (hi >> _u32(27)) + _u32(5)          # (state >> 59) + 5
    shi, slo = _shr64_dyn(hi, lo, r)
    xhi = shi ^ hi
    xlo = slo ^ lo
    whi, wlo = _mul64_lo(xhi, xlo, _PCG_OMULT_HI, _PCG_OMULT_LO)
    # (word >> 43) has zero hi word and lo = whi >> 11
    return whi, wlo ^ (whi >> _u32(11))


def pcg64si_first(seed_hi, seed_lo):
    """First PCG64si output of freshly seeded streams (u32-pair arrays)."""
    s0h, s0l = _add64(_PCG_INC_HI, _PCG_INC_LO, seed_hi, seed_lo)
    s0h, s0l = _pcg_step(s0h, s0l)
    return _pcg_out(s0h, s0l)


def pcg64si_raw(seed_hi, seed_lo):
    """First outputs of streams seeded `seed` and `seed + 1`.

    The reference's pcg backends seed a FRESH generator per draw with an
    incrementing counter (oacc/neutral.c:710-719); a pair draw therefore
    uses two consecutive seeds, not two outputs of one stream.
    """
    a_hi, a_lo = pcg64si_first(seed_hi, seed_lo)
    s1h, s1l = _add64(seed_hi, seed_lo, _u32(0), _u32(1))
    b_hi, b_lo = pcg64si_first(s1h, s1l)
    return a_hi, a_lo, b_hi, b_lo


def _pcg_pair_seed(pkey, master_key, counter):
    """seed = 1e15*mk + 1e4*pid + 2*counter as a (hi, lo) u32 pair."""
    p_hi, p_lo = _split64(pkey)
    m_hi, m_lo = _split64(master_key)
    c_hi, c_lo = _split64(counter)
    s_hi, s_lo = _mul64_lo(m_hi, m_lo, _MKOFF_HI, _MKOFF_LO)
    k_hi, k_lo = _mul64_lo(p_hi, p_lo, _u32(0), _u32(_PARTICLE_KEY_OFF))
    s_hi, s_lo = _add64(s_hi, s_lo, k_hi, k_lo)
    # 2 * counter
    c2_hi = (c_hi << _u32(1)) | (c_lo >> _u32(31))
    c2_lo = c_lo << _u32(1)
    return _add64(s_hi, s_lo, c2_hi, c2_lo)


def uniform2_pcg_f64(pkey, master_key, counter):
    """Two float64 uniforms under the pcg64si scheme (bit-exact)."""
    sh, sl = _pcg_pair_seed(pkey, master_key, counter)
    a_hi, a_lo, b_hi, b_lo = pcg64si_raw(sh, sl)

    def conv(hi, lo):
        v = (hi.astype(jnp.uint64) << 32) | lo.astype(jnp.uint64)
        return v.astype(jnp.float64) * _FACTOR64 + _HALF_FACTOR64

    return conv(a_hi, a_lo), conv(b_hi, b_lo)


def uniform2_pcg_f32(pkey, master_key, counter):
    """Two float32 uniforms under the pcg64si scheme (TPU fast path)."""
    sh, sl = _pcg_pair_seed(pkey, master_key, counter)
    a_hi, _, b_hi, _ = pcg64si_raw(sh, sl)

    def conv(hi):
        hi_top = (hi >> np.uint32(16)).astype(jnp.int32).astype(jnp.float32)
        hi_low = (hi & np.uint32(0xFFFF)).astype(jnp.int32).astype(
            jnp.float32)
        as_f32 = hi_top * np.float32(65536.0) + hi_low
        return as_f32 * np.float32(_FACTOR32_HI) + np.float32(
            np.ldexp(1.0, -33))

    return conv(a_hi), conv(b_hi)


def uniform2_scheme(pkey, master_key, counter, dtype, scheme: str):
    """Scheme- and dtype-dispatching pair draw."""
    if scheme == "pcg64si":
        if jnp.dtype(dtype) == jnp.dtype(jnp.float32):
            return uniform2_pcg_f32(pkey, master_key, counter)
        return uniform2_pcg_f64(pkey, master_key, counter)
    return uniform2(pkey, master_key, counter, dtype)
