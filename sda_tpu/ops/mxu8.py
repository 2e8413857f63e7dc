"""Pallas kernel, generation 4: byte-limb (base-256) fused share+combine.

Successor to :mod:`sda_tpu.ops.mxu_kernel` (the 7-bit-limb generation),
motivated by on-chip decomposition measurements: the 7-bit kernel runs at
the DMA floor *without* randomness and is compute-bound once the in-kernel
PRNG accumulation joins. This generation attacks both poles at once:

1. **Byte limbs in HBM.** Field elements stream as ``L8 = 2*L16`` raw bytes
   — the canonical 16-bit-limb representation split into bytes, i.e. the
   information floor for the field (8 bytes for a 64-bit prime vs 9+ with
   7-bit limbs). Zero unpack cost: each byte IS the int8 MXU operand.
2. **Biased-digit algebra.** int8 is signed, bytes are not. Every operand
   byte is stored ``b ^ 0x80`` (two's-complement ``b - 128``) and every
   matrix entry ``e`` as ``e - 128``; one synthetic **ones column** in the
   matrix recovers the exact unbiased contraction::

       true[col] = acc[col] + 128 * acc[ones] + C[col],
       C[col]    = 128 * sum_rows e[row, col]   (host-precomputed constant)

   so the bias never leaks into results while both operands use the full
   signed byte range. Padding rows/lanes are algebra-exact for free (their
   true entries/values are 0).
3. **Base-256 epilogue.** Accumulator columns carry weights ``2^(8*l2)``:
   carry-propagation is byte shifts, and regrouping into canonical 16-bit
   lanes never straddles a lane boundary (two bytes per lane, exactly).
   When reconstruction is fused in-kernel, stage 1 skips canonicalisation
   entirely — its carry-propagated bytes feed the second matmul directly,
   and only the tiny ``k``-wide stage-2 result is Montgomery-folded.
4. **u16-field randomness accumulation.** The per-participant raw
   randomness (the dominant VPU cost of the previous generation) is summed
   over participants as two u16 fields per PRNG word — 2 VPU ops per 16
   random bits instead of 5 per 14 — and the field sums fit u32 for any
   realistic participant count, so the old 129-participant carry-save
   groups disappear. Field sums re-split into biased byte limbs feed one
   participant-count-independent matmul against the pre-shifted reduced
   matrix (same linearity collapse as the previous generation:
   ``sum_p R*rand_p = R*(sum_p rand_p)``; every participant's randomness is
   still drawn in full).

Layout: identical planar scheme to mxu_kernel — batch positions are lanes,
secrets arrive ``[P*slots*L8, NBP] int8`` (participant-major, then slot,
then byte), output is ``[n_out, L16, NBP]`` canonical u32 limbs.

Reference hot loops this replaces: share generation batched.rs:19-52 /
packed_shamir.rs:40-44 and the clerk combine combiner.rs:16-29.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sda_tpu.ops.limbs import LimbContext, to_limbs

__all__ = [
    "Mxu8Context",
    "fused_share_combine_mxu8",
    "planar8_from_batched",
    "batched_from_planar_lm",
    "limbs8_host",
]

_W8 = 8
_MASK8 = (1 << _W8) - 1
_W16 = 16
_MASK16 = (1 << _W16) - 1
_BIAS = 128


def limbs8_host(values, L8: int) -> np.ndarray:
    """Host: object/int array -> ``[..., L8]`` uint8 byte limbs."""
    arr = np.asarray(values, dtype=object)
    flat = arr.reshape(-1)
    out = np.zeros((flat.size, L8), dtype=np.uint8)
    for i, v in enumerate(flat):
        v = int(v)
        if v < 0:
            raise ValueError("limbs8_host requires non-negative values")
        for j in range(L8):
            out[i, j] = v & _MASK8
            v >>= _W8
        if v:
            raise ValueError("value does not fit limb count")
    return out.reshape(arr.shape + (L8,))


@dataclass(frozen=True)
class Mxu8Context:
    """Per-modulus constants for the byte-limb MXU path.

    ``L8``: bytes per canonical element (= ``2 * ctx.L``, the 16-bit limbs
    split in half); ``chunk8``: bytes per canonical-by-construction chunk
    (``2^(8*chunk8) <= p``); ``L16r``: u16 randomness limbs per sharing-
    randomness slot (fold width, see :meth:`create` for the bias law and
    the accepted trade-off at the default ``rand_fold_k=1``).
    """

    ctx: LimbContext
    L8: int
    chunk8: int
    L16r: int
    special: tuple[int, int] | None = None  # (e, c) when p = 2^e - c

    @classmethod
    def create(cls, ctx: LimbContext, rand_fold_k: int = 1) -> "Mxu8Context":
        p = ctx.p
        if p.bit_length() <= _W8:
            raise ValueError("modulus too small for byte-limb chunking")
        e = p.bit_length()
        c = (1 << e) - p
        # pseudo-Mersenne fast reduction: see _fold8_special. c must keep
        # the per-half products in u32, and bit e must live inside the lanes
        special = (e, c) if c < (1 << 14) and e < _W16 * ctx.L else None
        # Randomness-fold width. Folding a uniform b-bit draw mod p has
        # total-variation bias ~rem/2^b with rem = 2^b mod p. For
        # pseudo-Mersenne p = 2^e - c, repeated reduction 2^e = c (mod p)
        # gives rem = c^j * 2^(b - j*e) for the largest j with
        # c^j * 2^(b-j*e) < p — so the bias is a STAIRCASE in b: it stays
        # ~c/2^e for all b in [e, 2e - log2(c)), then drops to ~(c/2^e)^2,
        # and in general e-sized width steps SQUARE the bias down (it is
        # NOT independent of b; only the plateau within each step is).
        # Default rand_fold_k=1 takes the minimal width b = k*e rounded up
        # to u16 limbs, an explicit accepted trade-off: bias ~c/2^e
        # (~2^-53 at the 63-bit production prime, ~2^-116 at the 128-bit
        # one), which halves the PRNG + accumulate traffic vs the 2e-bit
        # width. This path generates device-trust benchmark/serving
        # sharing randomness only — host-CSPRNG randomness (the protocol
        # security path) never uses it. rand_fold_k=2 restores b >= 2e
        # (bias ~(c/2^e)^2 ~ 2^-106 at 63 bits) at double the PRNG cost.
        # Generic primes keep 64 guard bits for the standard
        # rem/2^b <= p/2^b <= 2^-64 bound.
        if rand_fold_k < 1:
            raise ValueError("rand_fold_k must be >= 1")
        if special is not None:
            L16r = -(-(rand_fold_k * e + 1) // _W16)
        else:
            L16r = -(-(p.bit_length() + 64) // _W16) + (rand_fold_k - 1) * (
                -(-p.bit_length() // _W16)
            )
        return cls(
            ctx=ctx,
            L8=2 * ctx.L,
            chunk8=(p.bit_length() - 1) // _W8,
            L16r=L16r,
            special=special,
        )

    @property
    def rand_words(self) -> int:
        """u32 PRNG words per (participant, randomness slot) — two u16
        randomness limbs per word."""
        return -(-self.L16r // 2)


def planar8_from_batched(mxu8: Mxu8Context, x16, lanes: int):
    """``[P, NB, s, L16] u32 -> [P*s*L8, NBP] int8`` biased planar bytes.

    ``NBP`` rounds ``NB`` up to a multiple of ``lanes``. Padding lanes hold
    biased zero (0x80 -> -128), which the ones-column algebra treats as the
    value 0 exactly. Row order is participant-major, then slot, then byte.
    """
    p, nb, s, _ = x16.shape
    bytes_ = [
        (((x16[..., j // 2] >> (_W8 * (j % 2))) & _MASK8) ^ _BIAS).astype(jnp.int8)
        for j in range(mxu8.L8)
    ]
    x8 = jnp.stack(bytes_, axis=-1)  # [P, NB, s, L8]
    nbp = -(-nb // lanes) * lanes
    if nbp != nb:
        x8 = jnp.pad(x8, ((0, 0), (0, nbp - nb), (0, 0), (0, 0)),
                     constant_values=-_BIAS)
    return jnp.transpose(x8, (0, 2, 3, 1)).reshape(p * s * mxu8.L8, nbp)


def batched_from_planar_lm(y, nb: int, n_out: int):
    """``[L16 * n_out, NBP] -> [NB, n_out, L16]`` (limb-major kernel output
    back to the batched layout, slicing the lane padding off)."""
    L = y.shape[0] // n_out
    return jnp.transpose(y.reshape(L, n_out, -1), (2, 1, 0))[:nb]


def _reduced_row8(mxu8: Mxu8Context, m_col, shift: int) -> np.ndarray:
    """Unbiased entries ``limb8_l2(m_col[i] * 2^shift mod p)``: ``[n*L8]``
    uint8 for every output column ``(i, l2)``."""
    p = mxu8.ctx.p
    vals = [(int(v) * pow(2, shift, p)) % p for v in m_col]
    return limbs8_host(np.array(vals, dtype=object), mxu8.L8).reshape(-1)


def _finish_big8(e_cols: np.ndarray, n_pad: int):
    """Unbiased entry matrix ``[rows, n*L8]`` -> (biased int8 ``[n_pad,
    rows]`` with the ones column at ``n*L8``, per-column bias constant
    ``C = 128 * colsum(e)`` as int64 ``[n*L8]``)."""
    rows, cols = e_cols.shape
    if cols + 1 > n_pad:
        raise ValueError("n_pad too small")
    big = np.zeros((n_pad, rows), dtype=np.int8)
    big[:cols] = (e_cols.astype(np.int16) - _BIAS).astype(np.int8).T
    big[cols] = 1  # ones column: acc[ones] = sum of biased operand values
    C = _BIAS * e_cols.astype(np.int64).sum(axis=0)
    return big, C


def _big8_slots(mxu8: Mxu8Context, m_normal, slot_rows, n_pad: int,
                limb_major: bool = False):
    """Reduced biased ``big^T [n_pad, rows]`` for per-slot byte operands.

    Row for (slot ``j``, byte ``l1``) holds ``limb8_l2(M[j,i]*2^(8*l1) mod
    p) - 128`` at column ``(i, l2)``. ``limb_major`` orders rows ``(l1,
    j)`` (the layout the in-kernel carry chain emits without a sublane
    transpose); default is ``(j, l1)`` slot-major matching
    :func:`planar8_from_batched`.
    """
    m_normal = np.asarray(m_normal, dtype=object)
    n = m_normal.shape[1]
    L8 = mxu8.L8
    cache: dict[tuple[int, int], np.ndarray] = {}

    def reduced(j, l1):
        got = cache.get((j, l1))
        if got is None:
            got = _reduced_row8(mxu8, m_normal[j], _W8 * l1)
            cache[(j, l1)] = got
        return got

    if limb_major:
        order = [(j, l1) for l1 in range(L8) for j in slot_rows]
    else:
        order = [(j, l1) for j in slot_rows for l1 in range(L8)]
    e = np.stack([reduced(j, l1) for j, l1 in order])  # [rows, n*L8]
    return _finish_big8(e, n_pad)


def _big8_randsum(mxu8: Mxu8Context, m_normal, k: int, rand_count: int,
                  n_pad: int, words_per_p: int, n_bytes: int):
    """Reduced biased matrix for the summed-randomness operand.

    The kernel sums each PRNG word's two u16 halves over participants
    (``accE`` = low halves = u16 limb index ``2w``, ``accO`` = high = ``2w
    + 1``) and re-splits each field sum into ``n_bytes`` biased bytes. Row
    ``(c, parity, w)`` of the operand therefore carries u16 limb ``f = 2w +
    parity`` of randomness slot ``k + f // L16r`` with weight ``2^(16*(f %
    L16r) + 8*c)``. Limb positions past ``rand_count * L16r`` are padding
    (true entry 0 — algebra-exact under the biased scheme).
    """
    m_normal = np.asarray(m_normal, dtype=object)
    n = m_normal.shape[1]
    L16r = mxu8.L16r
    rows = []
    zero = np.zeros(n * mxu8.L8, dtype=np.uint8)
    cache: dict[tuple[int, int], np.ndarray] = {}
    for c in range(n_bytes):
        for parity in (0, 1):
            for w in range(words_per_p):
                f = 2 * w + parity
                if f >= rand_count * L16r:
                    rows.append(zero)
                    continue
                slot, l1 = k + f // L16r, f % L16r
                key = (slot, _W16 * l1 + _W8 * c)
                got = cache.get(key)
                if got is None:
                    got = _reduced_row8(mxu8, m_normal[slot], key[1])
                    cache[key] = got
                rows.append(got)
    return _finish_big8(np.stack(rows), n_pad)


def _chunk_consts8(mxu8: Mxu8Context, n_chunks: int) -> np.ndarray:
    """SMEM table ``[n_chunks, L16]``: Montgomery-form ``2^(8*chunk8*t)``."""
    ctx = mxu8.ctx
    R = 1 << (_W16 * ctx.L)
    vals = [
        (pow(2, _W8 * mxu8.chunk8 * t, ctx.p) * R) % ctx.p for t in range(n_chunks)
    ]
    return to_limbs(np.array(vals, dtype=object), ctx.L).astype(np.uint32)


def _residual_limbs(row_bound: int) -> int:
    """Byte limbs needed for the steady-state carry of a chain whose
    columns are bounded by ``row_bound`` (carry ``<= row_bound / 255``)."""
    return max(1, -(-((row_bound // 255) + 1).bit_length() // _W8))


def _true_chain(acc_cols, c_ref, s128, n_res: int):
    """Biased accumulator columns -> nonneg byte limbs of the true value.

    ``acc_cols [n, L8, T] int32`` (biased contraction), ``c_ref [n, L8]``
    uint32 bias constants (VMEM), ``s128 [1, T]`` = 128 * ones-column row.
    Returns ``L8 + n_res`` arrays ``[n, T]`` in ``[0, 256)``: the base-256
    digits of ``true[i] = sum_c (acc[i,c] + C[i,c] + s128) * 2^(8c)``.

    The chain runs in **uint32**: the biased int32 accumulator wraps to its
    residue mod 2^32, and since every true column value is non-negative and
    bounded by ``K_rows * 255^2 < 2^32``, the mod-2^32 sum IS the true
    value exactly. (An int32 chain would cap ``K_rows`` at half the
    participants for no reason — the sign bit carries real magnitude here.)
    """
    n, L8, _ = acc_cols.shape
    acc_u = acc_cols.astype(jnp.uint32)
    s128_u = s128.astype(jnp.uint32)
    limbs = []
    carry = s128_u * 0  # [1, T] zeros, broadcasts against [n, T]
    for c in range(L8):
        t = acc_u[:, c, :] + c_ref[:, c : c + 1] + s128_u + carry
        limbs.append(t & _MASK8)
        carry = t >> _W8
    for _ in range(n_res):
        limbs.append(carry & _MASK8)
        carry = carry >> _W8
    return limbs


def _fold8_special(mxu8: Mxu8Context, limbs):
    """Pseudo-Mersenne canonicalisation: byte limbs -> L16 u32 lanes.

    For ``p = 2^e - c`` (small ``c``), ``V mod p`` needs no Montgomery
    multiplies: ``V = lo + 2^e * hi ≡ lo + c * hi``. Two fold rounds bring
    any ``V < 2^(e+31)`` under ``2^e + c``, then one conditional subtract
    lands in ``[0, p)``. ~20 cheap u32 ops per output vs ~2 full CIOS
    Montgomery multiplies — this is why the flagship configurations pick
    pseudo-Mersenne NTT primes (fields.find_special_prime_field).
    """
    ctx = mxu8.ctx
    e, c = mxu8.special
    L = ctx.L
    zero = jnp.zeros_like(limbs[0], dtype=jnp.uint32)
    lanes = []
    for w in range(-(-len(limbs) // 2)):
        v = limbs[2 * w].astype(jnp.uint32)
        if 2 * w + 1 < len(limbs):
            v = v | (limbs[2 * w + 1].astype(jnp.uint32) << _W8)
        lanes.append(v)
    wE, sh = e // _W16, e % _W16
    for _round in range(2):
        hi = lanes[wE] >> sh
        bits = _W16 - sh
        for w in range(wE + 1, len(lanes)):
            hi = hi | (lanes[w] << bits)
            bits += _W16
        lanes = lanes[:wE] + [lanes[wE] & ((1 << sh) - 1)]
        lanes += [zero] * (L - len(lanes))
        # V mod p = lo + hi*c; halves keep every product inside u32
        add0 = (hi & _MASK16) * c
        add1 = (hi >> _W16) * c
        incoming = (add0 & _MASK16, (add0 >> _W16) + (add1 & _MASK16), add1 >> _W16)
        carry = zero
        for w in range(L):
            t = lanes[w] + (incoming[w] if w < 3 else zero) + carry
            lanes[w] = t & _MASK16
            carry = t >> _W16
    return ctx._cond_sub(lanes[:L], zero)


def _fold8(mxu8: Mxu8Context, consts_ref, limbs):
    """Byte limbs (list of nonneg ``[n, T]``) -> canonical L16 u32 lanes.

    Chunks of ``chunk8`` bytes are canonical by construction (< 2^(8*chunk8)
    <= p); each regroups into 16-bit lanes with no straddling (two bytes
    per lane) and folds via one Montgomery multiply per chunk — or, for
    pseudo-Mersenne moduli, the multiply-free :func:`_fold8_special`.
    """
    if mxu8.special is not None and _W8 * len(limbs) - mxu8.special[0] <= 31:
        return _fold8_special(mxu8, limbs)
    ctx = mxu8.ctx
    n_chunks = -(-len(limbs) // mxu8.chunk8)
    zero = jnp.zeros_like(limbs[0], dtype=jnp.uint32)
    res = None
    for t in range(n_chunks):
        group = limbs[t * mxu8.chunk8 : (t + 1) * mxu8.chunk8]
        lanes16 = [zero] * ctx.L
        for j, b in enumerate(group):
            lanes16[j // 2] = lanes16[j // 2] | (
                b.astype(jnp.uint32) << (_W8 * (j % 2))
            )
        term = ctx.mont_mul_lanes(
            lanes16, [consts_ref[t, l] for l in range(ctx.L)]
        )
        res = term if res is None else ctx.add_mod_lanes(res, term)
    return res


def _chunk_canonical(
    mxu8, n, rand_cfg, n2, n_res1, n_res2,
    consts_ref, bigs_ref, bigr_ref, big2_ref, c1_ref, c2_ref,
    sec_block, seed_val,
):
    """One chunk's full pipeline: biased contraction (+ in-kernel summed
    randomness) -> carry chain -> optional fused stage-2 -> canonical L16
    u32 lanes. Returns a list of ``ctx.L`` arrays ``[n_out, T]``."""
    acc = jax.lax.dot_general(
        bigs_ref[...], sec_block, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    L8 = mxu8.L8
    if rand_cfg:
        p_count, words_per_p, pg, n_bytes = rand_cfg
        T = sec_block.shape[-1]
        pltpu.prng_seed(seed_val)
        accR = jnp.zeros((words_per_p, T), jnp.uint32)
        accO = jnp.zeros((words_per_p, T), jnp.uint32)
        for _ in range(p_count // pg):
            w = pltpu.bitcast(
                pltpu.prng_random_bits((pg * words_per_p, T)), jnp.uint32
            ).reshape(pg, words_per_p, T)
            # 3 VPU ops per word (down from 4): accumulate the RAW word and
            # its high half; the low-half sum is recovered once per block
            # below. Unrolled (no unsigned-reduce lowering). This loop is
            # the binding compute stream of the small-P lane-batched
            # serving shape (LANE_BATCH_FLOOR.json).
            for j in range(pg):
                accR = accR + w[j]
                accO = accO + (w[j] >> _W16)
        # accR = sum(lo) + 2^16*sum(hi) mod 2^32 and sum(lo) < 2^32 (the
        # carry-chain bound caps p_count at 65793), so the u32 wrap
        # subtraction is exact
        accE = accR - (accO << _W16)
        parts = []
        for c in range(n_bytes):
            for s in (accE, accO):
                parts.append(
                    ((((s >> (_W8 * c)) & _MASK8) ^ _BIAS)).astype(jnp.int8)
                )
        rand2 = jnp.concatenate(parts, axis=0)  # [n_bytes*2*words_per_p, T]
        acc = acc + jax.lax.dot_general(
            bigr_ref[...], rand2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    s128 = acc[n * L8 : n * L8 + 1, :] * _BIAS  # ones column -> [1, T]
    limbs = _true_chain(acc[: n * L8].reshape(n, L8, -1), c1_ref, s128, n_res1)
    if n2:
        # fused reconstruction: stage-1 bytes feed the second matmul
        # directly (limb-major concat, no canonicalisation, no transpose)
        c8 = jnp.concatenate(
            [(b ^ _BIAS).astype(jnp.int8) for b in limbs], axis=0
        )
        acc2 = jax.lax.dot_general(
            big2_ref[...], c8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s128_2 = acc2[n2 * L8 : n2 * L8 + 1, :] * _BIAS
        limbs = _true_chain(
            acc2[: n2 * L8].reshape(n2, L8, -1), c2_ref, s128_2, n_res2
        )
    return _fold8(mxu8, consts_ref, limbs)


def _mxu8_kernel(
    mxu8, n, rand_cfg, n2, n_res1, n_res2,
    seed_ref, consts_ref, bigs_ref, bigr_ref, big2_ref, c1_ref, c2_ref,
    sec_ref, out_ref,
):
    ctx = mxu8.ctx
    res = _chunk_canonical(
        mxu8, n, rand_cfg, n2, n_res1, n_res2,
        consts_ref, bigs_ref, bigr_ref, big2_ref, c1_ref, c2_ref,
        sec_ref[...], seed_ref[0] + pl.program_id(0),
    )
    n_out = n2 if n2 else n
    for l in range(ctx.L):
        # 2D limb-major output: out row block (l*n_out .. ) takes res[l]
        # as one contiguous [n_out, T] write (a 3D [n, L, T] block would
        # make every write a sublane scatter across L tiles — measured
        # ~0.8 ms/step slower at the headline shape)
        out_ref[l * n_out : (l + 1) * n_out, :] = res[l]


def _mxu8_kernel_acc(
    mxu8, n, rand_cfg, n2, n_res1, n_res2,
    seed_ref, consts_ref, bigs_ref, bigr_ref, big2_ref, c1_ref, c2_ref,
    sec_ref, acc_ref, out_ref,
):
    """Streaming variant: adds this chunk's canonical result onto a running
    accumulator (``acc_ref``, aliased to the output buffer) — one launch
    per streamed chunk with no separate add kernel and no extra HBM round
    trip for the accumulator."""
    ctx = mxu8.ctx
    res = _chunk_canonical(
        mxu8, n, rand_cfg, n2, n_res1, n_res2,
        consts_ref, bigs_ref, bigr_ref, big2_ref, c1_ref, c2_ref,
        sec_ref[...], seed_ref[0] + pl.program_id(0),
    )
    n_out = n2 if n2 else n
    prev = [acc_ref[l * n_out : (l + 1) * n_out, :] for l in range(ctx.L)]
    summed = ctx.add_mod_lanes(prev, res)
    for l in range(ctx.L):
        out_ref[l * n_out : (l + 1) * n_out, :] = summed[l]


def _mxu8_kernel_chunked(
    mxu8, n, rand_cfg, n2, n_res1, n_res2, n_chunks, grid_t,
    seed_ref, consts_ref, bigs_ref, bigr_ref, big2_ref, c1_ref, c2_ref,
    sec_ref, out_ref, acc_ref,
):
    """Multi-chunk reduction grid: grid ``(lane_blocks, n_chunks)`` with the
    chunk axis innermost. Each step runs one chunk's full pipeline; the
    canonical per-output lanes accumulate mod p in a VMEM scratch and hit
    HBM exactly once, on the last chunk — one kernel launch for a whole
    streamed job instead of ``n_chunks`` kernel + add + reconstruct
    launches. Per-(block, chunk) PRNG seeds are collision-free by
    construction: ``seed + c * grid_t + t`` (every grid step owns a
    distinct offset below ``n_chunks * grid_t``)."""
    ctx = mxu8.ctx
    t, c = pl.program_id(0), pl.program_id(1)
    res = _chunk_canonical(
        mxu8, n, rand_cfg, n2, n_res1, n_res2,
        consts_ref, bigs_ref, bigr_ref, big2_ref, c1_ref, c2_ref,
        sec_ref[...], seed_ref[0] + c * grid_t + t,
    )
    n_out = n2 if n2 else n

    @pl.when(c == 0)
    def _init():
        for l in range(ctx.L):
            acc_ref[l * n_out : (l + 1) * n_out, :] = res[l]

    @pl.when(c > 0)
    def _accumulate():
        prev = [
            acc_ref[l * n_out : (l + 1) * n_out, :] for l in range(ctx.L)
        ]
        summed = ctx.add_mod_lanes(prev, res)
        for l in range(ctx.L):
            acc_ref[l * n_out : (l + 1) * n_out, :] = summed[l]

    @pl.when(c == n_chunks - 1)
    def _emit():
        out_ref[...] = acc_ref[...]


def fused_share_combine_mxu8(
    mxu8: Mxu8Context,
    share_matrix,  # [m, n] canonical (normal-domain) host matrix
    sec_planar,  # [n_chunks*P*slots*L8, NBP] int8 biased (slots = k or m)
    p_count: int,
    k: int,
    rand_count: int,
    seed=0,
    lanes: int = 1024,
    reconstruct_matrix=None,  # optional [n, k2]: fuse the second modmat
    pg: int | None = None,
    n_chunks: int = 1,
    acc_in=None,  # optional [L16*n_out, NBP] u32: running canonical sums
    interpret: bool = False,
    rand_participants: int | None = None,
):
    """Byte-limb fused MXU share+combine (+ optional fused reconstruct).

    Returns ``[L16 * n_out, NBP]`` canonical u32 limbs, **limb-major**: row
    ``l * n_out + i`` is 16-bit limb ``l`` of output ``i`` (``n_out = n``,
    or ``k2`` with ``reconstruct_matrix``) — reshape to ``[L16, n_out,
    NBP]`` to index. If ``sec_planar`` carries ``k`` slots per participant,
    sharing randomness is drawn raw in-kernel from ``seed`` (u16-limb
    uniform folded mod p at the width ``Mxu8Context.create`` proves
    optimal — a benchmark/device-trust device; host-CSPRNG canonical
    randomness uses ``k + rand_count`` slots and leaves the PRNG unused).
    ``pg``: participants per PRNG draw (default: largest divisor of
    ``p_count`` up to 8).

    ``n_chunks > 1``: ``sec_planar`` stacks that many ``p_count``-participant
    chunks along the row axis and the whole job runs as ONE launch on a
    ``(lane_blocks, n_chunks)`` reduction grid — each chunk stays inside the
    int32 accumulator bound, canonical sums accumulate in VMEM scratch, and
    (with ``reconstruct_matrix``, by linearity of the reconstruction) only
    the final ``k2``-wide result ever reaches HBM. Total participants =
    ``n_chunks * p_count``.

    ``acc_in``: running canonical sums for host-driven streaming (chunks
    too large to stack in HBM): the kernel adds this chunk's result onto
    ``acc_in`` in-place (the buffer is aliased to the output), replacing a
    separate add launch and its accumulator round trip. Mutually exclusive
    with ``n_chunks > 1``.
    """
    if acc_in is not None and n_chunks != 1:
        raise ValueError("acc_in accumulation requires n_chunks == 1")
    interpret = interpret or jax.default_backend() == "cpu"
    m = k + rand_count
    share_matrix = np.asarray(share_matrix, dtype=object)
    n = share_matrix.shape[1]
    L8 = mxu8.L8
    all_rows, nbp = sec_planar.shape
    if all_rows % n_chunks:
        raise ValueError("sec_planar rows must divide evenly into n_chunks")
    rows = all_rows // n_chunks
    if nbp % lanes:
        raise ValueError(f"NBP={nbp} must be a multiple of lanes={lanes}")
    if rows == p_count * k * L8:
        has_prng = True
    elif rows == p_count * m * L8:
        has_prng = False
    else:
        raise ValueError("sec_planar rows match neither k nor k+r slots")

    rand_cfg = None
    bigr = np.zeros((32, 32), dtype=np.int8)
    Cr = None
    if has_prng and rand_count:
        # rand_participants: how many independent randomness draws the
        # kernel sums per slot. Default p_count mirrors the protocol
        # workload (every participant draws fresh randomness). Explicitly
        # passing 1 enables the COMBINED-DRAW serving mode: only the
        # combined result ever leaves this kernel, and a sum of P uniform
        # draws mod p is distributionally identical to ONE uniform draw,
        # so one equivalent draw per slot is sound *within the fused
        # combine's trust model* — it cuts the PRNG + accumulate stream
        # (the binding compute at small P, LANE_BATCH_FLOOR.json) by P.
        # Never use it to emit per-participant shares.
        rp = p_count if rand_participants is None else rand_participants
        if rp < 1:
            raise ValueError("rand_participants must be >= 1")
        words_per_p = rand_count * mxu8.rand_words
        # field sums fit u32 for any P < 2^16; byte count covers the sum
        n_bytes = max(2, -(-((rp * _MASK16).bit_length()) // _W8))
        if pg is None:
            pg = max(d for d in range(1, min(8, rp) + 1) if rp % d == 0)
        elif rp % pg:
            raise ValueError("pg must divide rand_participants")
        rand_cfg = (rp, words_per_p, pg, n_bytes)

    slots = list(range(k)) if has_prng else list(range(m))
    n_pad = -(-(n * L8 + 1) // 32) * 32
    bigs, C1 = _big8_slots(
        mxu8, share_matrix, [j for _ in range(p_count) for j in slots], n_pad
    )
    if rand_cfg:
        bigr, Cr = _big8_randsum(
            mxu8, share_matrix, k, rand_count, n_pad,
            rand_cfg[1], rand_cfg[3],
        )
        C1 = C1 + Cr

    # Accumulator / true-value bound: every row contributes at most 255*255
    # to a column's unbiased value and the uint32 carry chain needs
    # column + incoming carry < 2^32 (see _true_chain), i.e.
    # K_rows * (255^2 + 255) < 2^32 -> K_rows <= 65793. (The biased int32
    # dot accumulator binds later, at K_rows <= 131071.)
    K_rows = bigs.shape[1] + (bigr.shape[1] if rand_cfg else 0)
    row_bound = K_rows * _MASK8 * _MASK8
    if K_rows * (_MASK8 * _MASK8 + _MASK8) >= (1 << 32):
        raise ValueError(
            "participants * scheme_size exceeds the uint32 carry-chain "
            "bound; chunk the participant axis (n_chunks / engine "
            "streaming path)"
        )
    n_res1 = _residual_limbs(row_bound)
    C1 = C1.reshape(n, L8)

    n2 = 0
    C2 = np.zeros((1, 1), dtype=np.int64)
    big2 = np.zeros((32, 32), dtype=np.int8)
    n_res2 = 0
    if reconstruct_matrix is not None:
        rec = np.asarray(reconstruct_matrix, dtype=object)
        if rec.shape[0] != n:
            raise ValueError("reconstruct_matrix rows must equal share count")
        n2 = rec.shape[1]
        n_pad2 = -(-(n2 * L8 + 1) // 32) * 32
        # stage-2 operand rows: limb-major over the L8 + n_res1 stage-1
        # bytes; slots are the n clerks, byte weights 2^(8*l1)
        big2, C2 = _big8_stage2(mxu8, rec, n, n2, n_res1, n_pad2)
        row_bound2 = big2.shape[1] * _MASK8 * _MASK8
        n_res2 = _residual_limbs(row_bound2)
        C2 = C2.reshape(n2, L8)

    n_limbs = (L8 + n_res2) if n2 else (L8 + n_res1)
    consts = _chunk_consts8(mxu8, -(-n_limbs // mxu8.chunk8))

    n_out = n2 if n2 else n
    c1_arr = C1.astype(np.uint32)
    c2_arr = C2.astype(np.uint32)
    grid_t = nbp // lanes
    if n_chunks == 1:
        kernel = functools.partial(
            _mxu8_kernel_acc if acc_in is not None else _mxu8_kernel,
            mxu8, n, rand_cfg, n2, n_res1, n_res2,
        )
        grid = (grid_t,)
        sec_spec = pl.BlockSpec(
            (rows, lanes), lambda t: (0, t), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (mxu8.ctx.L * n_out, lanes), lambda t: (0, t),
            memory_space=pltpu.VMEM,
        )
        const_map = lambda t: (0, 0)  # noqa: E731
        scratch_shapes = []
    else:
        kernel = functools.partial(
            _mxu8_kernel_chunked, mxu8, n, rand_cfg, n2, n_res1, n_res2,
            n_chunks, grid_t,
        )
        grid = (grid_t, n_chunks)  # chunk axis innermost
        sec_spec = pl.BlockSpec(
            (rows, lanes), lambda t, c: (c, t), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (mxu8.ctx.L * n_out, lanes), lambda t, c: (0, t),
            memory_space=pltpu.VMEM,
        )
        const_map = lambda t, c: (0, 0)  # noqa: E731
        scratch_shapes = [pltpu.VMEM((mxu8.ctx.L * n_out, lanes), jnp.uint32)]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk consts
        pl.BlockSpec(bigs.shape, const_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(bigr.shape, const_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(big2.shape, const_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(c1_arr.shape, const_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(c2_arr.shape, const_map, memory_space=pltpu.VMEM),
        sec_spec,
    ]
    operands = [
        jnp.asarray([seed], dtype=jnp.int32),
        jnp.asarray(consts),
        jnp.asarray(bigs),
        jnp.asarray(bigr),
        jnp.asarray(big2),
        jnp.asarray(c1_arr),
        jnp.asarray(c2_arr),
        sec_planar,
    ]
    io_aliases = {}
    if acc_in is not None:
        in_specs.append(out_spec)  # acc block-maps exactly like the output
        operands.append(acc_in)
        io_aliases = {len(operands) - 1: 0}  # acc buffer becomes the output
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((mxu8.ctx.L * n_out, nbp), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            # large-P tiles (the epilogue amortizes per participant) need
            # more than the 16 MB default scoped VMEM for double buffering
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=scratch_shapes,
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(*operands)


def _big8_stage2(mxu8: Mxu8Context, rec, n: int, n2: int, n_res1: int,
                 n_pad2: int):
    """Stage-2 (reconstruction) matrix: limb-major rows over the stage-1
    carry-chain output (``L8 + n_res1`` bytes per clerk)."""
    rec = np.asarray(rec, dtype=object)
    rows = []
    cache: dict[int, np.ndarray] = {}
    for l1 in range(mxu8.L8 + n_res1):
        for i in range(n):
            key = (i, l1)
            got = cache.get(key)
            if got is None:
                got = _reduced_row8(mxu8, rec[i], _W8 * l1)
                cache[key] = got
            rows.append(got)
    return _finish_big8(np.stack(rows), n_pad2)
