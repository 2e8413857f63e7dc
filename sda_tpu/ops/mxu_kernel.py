"""Pallas kernel: fused share-generation + clerk-combine on the MXU.

The third-generation hot path (after the jnp pipeline and the VPU/CIOS
Pallas kernel in :mod:`sda_tpu.ops.pallas_kernels`). Built on three facts:

1. The whole "multiply every participant's ext vector by the share matrix
   and sum over participants" step is one integer matmul once field elements
   are split into 7-bit int8 limbs (:mod:`sda_tpu.ops.mxu`) — systolic-array
   work instead of O(2L²) u32 VPU multiplies per product.
2. **Reduced big-matrix**: the limb shift can be pre-multiplied into the
   matrix *mod p*. Instead of the banded ``bigM[(j,l1),(i,lo)] =
   limb_{lo-l1}(M[j,i])`` layout (output stride ``2L7+L7`` redundant
   columns, ~1/3 dense), the kernel contracts against
   ``bigM[(j,l1),(i,l2)] = limb_l2(M[j,i]·2^{7·l1} mod p)`` — every entry is
   a limb of a *canonical* field element, so the output needs only ``L7``
   columns per clerk. For the packed-Shamir(3,8,4) 64-bit scheme this cuts
   the MXU contraction output from 224 to 96 rows (~2.3x less systolic
   work) and halves the carry/Montgomery epilogue (13 limbs / 2 folds
   instead of 31 / 4).
3. Sharing randomness drawn raw (double-width, bias ``<= 2^-(7·L7)``) needs
   **no reduction at all**: the on-chip PRNG's words masked to 7 bits *are*
   uniform raw limbs. Randomness is created in VMEM and consumed by the MXU
   without ever existing in HBM. For the fused (combined-output) path,
   linearity collapses the per-participant randomness contraction:
   ``Σ_p R·rand_p = R·(Σ_p rand_p)``. Every participant's raw limbs are
   still drawn, but they are summed on the VPU in mask-packed u32 lanes
   (two 14-bit carry-save fields per word; ``P ≤ 129`` keeps them
   carry-free), re-split into lo/hi 7-bit limbs, and contracted by ONE
   P-independent matmul. Correctness of the carry-save/bigRsum alignment is
   proven host-side in tests/test_mxu.py::test_randsum_carry_save_alignment
   (reveal-level checks cannot see randomness bugs — any ``R·u'`` cancels
   at reconstruction).

The kernel can also apply a **second modular matmul in-kernel**
(``reconstruct_matrix=``): the canonical per-clerk sums are re-split to
7-bit limbs in VMEM and contracted against the reduced reconstruction
matrix, so the full share→combine→reconstruct pipeline is ONE dispatch and
the combined share tensor never exists in HBM.

Memory traffic per step is therefore just the compact int8 secret limbs in
and the canonical output limbs out; the share tensor, the randomness, and
the redundant int32 accumulators live only in VMEM/registers.

Layout (transposed-planar): batch positions are *lanes*. Secrets arrive as
``[P·k·L7, NBP]`` int8 (slot-major rows), the kernel tiles the lane axis,
computes ``acc[n·L7, T] = bigSᵀ @ sec_tile + bigRᵀ @ rand_tile`` with int32
MXU accumulation, and renormalises each clerk's redundant base-2⁷ columns
in-kernel (carry-propagate → canonical chunks → Montgomery fold, all on
``[T]``-wide row vectors). Output: ``[n, L16, NBP]`` canonical u32 limbs.

Reference hot loops this replaces: share generation batched.rs:19-52 /
packed_shamir.rs:40-44 and the clerk combine combiner.rs:16-29.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sda_tpu.ops.limbs import LimbContext, to_limbs
from sda_tpu.ops.mxu import MxuContext

__all__ = [
    "fused_share_combine_mxu",
    "planar7_from_batched",
    "batched_from_planar16",
]

_W7 = 7
_MASK7 = (1 << _W7) - 1
_W16 = 16
_MASK16 = (1 << _W16) - 1


def planar7_from_batched(mxu: MxuContext, x16, lanes: int):
    """``[P, NB, s, L16] u32 -> [P*s*L7, NBP] int8`` transposed planar limbs.

    ``NBP`` rounds ``NB`` up to a multiple of ``lanes`` (zero batches are
    inert: they share the zero vector and are sliced off after
    reconstruction). Row order is participant-major, then slot, then limb —
    matching :func:`_big_rows`.
    """
    p, nb, s, _ = x16.shape
    x7 = mxu.limbs7_from_16(x16)  # [P, NB, s, L7]
    nbp = -(-nb // lanes) * lanes
    if nbp != nb:
        x7 = jnp.pad(x7, ((0, 0), (0, nbp - nb), (0, 0), (0, 0)))
    return jnp.transpose(x7, (0, 2, 3, 1)).reshape(p * s * mxu.L7, nbp)


def batched_from_planar16(y, nb: int):
    """``[n, L16, NBP] -> [NB, n, L16]`` (slicing the lane padding off)."""
    return jnp.transpose(y, (2, 0, 1))[:nb]


def _reduced_row(mxu: MxuContext, m_col, shift: int) -> np.ndarray:
    """One big-matrix row: ``limb_l2(m_col[i]·2^shift mod p)`` flattened.

    ``m_col``: the ``[n]`` matrix row for one input slot. Returns
    ``[n·L7]`` int8 — the reduced (premultiplied-shift) entries for every
    output column ``(i, l2)``.
    """
    from sda_tpu.ops.mxu import limbs7_host

    p = mxu.ctx.p
    vals = [(int(v) * pow(2, shift, p)) % p for v in m_col]
    return limbs7_host(np.array(vals, dtype=object), mxu.L7).reshape(-1)


def _big_rows(mxu: MxuContext, m_normal, slot_rows, in_limbs, n_pad: int,
              limb_major: bool = False):
    """Reduced ``bigMᵀ[n_pad, rows]`` int8 for the given slot subset.

    ``slot_rows``: indices into ``m_normal`` rows, repeated participant-major
    by the caller. ``in_limbs``: limb count per listed slot. Output rows
    (acc rows) are ``(i, l2)``-major with stride ``L7`` per clerk, padded to
    ``n_pad`` MXU-friendly rows; entry for input row ``(j, l1)`` is
    ``limb_l2(M[j,i]·2^{7·l1} mod p)``.

    ``limb_major=True`` orders the input rows ``(l1, j)`` instead of
    ``(j, l1)`` — the layout :func:`_limbs7_planes` produces in-kernel
    without a sublane transpose (requires uniform ``in_limbs``).
    """
    m_normal = np.asarray(m_normal, dtype=object)
    n = m_normal.shape[1]
    L7 = mxu.L7
    if n * L7 > n_pad:
        raise ValueError("n_pad too small")
    rows = sum(in_limbs)
    big = np.zeros((n_pad, rows), dtype=np.int8)
    cache: dict[tuple[int, int], np.ndarray] = {}

    def reduced(j, l1):
        got = cache.get((j, l1))
        if got is None:
            got = _reduced_row(mxu, m_normal[j], _W7 * l1)
            cache[(j, l1)] = got
        return got

    if limb_major:
        if len(set(in_limbs)) != 1:
            raise ValueError("limb_major needs a uniform limb count")
        row = 0
        for l1 in range(in_limbs[0]):
            for j in slot_rows:
                big[: n * L7, row] = reduced(j, l1)
                row += 1
        return big
    row = 0
    for j, limbs in zip(slot_rows, in_limbs):
        for l1 in range(limbs):
            big[: n * L7, row] = reduced(j, l1)
            row += 1
    return big


def _big_rows_randsum(mxu: MxuContext, m_normal, k: int, rand_count: int,
                      n_pad: int, words_per_p: int):
    """Reduced ``bigRsumᵀ[n_pad, 8·words_per_p]`` for summed randomness.

    In rand-sum mode the kernel draws each participant's raw double-width
    randomness limbs, sums them over participants in packed u32 lanes, and
    re-splits each limb-position sum into (lo, hi) 7-bit carry limbs. Row
    ``(b·2+carry)·words_per_p + w`` of the summed-randomness operand carries
    limb position ``idx = w·4 + b`` (the PRNG packs 4 limbs per 32-bit word)
    with weight ``2^{7·(idx%r2l + carry)}``; its reduced matrix entries are
    therefore ``limb_l2(M[slot,i]·2^{7·(l1+carry)} mod p)``. Positions past
    ``rand_count·2L7`` (word padding) stay zero.
    """
    m_normal = np.asarray(m_normal, dtype=object)
    n = m_normal.shape[1]
    L7 = mxu.L7
    r2l = 2 * L7  # raw double-width limbs per rand slot
    big = np.zeros((n_pad, 8 * words_per_p), dtype=np.int8)
    cache: dict[tuple[int, int], np.ndarray] = {}
    for idx in range(rand_count * r2l):
        slot, l1 = k + idx // r2l, idx % r2l
        w, b = idx // 4, idx % 4
        for carry in (0, 1):
            col = (b * 2 + carry) * words_per_p + w
            got = cache.get((slot, l1 + carry))
            if got is None:
                got = _reduced_row(mxu, m_normal[slot], _W7 * (l1 + carry))
                cache[(slot, l1 + carry)] = got
            big[: n * L7, col] = got
    return big


def _chunk_consts_u32(mxu: MxuContext, n_chunks: int) -> np.ndarray:
    """SMEM table ``[n_chunks, L16]``: Montgomery-form ``2^(7·chunk·t)``."""
    ctx = mxu.ctx
    R = 1 << (_W16 * ctx.L)
    vals = [(pow(2, _W7 * mxu.chunk * t, ctx.p) * R) % ctx.p for t in range(n_chunks)]
    return to_limbs(np.array(vals, dtype=object), ctx.L).astype(np.uint32)


def _reduce_acc(mxu, consts_ref, acc, n: int, const_base: int):
    """``acc[n·L7(+pad), T] int32`` -> list of L16 canonical ``[n, T]`` u32.

    The accumulator's ``L7`` columns per clerk carry weights ``2^{7·l2}``:
    carry-propagate to 7-bit limbs (residual carry < 2^25 → 4 extra limbs),
    regroup into canonical chunks of ``chunk`` limbs, fold with precomputed
    Montgomery constants (rows ``const_base..`` of ``consts_ref``).
    """
    ctx = mxu.ctx
    L7 = mxu.L7
    T = acc.shape[-1]
    accu = acc[: n * L7].astype(jnp.uint32).reshape(n, L7, T)
    zero = jnp.zeros((n, T), dtype=jnp.uint32)
    limbs, carry = [], zero
    for c in range(L7):
        t = accu[:, c, :] + carry
        limbs.append(t & _MASK7)
        carry = t >> _W7
    for _ in range(4):  # residual carry < 2^25
        limbs.append(carry & _MASK7)
        carry = carry >> _W7
    n_chunks = -(-len(limbs) // mxu.chunk)
    res = None
    for t in range(n_chunks):
        group = limbs[t * mxu.chunk : (t + 1) * mxu.chunk]
        lanes16 = [zero] * ctx.L
        for j, b in enumerate(group):
            o = _W7 * j
            w, sh = o // _W16, o % _W16
            lanes16[w] = lanes16[w] | ((b << sh) & _MASK16)
            if sh + _W7 > _W16 and w + 1 < ctx.L:
                lanes16[w + 1] = lanes16[w + 1] | (b >> (_W16 - sh))
        term = ctx.mont_mul_lanes(
            lanes16, [consts_ref[const_base + t, l] for l in range(ctx.L)]
        )
        res = term if res is None else ctx.add_mod_lanes(res, term)
    return res


def _limbs7_planes(mxu, res, n: int):
    """Canonical L16 lanes (list of ``[n, T]`` u32) -> ``[L7·n, T]`` int8.

    Rows come out **limb-major** ``(l1, j)`` — a contiguous sublane concat,
    NOT the ``(j, l1)`` interleave (which costs a sublane-granularity
    transpose, ~0.35 ms/step at the headline shape). The second-stage
    matrix's rows are ordered to match (``limb_major=True``).
    """
    ctx = mxu.ctx
    planes = []
    for l7 in range(mxu.L7):
        o = _W7 * l7
        w, sh = o // _W16, o % _W16
        v = res[w] >> sh
        if sh + _W7 > _W16 and w + 1 < ctx.L:
            v = v | (res[w + 1] << (_W16 - sh))
        planes.append((v & _MASK7).astype(jnp.int8))
    return jnp.concatenate(planes, axis=0)


def _mxu_fused_kernel(
    mxu, n, kr, rand_groups, out7, rand_sum, n2,
    seed_ref, consts_ref, bigs_ref, bigr_ref, big2_ref, sec_ref, out_ref,
):
    ctx = mxu.ctx
    T = sec_ref.shape[-1]
    if not (kr and rand_sum):
        acc = jax.lax.dot_general(
            bigs_ref[...], sec_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    if kr and rand_sum:
        # rand-sum mode: Σ_p R·rand_p = R·(Σ_p rand_p). Draw every
        # participant's raw limbs, but sum them over participants in packed
        # u32 lanes (limbs 0/2 of each PRNG word in accE bits 0-13/14-27,
        # limbs 1/3 in accO; group size ≤ 129 keeps each 14-bit field
        # carry-free), then contract once per group with the P-independent
        # bigRsum — the MXU work for randomness drops from O(P·r·2L7) to
        # O(G·8·r·2L7/4) rows. Participant counts above 129 split into G
        # equal carry-save groups, each with its own contraction.
        p_count, words_per_p, pg, groups = rand_sum
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        mask2 = jnp.uint32(_MASK7 | (_MASK7 << 14))
        acc = None
        for g in range(groups):
            accE = jnp.zeros((words_per_p, T), jnp.uint32)
            accO = jnp.zeros((words_per_p, T), jnp.uint32)
            gsize = p_count // groups
            for step in range(gsize // pg):
                w = pltpu.bitcast(
                    pltpu.prng_random_bits((pg * words_per_p, T)), jnp.uint32
                ).reshape(pg, words_per_p, T)
                # unrolled adds: Mosaic has no unsigned-reduce lowering
                # (and unrolling schedules ~10% faster than fori_loop here)
                for j in range(pg):
                    accE = accE + (w[j] & mask2)
                    accO = accO + ((w[j] >> 7) & mask2)
            sums = [accE & 0x3FFF, accO & 0x3FFF, accE >> 14, accO >> 14]
            rand2 = jnp.concatenate(
                [part for s in sums
                 for part in ((s & _MASK7).astype(jnp.int8),
                              (s >> _W7).astype(jnp.int8))],
                axis=0,
            )  # [8·words_per_p, T]: (limb-in-word b, carry) blocks, word-major
            part = jax.lax.dot_general(
                bigr_ref[...], rand2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = part if acc is None else acc + part
        # the big secrets matmul comes last: its MXU passes can overlap the
        # VPU-heavy randomness accumulation above in the software pipeline
        acc = acc + jax.lax.dot_general(
            bigs_ref[...], sec_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    elif kr:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        # randomness is generated and contracted in groups so the VMEM
        # working set stays small even at large participant counts
        kg = kr // rand_groups
        for g in range(rand_groups):
            if kg % 4 == 0:
                # 4 independent 7-bit limbs per PRNG word (28 of 32 bits
                # used); bigr's columns are permuted host-side to match
                w = pltpu.bitcast(
                    pltpu.prng_random_bits((kg // 4, T)), jnp.uint32
                )
                rand = jnp.concatenate(
                    [((w >> s) & _MASK7).astype(jnp.int8) for s in (0, 7, 14, 21)],
                    axis=0,
                )
            else:
                rand = (
                    pltpu.bitcast(pltpu.prng_random_bits((kg, T)), jnp.uint32)
                    & _MASK7
                ).astype(jnp.int8)
            acc = acc + jax.lax.dot_general(
                bigr_ref[:, g * kg : (g + 1) * kg], rand,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    # epilogue, vectorised over the clerk axis: every op below runs on
    # [n, T] blocks (one instruction drives all clerks' lanes at once)
    res = _reduce_acc(mxu, consts_ref, acc, n, 0)
    if n2:
        # in-kernel reconstruction: re-split the canonical combined limbs
        # and contract against the reduced second-stage matrix — the full
        # share→combine→reconstruct pipeline in one dispatch
        c7 = _limbs7_planes(mxu, res, n)
        acc2 = jax.lax.dot_general(
            big2_ref[...], c7, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        res = _reduce_acc(mxu, consts_ref, acc2, n2, 0)
        n = n2
    if out7:
        # emit compact 7-bit int8 limbs (feeds a follow-up MXU matmul —
        # e.g. reconstruction — with 40% less HBM traffic than u32)
        for l7 in range(mxu.L7):
            o = _W7 * l7
            w, sh = o // _W16, o % _W16
            v = res[w] >> sh
            if sh + _W7 > _W16 and w + 1 < ctx.L:
                v = v | (res[w + 1] << (_W16 - sh))
            out_ref[:, l7] = (v & _MASK7).astype(jnp.int8)
    else:
        for l in range(ctx.L):
            out_ref[:, l] = res[l]


def fused_share_combine_mxu(
    mxu: MxuContext,
    share_matrix,  # [m, n] canonical (normal-domain) host matrix
    sec_planar,  # [P*slots*L7, NBP] int8 (slots = k or m; see has_prng)
    p_count: int,
    k: int,
    rand_count: int,
    seed=0,
    lanes: int = 512,
    out7: bool = False,
    reconstruct_matrix=None,  # optional [n, k2]: fuse a second modmat
    interpret: bool = False,
):
    """Fused MXU share+combine. Returns ``[n, L16, NBP]`` canonical u32
    limbs, or ``[n, L7, NBP]`` canonical int8 7-bit limbs with ``out7=True``
    (ready to feed back in as the input of a follow-up call — e.g.
    reconstruction, which is the same modular matmul with ``p_count=1``,
    ``k=n``, ``rand_count=0``). With ``reconstruct_matrix`` the second
    modmat runs in-kernel and the result is ``[k2, L16, NBP]``.

    If ``sec_planar`` carries ``k`` slots per participant, randomness is
    drawn raw in-kernel from ``seed``; if it carries ``k + rand_count``
    slots (host-CSPRNG canonical randomness — the protocol path), the PRNG
    is unused.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    m = k + rand_count
    share_matrix = np.asarray(share_matrix, dtype=object)
    n = share_matrix.shape[1]
    L7 = mxu.L7
    rows, nbp = sec_planar.shape
    if nbp % lanes:
        raise ValueError(f"NBP={nbp} must be a multiple of lanes={lanes}")
    if rows == p_count * k * L7:
        has_prng = True
    elif rows == p_count * m * L7:
        has_prng = False
    else:
        raise ValueError("sec_planar rows match neither k nor k+r slots")

    # rand-sum mode: sum raw randomness over participants in-lane, contract
    # once per carry-save group (P-independent MXU work). Every 14-bit
    # carry-save field must stay below 2^14 ≥ group·127, i.e. groups of
    # ≤ 129 participants; G must divide P evenly.
    rand_sum = None
    if has_prng and rand_count:
        groups = -(-p_count // 129)
        if p_count % groups == 0:
            gsize = p_count // groups
            words_per_p = -(-(rand_count * 2 * L7) // 4)
            pg = max(d for d in range(1, min(16, gsize) + 1) if gsize % d == 0)
            rand_sum = (p_count, words_per_p, pg, groups)

    n_pad = -(-(n * L7) // 32) * 32  # int8 sublane tile
    # contraction / accumulator bound (int32): K * 127^2 < 2^31
    if rand_sum:
        # summed randomness contracts over 8·words_per_p int8 rows per
        # group, but each lo/hi carry limb is ≤ 127 like any other operand
        K_total = p_count * k * L7 + rand_sum[3] * 8 * rand_sum[1]
    else:
        K_total = p_count * (k * L7 + rand_count * (2 * L7 if has_prng else L7))
    if K_total * _MASK7 * _MASK7 >= (1 << 31):
        raise ValueError(
            "participants * scheme_size exceeds the int32 accumulator bound; "
            "chunk the participant axis (engine streaming path)"
        )

    sec_slots = list(range(k)) if has_prng else list(range(m))
    bigs = _big_rows(
        mxu, share_matrix,
        [j for _ in range(p_count) for j in sec_slots],
        [L7] * (p_count * len(sec_slots)), n_pad,
    )
    rand_groups = 1
    if rand_sum:
        bigr = _big_rows_randsum(
            mxu, share_matrix, k, rand_count, n_pad, rand_sum[1]
        )
        kr = p_count * rand_count * 2 * L7
    elif has_prng and rand_count:
        bigr = _big_rows(
            mxu, share_matrix,
            [k + j for _ in range(p_count) for j in range(rand_count)],
            [2 * L7] * (p_count * rand_count), n_pad,
        )
        kr = p_count * rand_count * 2 * L7
        # group size: keep each in-VMEM randomness block under ~1.5 MB
        budget = max(1, (1 << 20) * 3 // 2 // lanes)
        while (
            rand_groups < kr
            and kr // rand_groups > budget
            and kr % (rand_groups * 2) == 0
        ):
            rand_groups *= 2
        kg = kr // rand_groups
        if kg % 4 == 0:
            # kernel packs 4 limbs per PRNG word per group in block order:
            # within a group, new row b*(kg/4)+j carries the limb the plain
            # order put at j*4+b
            perm = np.empty(kr, dtype=np.int64)
            for g in range(rand_groups):
                for i in range(kg):
                    perm[g * kg + (i % 4) * (kg // 4) + (i // 4)] = g * kg + i
            bigr = bigr[:, perm]
    else:
        bigr = np.zeros((n_pad, 32), dtype=np.int8)  # unused placeholder
        kr = 0

    n_chunks1 = -(-(L7 + 4) // mxu.chunk)
    n2 = 0
    if reconstruct_matrix is not None:
        if out7:
            raise ValueError("out7 and reconstruct_matrix are exclusive")
        rec = np.asarray(reconstruct_matrix, dtype=object)
        if rec.shape[0] != n:
            raise ValueError("reconstruct_matrix rows must equal share count")
        n2 = rec.shape[1]
        n_pad2 = -(-(n2 * L7) // 32) * 32
        big2 = _big_rows(
            mxu, rec, list(range(n)), [L7] * n, n_pad2, limb_major=True
        )
    else:
        big2 = np.zeros((32, 32), dtype=np.int8)  # unused placeholder
    # both stages fold (L7+4)-limb accumulators -> one shared const table
    consts = _chunk_consts_u32(mxu, n_chunks1)

    kernel = functools.partial(
        _mxu_fused_kernel, mxu, n, kr, rand_groups, out7, rand_sum, n2,
    )
    grid = (nbp // lanes,)
    n_out = n2 if n2 else n
    out_limbs = mxu.L7 if out7 else mxu.ctx.L
    out_dtype = jnp.int8 if out7 else jnp.uint32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk consts
            pl.BlockSpec(bigs.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bigr.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(big2.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rows, lanes), lambda t: (0, t), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_out, out_limbs, lanes), lambda t: (0, 0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, out_limbs, nbp), out_dtype),
        compiler_params=pltpu.CompilerParams(
            # 16 MB scoped-VMEM default strangles Mosaic buffering (the r5
            # fused-ChaCha-fold finding: lifting it alone was 3.8x)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray([seed], dtype=jnp.int32),
        jnp.asarray(consts),
        jnp.asarray(bigs),
        jnp.asarray(bigr),
        jnp.asarray(big2),
        sec_planar,
    )
