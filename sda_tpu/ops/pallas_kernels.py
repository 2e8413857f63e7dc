"""Hand-written Pallas TPU kernels for the aggregation hot path.

The jnp pipeline (engine.aggregate) materialises the full share tensor
``[P, nb, n, L]`` in HBM (1.7 GB at the 1M-dim benchmark shape) and reads it
back for the combine — HBM traffic dominates. The fused kernel here:

- streams secrets HBM -> VMEM in planar tiles (double-buffered by the
  pallas pipeline);
- draws each participant's sharing randomness from the on-chip PRNG;
- computes every participant's full share vector in VMEM (that is the MPC
  work being measured — each sharing must exist and be combinable) and
  accumulates the per-clerk modular sums in the output block, so shares
  never round-trip HBM.

Mosaic-shaped layout: inside the kernel every limb of every slot is its own
``[S, 128]`` lane array (S sublane rows x 128 lanes — exact vreg tiles), the
share-matrix entries are SMEM scalars, and there are no limb-sized trailing
axes anywhere. The host-side wrappers transpose between the engine's
``[P, nb, k, L]`` layout and the kernel's planar ``[P, k, L, NB/128, 128]``.

Protocol-exactness: in-kernel randomness is the bulk/benchmark path
(counter PRNG, uniformity bias <= p/2^(32L)); the protocol path with host
CSPRNG randomness streams caller-provided randomness via ``ext_planar``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sda_tpu.ops.limbs import LimbContext

__all__ = ["fused_share_combine_planar", "planar_from_batched", "batched_from_planar"]

_MASK = 0xFFFF


def planar_from_batched(x, rows: int):
    """``[P, NB, k, L] -> [P, k, L, NBp/128, 128]`` with zero padding.

    ``NBp`` is ``NB`` rounded up to ``rows * 128`` (one kernel tile).
    Zero batches are inert: they share the zero vector and are sliced off
    after reconstruction.
    """
    p, nb, k, L = x.shape
    nbp = -(-nb // (rows * 128)) * rows * 128
    if nbp != nb:
        x = jnp.pad(x, ((0, 0), (0, nbp - nb), (0, 0), (0, 0)))
    planar = jnp.transpose(x, (0, 2, 3, 1))  # [P, k, L, NBp]
    return planar.reshape(p, k, L, nbp // 128, 128)


def batched_from_planar(y, nb: int):
    """``[n, L, NBp/128, 128] -> [NB, n, L]`` (slicing the padding off)."""
    n, L, nbr, _ = y.shape
    flat = y.reshape(n, L, nbr * 128)
    return jnp.transpose(flat, (2, 0, 1))[:nb]


def _uniform_lanes(ctx: LimbContext, shape, r2_scalars, one_scalars):
    """One uniform field element per lane position, as an L-lane list.

    Draws 2 u32 words per limb (split into 16-bit halves -> two independent
    L-limb values x1, x0) and reduces ``x1*R + x0`` exactly mod p.
    """
    L = ctx.L
    x0, x1 = [], []
    for _ in range(L):
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        x0.append(bits & _MASK)
        x1.append(bits >> 16)
    a = ctx.mont_mul_lanes(x1, r2_scalars)
    y = ctx.mont_mul_lanes(x0, r2_scalars)
    b = ctx.mont_mul_lanes(y, one_scalars)
    return ctx.add_mod_lanes(a, b)


def _fused_planar_kernel(
    ctx, k, rand_count, p_count, n, has_prng,
    seed_ref, m_ref, secrets_ref, out_ref, acc_ref,
):
    """Grid: one program per output tile of ``rows x 128`` batch positions.

    - ``m_ref``: SMEM ``[m + 2, n*L]`` Montgomery-form share matrix scalars
      (plus the r2 / one constant rows).
    - ``secrets_ref``: VMEM ``[P, k, L, rows, 128]`` (if has_prng) or
      ``[P, k + rand_count, L, rows, 128]`` (caller randomness).
    - ``out_ref``: VMEM ``[n, L, rows, 128]`` per-clerk combined sums.
    - ``acc_ref``: VMEM scratch ``[n, L+1, rows, 128]`` redundant accumulator.

    Redundant accumulation: per-participant share products are kept RAW
    (mont output < 2p, L+1 limb columns) and summed with plain u32 adds —
    column magnitudes stay below ``P * m * 2^16`` (the wrapper enforces
    ``P * m < 2^15``) — then each clerk's column sum is renormalised once
    per tile: carry-propagate, split V = V_hi * R + V_lo, and reduce with
    three Montgomery multiplies.
    """
    L = ctx.L
    m = k + rand_count
    rows = secrets_ref.shape[-2]
    lane_shape = (rows, 128)
    if has_prng:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    # aux scalars appended as extra rows of m_ref: row m = r2, row m+1 = one
    r2_s = [m_ref[m, l] for l in range(L)]
    one_s = [m_ref[m + 1, l] for l in range(L)]

    zero = jnp.zeros(lane_shape, dtype=jnp.uint32)
    for i in range(n):
        for c in range(L + 1):
            acc_ref[i, c] = zero

    def body(p, carry):
        blk = secrets_ref[pl.ds(p, 1)]  # [1, slots, L, rows, 128]
        ext = [
            [blk[0, j, l] for l in range(L)]
            for j in range(k if has_prng else m)
        ]
        if has_prng:
            for _ in range(rand_count):
                ext.append(_uniform_lanes(ctx, lane_shape, r2_s, one_s))
        for i in range(n):  # per clerk: shares_i = sum_j ext_j * M[j, i]
            acc = None
            for j in range(m):
                b_scalars = [m_ref[j, i * L + l] for l in range(L)]
                raw = ctx.mont_mul_lanes_raw(ext[j], b_scalars)  # L+1 columns
                acc = raw if acc is None else [a + r for a, r in zip(acc, raw)]
            for c in range(L + 1):
                acc_ref[i, c] = acc_ref[i, c] + acc[c]
        return carry

    jax.lax.fori_loop(0, p_count, body, 0)

    # renormalise each clerk's redundant column sum into canonical limbs
    for i in range(n):
        carry = zero
        limbs = []
        for c in range(L + 1):
            t = acc_ref[i, c] + carry
            limbs.append(t & _MASK)
            carry = t >> 16
        v_lo = limbs[:L]
        v_hi = [limbs[L], carry] + [zero] * (L - 2)
        a = ctx.mont_mul_lanes(v_hi, r2_s)  # V_hi * R mod p
        y = ctx.mont_mul_lanes(v_lo, r2_s)  # V_lo * R mod p
        b = ctx.mont_mul_lanes(y, one_s)  # V_lo mod p
        out = ctx.add_mod_lanes(a, b)
        for l in range(L):
            out_ref[i, l] = out[l]


def fused_share_combine_planar(
    ctx: LimbContext,
    secrets_planar,  # [P, slots, L, NBR, 128] uint32
    m_mont,  # [m, n, L] Montgomery-form share matrix (host/np or device)
    rand_count: int,
    seed: int = 0,
    rows: int = 8,
    interpret: bool = False,
):
    """Fused share-generation + combine on planar tiles.

    If ``slots == k`` (``m - rand_count``), randomness is drawn on-chip from
    ``seed``; if ``slots == m``, the caller supplied randomness (protocol
    path) and the PRNG is unused.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    p_count, slots, L, nbr, lanes = secrets_planar.shape
    if lanes != 128:
        raise ValueError("last axis must be 128 lanes")
    if nbr % rows:
        raise ValueError(f"NBR={nbr} must be a multiple of rows={rows}")
    m, n = m_mont.shape[0], m_mont.shape[1]
    if slots == m:
        has_prng, k = False, m - rand_count
    elif slots == m - rand_count:
        has_prng, k = True, slots
    else:
        raise ValueError("secrets slot count matches neither k nor k+r")
    if p_count * m >= (1 << 15):
        raise ValueError(
            "participants * scheme_size must stay below 2^15 per kernel pass "
            "(redundant-accumulation bound); chunk the participant axis"
        )
    # SMEM scalar table: share matrix rows + [r2; one] appended
    m_np = np.asarray(jax.device_get(m_mont)).reshape(m, n * L).astype(np.uint32)
    aux = np.zeros((2, n * L), dtype=np.uint32)
    aux[0, :L] = np.array(ctx.r2, dtype=np.uint32)
    aux[1, 0] = 1
    scalar_table = np.concatenate([m_np, aux], axis=0)  # [m+2, n*L]

    kernel = functools.partial(
        _fused_planar_kernel, ctx, k, rand_count, p_count, n, has_prng
    )
    grid = (nbr // rows,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalar table
            pl.BlockSpec(
                (p_count, slots, L, rows, 128),
                lambda t: (0, 0, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n, L, rows, 128), lambda t: (0, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, L, nbr, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((n, L + 1, rows, 128), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            # 16 MB scoped-VMEM default strangles Mosaic buffering (the r5
            # fused-ChaCha-fold finding: lifting it alone was 3.8x)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray([seed], dtype=jnp.int32),
        jnp.asarray(scalar_table),
        secrets_planar,
    )
