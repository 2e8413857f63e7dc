"""Hand-written Pallas TPU kernels for the aggregation hot path.

The jnp pipeline (engine.aggregate) materialises the full share tensor
``[P, nb, n, L]`` in HBM (1.7 GB at the 1M-dim benchmark shape) and reads it
back for the combine — HBM traffic dominates. This kernel fuses
share-generation + clerk-combine:

- secrets stream HBM -> VMEM in ``[P, TB, k, L]`` tiles (double-buffered by
  the pallas pipeline);
- per participant, the sharing randomness is drawn from the on-chip PRNG
  (``pltpu.prng_random_bits``) and shares are computed in VMEM via the
  Montgomery matmul;
- only the combined ``[TB, n, L]`` tile is written back.

Every participant's full share vector is still computed (that is the MPC
work being measured — each participant's sharing must exist and be
combinable); it just never round-trips HBM.

Protocol-exactness note: in-kernel randomness is the *bulk/benchmark* path
(counter PRG, uniformity bias <= p/2^(2*16L)); the protocol path with
host-CSPRNG randomness uses :func:`fused_share_combine_ext`, which streams
caller-provided randomness instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sda_tpu.ops.limbs import LimbContext

__all__ = ["fused_share_combine", "fused_share_combine_ext"]

_MASK = 0xFFFF


def _kernel_uniform(ctx: LimbContext, shape, r2, one):
    """Uniform field elements inside a kernel: 2L-limb draw, exact reduce."""
    L = ctx.L
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape + (L,)), jnp.uint32)
    # the 32L random bits split into two independent L-limb values:
    # x0 from the low 16-bit halves, x1 from the high halves; reduce
    # x = x1 * R + x0 exactly mod p (same construction as uniform_limbs)
    x0 = bits & _MASK
    x1 = bits >> 16
    a = ctx._mont_mul_impl(x1, r2)
    y = ctx._mont_mul_impl(x0, r2)
    b = ctx._mont_mul_impl(y, one)
    return ctx._add_mod_impl(a, b)


def _share_row(ctx: LimbContext, ext_rows, m_mont):
    """``sum_j mont_mul(ext[..., j, :], M[j])`` with unrolled small m.

    Uses explicit static slices (Mosaic lowers fancy indexing to gathers it
    does not support beyond 2D).
    """
    m = m_mont.shape[0]
    acc = None
    for j in range(m):
        ext_j = jax.lax.slice_in_dim(ext_rows, j, j + 1, axis=-2)  # [TB, 1, L]
        m_j = jax.lax.slice_in_dim(m_mont, j, j + 1, axis=0)  # [1, n, L]
        prod = ctx._mont_mul_impl(ext_j, m_j)
        acc = prod if acc is None else ctx._add_mod_impl(acc, prod)
    return acc


def _fused_kernel(ctx, k, rand_count, p_count, seed_ref, secrets_ref, m_ref, aux_ref, out_ref):
    tile = secrets_ref.shape[1]
    n = m_ref.shape[1]
    L = ctx.L
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    m_mat = m_ref[...]
    r2 = aux_ref[0, :]
    one = aux_ref[1, :]

    def body(p, acc):
        sec = secrets_ref[pl.ds(p, 1)][0]  # [TB, k, L] (dynamic ref slice)
        if rand_count:
            rand = _kernel_uniform(ctx, (tile, rand_count), r2, one)
            ext = jnp.concatenate([sec, rand], axis=1)  # [TB, k+r, L]
        else:
            ext = sec
        shares = _share_row(ctx, ext, m_mat)  # [TB, n, L]
        return ctx._add_mod_impl(acc, shares)

    acc0 = jnp.zeros((tile, n, L), dtype=jnp.uint32)
    out_ref[...] = jax.lax.fori_loop(0, p_count, body, acc0)


def fused_share_combine(
    ctx: LimbContext,
    secrets,  # [P, NB, k, L] uint32, NB % tile == 0
    m_mont,  # [k + rand_count, n, L] Montgomery-form share matrix
    seed,  # int32 scalar PRNG seed
    rand_count: int,
    tile: int = 512,
    interpret: bool = False,
):
    """Fused per-participant share generation + combine.

    Returns the combined shares ``[NB, n, L]`` (the per-clerk sums over all
    participants) without materialising the share tensor in HBM.
    """
    p_count, nb, k, L = secrets.shape
    n = m_mont.shape[1]
    if nb % tile:
        raise ValueError(f"NB={nb} must be a multiple of tile={tile}")
    kernel = functools.partial(_fused_kernel, ctx, k, rand_count, p_count)
    aux = np.stack([np.array(ctx.r2, dtype=np.uint32), np.eye(1, L, dtype=np.uint32)[0]])
    return pl.pallas_call(
        kernel,
        grid=(nb // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(
                (p_count, tile, k, L), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # share matrix (replicated)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # [r2; one] constants
        ],
        out_specs=pl.BlockSpec((tile, n, L), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, n, L), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray([seed], dtype=jnp.int32), secrets, m_mont, jnp.asarray(aux))


def _fused_ext_kernel(ctx, p_count, ext_ref, m_ref, out_ref):
    tile = ext_ref.shape[1]
    n = m_ref.shape[1]
    L = ctx.L
    m_mat = m_ref[...]

    def body(p, acc):
        ext_p = ext_ref[pl.ds(p, 1)][0]
        shares = _share_row(ctx, ext_p, m_mat)
        return ctx._add_mod_impl(acc, shares)

    acc0 = jnp.zeros((tile, n, L), dtype=jnp.uint32)
    out_ref[...] = jax.lax.fori_loop(0, p_count, body, acc0)


def fused_share_combine_ext(
    ctx: LimbContext,
    ext,  # [P, NB, k + r, L]: secrets with caller-provided randomness
    m_mont,
    tile: int = 512,
    interpret: bool = False,
):
    """Protocol-exact variant: randomness supplied by the caller (host OS
    CSPRNG), still fused so shares never hit HBM."""
    p_count, nb, m, L = ext.shape
    n = m_mont.shape[1]
    if nb % tile:
        raise ValueError(f"NB={nb} must be a multiple of tile={tile}")
    kernel = functools.partial(_fused_ext_kernel, ctx, p_count)
    return pl.pallas_call(
        kernel,
        grid=(nb // tile,),
        in_specs=[
            pl.BlockSpec(
                (p_count, tile, m, L), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n, L), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, n, L), jnp.uint32),
        interpret=interpret,
    )(ext, m_mont)
