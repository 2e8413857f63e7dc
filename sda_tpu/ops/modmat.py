"""Batched modular matmul and streaming combine on limb arrays.

These are the three hot paths of the whole framework (SURVEY.md §3):

- share generation: ``shares[B, n] = ext[B, m] @ M[m, n] mod p``
  (the entire inverse-NTT -> pad -> forward-NTT pipeline of packed Shamir is
  folded into the precomputed matrix ``M`` — the TPU-native formulation);
- clerk combine: modular sum over the participant axis
  (combiner.rs:16-29 reimagined as a streaming lane reduction);
- reconstruction: ``secrets[B, k] = shares[B, n] @ R[n, k] mod p``.

All functions operate on ``[..., L]`` uint32 limb arrays (see
:mod:`sda_tpu.ops.limbs`); matrices must be pre-encoded in Montgomery form
(``ctx.encode_mont``) so no domain conversions appear on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sda_tpu.ops.limbs import LimbContext

__all__ = ["modmat", "combine", "uniform_limbs"]


def modmat(ctx: LimbContext, a, m_mont):
    """``a[..., B, m, L] @ m_mont[m, n, L] -> [..., B, n, L]`` modular matmul.

    ``m_mont`` is in Montgomery form, ``a`` in normal form; the output is in
    normal form (mont_mul cancels the R factor). The contraction runs as a
    ``lax.scan`` over the (small, static) inner dimension so the Montgomery
    multiply body is compiled once, not ``m`` times; each step is a fused
    multiply/accumulate over the huge batch axis.
    """
    m = m_mont.shape[0]
    lead = (None,) * (a.ndim - 2)

    def body(acc, inputs):
        a_j, m_j = inputs  # [..., L] row of a, [n, L] row of m
        prod = ctx._mont_mul_impl(a_j[..., None, :], m_j[lead])
        return ctx._add_mod_impl(acc, prod), None

    a_rows = jnp.moveaxis(a, -2, 0)  # [m, ..., L]
    # first product doubles as the carry init (keeps shard_map varying-axes
    # types consistent without an explicit pvary)
    acc0 = ctx._mont_mul_impl(a_rows[0][..., None, :], m_mont[0][lead])
    acc0 = jnp.broadcast_to(acc0, a.shape[:-2] + m_mont.shape[1:])
    if m == 1:
        return acc0
    acc, _ = jax.lax.scan(body, acc0, (a_rows[1:], m_mont[1:]))
    return acc


def combine(ctx: LimbContext, shares, axis: int = 0):
    """Modular sum over the participant axis (the clerk combine kernel)."""
    return ctx.sum_mod(shares, axis=axis)


def uniform_limbs(ctx: LimbContext, key, shape) -> jax.Array:
    """Uniform field elements ``[*shape, L]`` from the device PRNG.

    Draws ``2L`` limbs (double-width) and reduces exactly mod p, leaving
    statistical bias <= p / 2**(32*L) (cryptographically negligible for all
    supported L). Protocol-critical randomness still comes from the host OS
    RNG (additive.rs:42-44 semantics); this is the bulk/benchmark path.
    """
    L = ctx.L
    bits = jax.random.bits(key, shape + (L,), dtype=jnp.uint32)
    lo = bits & 0xFFFF
    hi = bits >> 16
    x0 = lo  # [..., L] limbs
    x1 = hi
    r2 = jnp.asarray(np.array(ctx.r2, dtype=np.uint32))
    # x mod p = (x1 * R + x0) mod p
    a = ctx.mont_mul(x1, r2)  # x1 * R mod p
    y = ctx.mont_mul(x0, r2)  # x0 * R mod p
    one = jnp.asarray(np.eye(1, L, dtype=np.uint32)[0])  # normal-domain 1
    b = ctx.mont_mul(y, one)  # x0 mod p
    return ctx.add_mod(a, b)
