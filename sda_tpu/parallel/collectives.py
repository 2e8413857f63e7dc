"""Modular collectives over mesh axes.

``jax.lax.psum`` adds limbs as plain integers, which silently builds a
redundant (carry-delayed) representation; these wrappers keep every
cross-chip reduction exactly canonical mod p by composing ``ppermute`` rings
with limb-level modular adds — the collectives ride ICI, the modular
normalisation rides the VPU, and XLA overlaps both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sda_tpu.ops.limbs import LimbContext

__all__ = ["psum_mod", "reduce_scatter_mod", "all_gather_axis"]


def psum_mod(ctx: LimbContext, x, axis_name: str):
    """All-reduce modular sum over a mesh axis (recursive doubling).

    ``log2(n)`` ppermute+add_mod steps for power-of-two axes; general sizes
    fall back to all-gather + local tree sum.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return x
    if n & (n - 1) == 0:
        shift = 1
        while shift < n:
            perm = [(i, i ^ shift) for i in range(n)]
            other = jax.lax.ppermute(x, axis_name, perm)
            x = ctx.add_mod(x, other)
            shift <<= 1
        return x
    gathered = jax.lax.all_gather(x, axis_name, axis=0)  # [n, ...]
    return ctx.sum_mod(gathered, axis=0)


def reduce_scatter_mod(ctx: LimbContext, x, axis_name: str, scatter_axis: int):
    """Reduce-scatter modular sum: chip i ends with slice i of the reduced
    tensor along ``scatter_axis`` (recursive halving for power-of-two axes).

    This is the "per-clerk jobs land on their clerk's chip" collective — the
    TPU-native server-side transposition (SURVEY.md §2.8 P5).
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return x
    size = x.shape[scatter_axis]
    if size % n != 0:
        raise ValueError("scatter axis not divisible by axis size")
    if n & (n - 1) != 0:
        full = psum_mod(ctx, x, axis_name)
        idx = jax.lax.axis_index(axis_name)
        return jax.lax.dynamic_slice_in_dim(full, idx * (size // n), size // n, scatter_axis)
    # recursive halving: at each step swap complementary halves with the
    # partner chip and modular-add
    my = jax.lax.axis_index(axis_name)
    step = n >> 1
    while step >= 1:
        half = x.shape[scatter_axis] // 2
        lo = jax.lax.slice_in_dim(x, 0, half, axis=scatter_axis)
        hi = jax.lax.slice_in_dim(x, half, 2 * half, axis=scatter_axis)
        perm = [(i, i ^ step) for i in range(n)]
        keep_hi = (my & step) > 0  # this chip keeps the high half next
        # send the half we are NOT keeping, receive the partner's
        outgoing = jnp.where(keep_hi, lo, hi)
        incoming = jax.lax.ppermute(outgoing, axis_name, perm)
        kept = jnp.where(keep_hi, hi, lo)
        x = ctx.add_mod(kept, incoming)
        step >>= 1
    return x


def all_gather_axis(x, axis_name: str, axis: int):
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)
