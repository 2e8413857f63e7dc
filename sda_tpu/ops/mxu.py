"""MXU-native modular matmul: limb convolution folded into an int8 matmul.

The share transform (and reconstruction) is ``y = x @ M mod p`` with a tiny
``M`` and an enormous batch axis (SURVEY.md §2.8 P3/P7). The Pallas/VPU path
computes it as chains of CIOS Montgomery multiplies — O(2L²) u32 VPU
multiplies per product. This module instead routes the products through the
MXU (the systolic array - where a TPU's integer throughput actually lives):

- Field elements are split into **7-bit limbs stored as int8** (7 + 7 = 14-bit
  products, so any int8 x int8 product fits comfortably and tens of
  thousands of them accumulate exactly in the MXU's int32 accumulators).
- Multiplication by a *constant* is **linear over the limbs** of the other
  operand: ``x * c = Σ_l1 x_l1 · (c << 7·l1)``. So the whole map
  "input limbs -> raw product columns" is one integer matrix::

      bigM[(j, l1), (i, lo)] = limb_{lo-l1}(M[j, i])

  and ``x7[B, m·L7] @ bigM -> acc[B, n·C]`` computes, for every batch row,
  every product ``x[j] * M[j, i]`` **and** their sum over ``j`` in one
  int8 matmul with int32 accumulation — shares never exist as separate
  tensors, exactly like the fused Pallas kernel.
- A cheap epilogue renormalises each output's redundant base-2⁷ columns:
  carry-propagate, regroup into canonical-by-construction chunks of
  ``floor(log2 p / 7)`` limbs, and fold the chunks together with one
  Montgomery multiply each (constants ``2^(7·chunk·t) mod p`` precomputed).

The same machinery fuses the **clerk combine** (combiner.rs:16-29): summing
participants' shares is just more rows in the contraction —
``ext[nb, P·m·L7] @ tile_P(bigM)`` accumulates all participants' products
into the same int32 accumulator, deferring the single mod-p reduction to the
epilogue (the redundant-accumulation trick of the Pallas kernel, now done by
the systolic array at MXU rates).

Bound: every output column receives at most ``K = rows(bigM)`` products of
two 7-bit values, so ``K · 127² < 2³¹`` ⇔ ``K ≤ 133152`` — about 2,100
participants per matmul for the packed-Shamir(3,8,4) scheme; larger
populations chunk the participant axis and add the int32 accumulators (or
the canonical partials) across chunks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sda_tpu.ops.limbs import LimbContext

__all__ = ["MxuContext", "limbs7_host", "mxu_modmat"]

_W7 = 7
_MASK7 = (1 << _W7) - 1
_W16 = 16
_MASK16 = (1 << _W16) - 1
# max contraction length such that K * 127 * 127 < 2**31 (int32 accumulator)
MAX_CONTRACTION = (1 << 31) // (_MASK7 * _MASK7)


def limbs7_for(p: int) -> int:
    """Limb count for canonical values (< p) in 7-bit limbs."""
    return -(-p.bit_length() // _W7)


def limbs7_host(values, L7: int) -> np.ndarray:
    """Host: object/int array -> ``[..., L7]`` int8 7-bit limbs."""
    arr = np.asarray(values, dtype=object)
    flat = arr.reshape(-1)
    out = np.zeros((flat.size, L7), dtype=np.int8)
    for i, v in enumerate(flat):
        v = int(v)
        if v < 0:
            raise ValueError("limbs7_host requires non-negative values")
        for j in range(L7):
            out[i, j] = v & _MASK7
            v >>= _W7
        if v:
            raise ValueError("value does not fit limb count")
    return out.reshape(arr.shape + (L7,))


@dataclass(frozen=True)
class MxuContext:
    """Per-modulus constants for the int8-matmul path.

    ``L7``: canonical limb count; ``chunk``: 7-bit limbs per reduction chunk
    (chosen so a chunk's value ``< 2^(7*chunk) <= p`` is canonical by
    construction); ``chunk_consts``: Montgomery-form ``2^(7*chunk*t) mod p``.
    """

    ctx: LimbContext
    L7: int
    chunk: int

    @classmethod
    def create(cls, ctx: LimbContext) -> "MxuContext":
        p = ctx.p
        if p.bit_length() <= _W7:
            raise ValueError("modulus too small for 7-bit limb chunking")
        chunk = (p.bit_length() - 1) // _W7  # 2^(7*chunk) <= p
        return cls(ctx=ctx, L7=limbs7_for(p), chunk=chunk)

    # ------------------------------------------------------------ matrices

    def matrix_int8(self, m_normal, in_limbs) -> np.ndarray:
        """Build ``bigM[sum(in_limbs), n * out_cols]`` int8.

        ``m_normal``: ``[m, n]`` canonical (NOT Montgomery) matrix entries.
        ``in_limbs``: per-input-slot limb count — ``L7`` for canonical
        inputs, ``2*L7`` for raw double-width randomness (see
        :meth:`raw_limbs`). Row order is slot-major: ``(j, l1)``.
        """
        m_normal = np.asarray(m_normal, dtype=object)
        m, n = m_normal.shape
        if len(in_limbs) != m:
            raise ValueError("in_limbs must give a limb count per matrix row")
        cols = self.out_cols(in_limbs)
        mlimbs = limbs7_host(m_normal, self.L7)  # [m, n, L7]
        big = np.zeros((sum(in_limbs), n * cols), dtype=np.int8)
        row = 0
        for j in range(m):
            for l1 in range(in_limbs[j]):
                for i in range(n):
                    for l2 in range(self.L7):
                        big[row, i * cols + (l1 + l2)] = mlimbs[j, i, l2]
                row += 1
        return big

    def out_cols(self, in_limbs) -> int:
        """Redundant output columns per matrix column."""
        return max(in_limbs) + self.L7 - 1

    # ------------------------------------------------- device limb reshape

    def limbs7_from_16(self, x16):
        """Device: ``[..., L16]`` u32 16-bit limbs -> ``[..., L7]`` int8.

        Pure bit regrouping (elementwise shifts), usable inside jit.
        """
        L16 = self.ctx.L
        out = []
        for l in range(self.L7):
            o = _W7 * l
            w, sh = o // _W16, o % _W16
            v = x16[..., w] >> sh
            if sh + _W7 > _W16 and w + 1 < L16:
                v = v | (x16[..., w + 1] << (_W16 - sh))
            out.append(v & _MASK7)
        return jnp.stack(out, axis=-1).astype(jnp.int8)

    def raw_limbs(self, bits_u32):
        """Device: ``[..., W]`` u32 random words -> ``[..., 2*L7]`` int8.

        Interprets the words little-endian and slices ``2*L7`` 7-bit limbs —
        a uniform value in ``[0, 2^(14*L7))`` whose residue mod p has bias
        ``<= p / 2^(7*L7)`` (< 2^-62 for 64-bit fields). Linearity makes
        non-canonical sharing randomness harmless: shares are reduced mod p
        downstream, and ``r mod p`` is what the scheme sees.
        """
        need = 2 * self.L7
        W = bits_u32.shape[-1]
        if W * 32 < need * _W7:
            raise ValueError("not enough random words for raw limbs")
        out = []
        for l in range(need):
            o = _W7 * l
            w, sh = o // 32, o % 32
            v = bits_u32[..., w] >> sh
            if sh + _W7 > 32 and w + 1 < W:
                v = v | (bits_u32[..., w + 1] << (32 - sh))
            out.append(v & _MASK7)
        return jnp.stack(out, axis=-1).astype(jnp.int8)

    @property
    def raw_words(self) -> int:
        """u32 words needed per raw-randomness element."""
        return -(-(2 * self.L7 * _W7) // 32)

    # ----------------------------------------------------------- epilogue

    def _chunk_consts(self, n_chunks: int) -> np.ndarray:
        """Montgomery-form ``2^(7*chunk*t) mod p`` for ``t < n_chunks``."""
        from sda_tpu.ops.limbs import to_limbs

        p, R = self.ctx.p, 1 << (_W16 * self.ctx.L)
        vals = [(pow(2, _W7 * self.chunk * t, p) * R) % p for t in range(n_chunks)]
        return to_limbs(np.array(vals, dtype=object), self.ctx.L)

    def reduce_columns(self, cols):
        """``[..., C]`` int32 redundant base-2⁷ columns -> canonical
        ``[..., L16]`` u32 limbs (the value ``Σ cols[c]·2^(7c) mod p``).
        """
        ctx = self.ctx
        C = cols.shape[-1]
        cols = cols.astype(jnp.uint32)
        # 1. carry-propagate to 7-bit limbs (carry < 2^25 at every step)
        limbs, carry = [], jnp.zeros(cols.shape[:-1], dtype=jnp.uint32)
        for c in range(C):
            t = cols[..., c] + carry
            limbs.append(t & _MASK7)
            carry = t >> _W7
        for _ in range(4):  # residual carry < 2^25 -> four more limbs
            limbs.append(carry & _MASK7)
            carry = carry >> _W7
        # 2. regroup into canonical chunks of `chunk` limbs, as L16 limbs
        n_chunks = -(-len(limbs) // self.chunk)
        consts = jnp.asarray(self._chunk_consts(n_chunks))
        acc = None
        for t in range(n_chunks):
            group = limbs[t * self.chunk : (t + 1) * self.chunk]
            lanes16 = [jnp.zeros_like(limbs[0]) for _ in range(ctx.L)]
            for j, b in enumerate(group):
                o = _W7 * j
                w, sh = o // _W16, o % _W16
                lanes16[w] = lanes16[w] | ((b << sh) & _MASK16)
                if sh + _W7 > _W16 and w + 1 < ctx.L:
                    lanes16[w + 1] = lanes16[w + 1] | (b >> (_W16 - sh))
            # 3. fold: chunk_t * 2^(7*chunk*t) mod p via one mont_mul
            term = ctx._join(
                ctx.mont_mul_lanes(lanes16, [consts[t, l] for l in range(ctx.L)])
            )
            acc = term if acc is None else ctx._add_mod_impl(acc, term)
        return acc


@partial(jax.jit, static_argnums=(0, 2, 3))
def _mxu_modmat_impl(mxu: MxuContext, x7, n: int, cols: int, big):
    acc = jax.lax.dot_general(
        x7, big, (((x7.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return mxu.reduce_columns(acc.reshape(acc.shape[:-1] + (n, cols)))


def mxu_modmat(mxu: MxuContext, x7, big_int8, n: int, cols: int):
    """``x7[..., K] int8 @ big[K, n*cols] -> [..., n, L16]`` canonical u32.

    ``x7`` rows are the concatenated 7-bit limbs of the input slots (layout
    must match the ``in_limbs`` used to build ``big_int8``). Asserts the
    int32-accumulator bound on the contraction length.
    """
    K = x7.shape[-1]
    if K > MAX_CONTRACTION:
        raise ValueError(
            f"contraction length {K} exceeds the int32 accumulator bound "
            f"{MAX_CONTRACTION}; chunk the batch/participant axis"
        )
    return _mxu_modmat_impl(mxu, x7, n, cols, jnp.asarray(big_int8))
