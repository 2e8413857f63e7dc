"""Multi-limb Montgomery arithmetic on 16-bit limbs in uint32 lanes.

TPU vector units have no native 64-bit integer multiply, and no mulhi we can
reach from jnp — but exact 16x16->32 products fit uint32. So field elements
are arrays of L 16-bit limbs stored in uint32 lanes, and modular
multiplication is CIOS Montgomery reduction with word size 2**16:

- ``L = 2`` covers every reference-protocol modulus (i64 fields, p < 2**31
  for the share math; /root/reference/client/src/crypto/mod.rs:33-36),
- ``L = 4`` covers 64-bit primes (BASELINE config 2),
- ``L = 8`` covers 128-bit moduli (BASELINE config 3).

All loops over L are Python-unrolled (L is static), so XLA sees straight-line
uint32 vector code it can fuse; the same functions run under jit on TPU and
CPU, and inside Pallas kernel bodies.

The Montgomery trick that removes all domain conversions from the hot path:
keep the *precomputed transform matrices* in Montgomery form (``M~ = M*R``)
and the data in normal form; then ``mont_mul(a, M~) = a*M mod p`` directly.
Share generation, reconstruction, and mask expansion all become chains of
``mont_mul`` + ``add_mod`` on normal-domain data.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LimbContext", "to_limbs", "from_limbs", "limbs_for_modulus"]

_W = 16
_MASK = (1 << _W) - 1


def limbs_for_modulus(p: int) -> int:
    """Smallest supported limb count whose range exceeds ``p``."""
    for L in (2, 4, 8):
        if p < (1 << (_W * L)):
            return L
    raise ValueError("modulus too large (max 128 bits)")


def to_limbs(values, L: int) -> np.ndarray:
    """Host conversion: integers -> ``[..., L]`` uint32 16-bit limbs."""
    arr = np.asarray(values, dtype=object)
    flat = arr.reshape(-1)
    out = np.zeros((flat.size, L), dtype=np.uint32)
    for i, v in enumerate(flat):
        v = int(v)
        if v < 0:
            raise ValueError("to_limbs requires canonical non-negative values")
        for j in range(L):
            out[i, j] = v & _MASK
            v >>= _W
        if v:
            raise ValueError("value does not fit limb count")
    return out.reshape(arr.shape + (L,))


def from_limbs(limbs) -> np.ndarray:
    """Host conversion: ``[..., L]`` limbs -> object array of python ints."""
    arr = np.asarray(limbs)
    L = arr.shape[-1]
    flat = arr.reshape(-1, L)
    out = np.empty(flat.shape[0], dtype=object)
    for i in range(flat.shape[0]):
        v = 0
        for j in reversed(range(L)):
            v = (v << _W) | int(flat[i, j])
        out[i] = v
    return out.reshape(arr.shape[:-1])


@dataclass(frozen=True)
class LimbContext:
    """Precomputed constants for one modulus: use as the device field handle.

    ``p_limbs``: the modulus as limbs; ``p_inv_w = -p^{-1} mod 2^16`` (the
    Montgomery quotient constant); ``r2`` = R^2 mod p for to-Montgomery
    conversion; ``one`` = the normal-domain 1.
    """

    p: int
    L: int
    p_limbs: tuple
    p_inv_w: int
    r2: tuple
    r_mod_p: tuple

    @classmethod
    def create(cls, p: int, L: int | None = None) -> "LimbContext":
        if L is None:
            L = limbs_for_modulus(p)
        if p % 2 == 0:
            raise ValueError("Montgomery arithmetic requires an odd modulus")
        R = 1 << (_W * L)
        p_inv_w = (-pow(p, -1, 1 << _W)) % (1 << _W)
        r2 = pow(R, 2, p)
        return cls(
            p=p,
            L=L,
            p_limbs=tuple(int(x) for x in to_limbs([p], L)[0]),
            p_inv_w=p_inv_w,
            r2=tuple(int(x) for x in to_limbs([r2], L)[0]),
            r_mod_p=tuple(int(x) for x in to_limbs([R % p], L)[0]),
        )

    @classmethod
    def create_add_only(cls, p: int, L: int | None = None) -> "LimbContext":
        """Context for add/sub/sum only: works for even moduli too (the
        additive scheme allows any group order; Montgomery needs odd)."""
        if p % 2 == 1:
            return cls.create(p, L)
        if L is None:
            L = limbs_for_modulus(p)
        return cls(
            p=p,
            L=L,
            p_limbs=tuple(int(x) for x in to_limbs([p], L)[0]),
            p_inv_w=0,  # mont ops are invalid for even p; add/sub never use it
            r2=(0,) * L,
            r_mod_p=tuple(int(x) for x in to_limbs([(1 << (_W * L)) % p], L)[0]),
        )

    # ------------------------------------------------------------- helpers

    def _p_vec(self, like):
        return [jnp.full(like.shape[:-1], w, dtype=jnp.uint32) for w in self.p_limbs]

    def _split(self, x):
        """[..., L] array -> list of L [...] lanes."""
        return [x[..., j] for j in range(self.L)]

    @staticmethod
    def _join(lanes):
        return jnp.stack(lanes, axis=-1)

    # ------------------------------------------------------ add / subtract

    def add_mod(self, a, b):
        """``(a + b) mod p`` on ``[..., L]`` limb arrays (canonical inputs).

        Jit-cached per (context, shapes) so host-eager use doesn't dispatch
        per lane op; inside an enclosing jit the cache call inlines.
        """
        return _jit_add_mod(self, a, b)

    def _add_mod_impl(self, a, b):
        return self._join(self.add_mod_lanes(self._split(a), self._split(b)))

    def add_mod_lanes(self, av, bv):
        """Lane-list form: L same-shaped arrays in, L out (kernel-friendly:
        no limb axis exists, so any Mosaic-tiled lane shape works)."""
        L = self.L
        s, carry = [], jnp.zeros_like(av[0])
        for j in range(L):
            t = av[j] + bv[j] + carry
            s.append(t & _MASK)
            carry = t >> _W
        return self._cond_sub(s, carry)

    def _cond_sub(self, s, carry):
        """Subtract p if (carry, s) >= p; s is a list of L lanes."""
        L = self.L
        d, borrow = [], jnp.zeros_like(s[0])
        for j in range(L):
            t = s[j] - self.p_limbs[j] - borrow
            d.append(t & _MASK)
            borrow = (t >> _W) & 1  # borrow flag from wraparound
        need = (carry > 0) | (borrow == 0)  # s >= p
        return [jnp.where(need, d[j], s[j]) for j in range(L)]

    def sub_mod(self, a, b):
        """``(a - b) mod p`` on limb arrays."""
        return _jit_sub_mod(self, a, b)

    def _sub_mod_impl(self, a, b):
        L = self.L
        av, bv = self._split(a), self._split(b)
        d, borrow = [], jnp.zeros_like(av[0])
        for j in range(L):
            t = av[j] - bv[j] - borrow
            d.append(t & _MASK)
            borrow = (t >> _W) & 1
        # if borrowed, add p back
        s, carry = [], jnp.zeros_like(av[0])
        for j in range(L):
            t = d[j] + self.p_limbs[j] + carry
            s.append(t & _MASK)
            carry = t >> _W
        wrapped = borrow == 1
        return self._join([jnp.where(wrapped, s[j], d[j]) for j in range(L)])

    # -------------------------------------------------------- montgomery

    def mont_mul(self, a, b):
        """CIOS Montgomery product: ``a * b * R^{-1} mod p``.

        With ``b`` pre-scaled by R (Montgomery form) this computes the plain
        modular product of normal-domain ``a``. Inputs must be canonical
        (< p); output is canonical. Broadcasting over leading axes works.
        """
        return _jit_mont_mul(self, a, b)

    def _mont_mul_impl(self, a, b):
        a = jnp.asarray(a, dtype=jnp.uint32)
        b = jnp.asarray(b, dtype=jnp.uint32)
        shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        av = [jnp.broadcast_to(x, shape) for x in self._split(a)]
        bv = [jnp.broadcast_to(x, shape) for x in self._split(b)]
        return self._join(self.mont_mul_lanes(av, bv))

    def mont_mul_lanes(self, av, bv):
        """Lane-list CIOS Montgomery product (see :meth:`mont_mul`)."""
        T = self.mont_mul_lanes_raw(av, bv)
        return self._cond_sub(T[: self.L], T[self.L])

    def mont_mul_lanes_raw(self, av, bv):
        """CIOS product WITHOUT the final conditional subtract.

        Returns ``L + 1`` lane columns representing a value < 2p (the top
        column is 0 or 1). Useful for redundant accumulation: columns of
        many raw products can be summed with plain u32 adds (no carries)
        for up to 2^15 terms before one renormalisation.
        """
        L = self.L
        zero = jnp.zeros_like(av[0])
        T = [zero] * (L + 2)
        for i in range(L):
            # multiply-accumulate row i
            c = zero
            for j in range(L):
                t = T[j] + av[i] * bv[j] + c  # exact: max 2^32 - 1
                T[j] = t & _MASK
                c = t >> _W
            t = T[L] + c
            T[L] = t & _MASK
            T[L + 1] = T[L + 1] + (t >> _W)
            # Montgomery reduction step for limb 0
            mq = (T[0] * self.p_inv_w) & _MASK
            t = T[0] + mq * self.p_limbs[0]
            c = t >> _W
            for j in range(1, L):
                t = T[j] + mq * self.p_limbs[j] + c
                T[j - 1] = t & _MASK
                c = t >> _W
            t = T[L] + c
            T[L - 1] = t & _MASK
            T[L] = T[L + 1] + (t >> _W)
            T[L + 1] = zero
        # raw result in T[0..L]: value < 2p, top column in {0, 1}
        return T[: L + 1]

    def to_mont(self, a):
        """Normal -> Montgomery domain (multiply by R via r2 constant)."""
        r2 = jnp.asarray(np.array(self.r2, dtype=np.uint32))
        return self.mont_mul(a, r2)

    def from_mont(self, a):
        """Montgomery -> normal domain (multiply by 1)."""
        one = np.zeros(self.L, dtype=np.uint32)
        one[0] = 1
        return self.mont_mul(a, jnp.asarray(one))

    # ----------------------------------------------------------- mod sums

    def sum_mod(self, x, axis: int):
        """Modular sum along ``axis`` of a ``[..., L]`` limb array.

        Tree reduction of ``add_mod`` keeps every intermediate canonical.
        """
        return _jit_sum_mod(self, x, axis)

    def _sum_mod_impl(self, x, axis: int):
        n = x.shape[axis]
        if n == 1:
            return jnp.squeeze(x, axis=axis)
        half = n // 2
        lo = jax.lax.slice_in_dim(x, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(x, half, 2 * half, axis=axis)
        acc = self._add_mod_impl(lo, hi)
        if n % 2:
            tail = jax.lax.slice_in_dim(x, 2 * half, n, axis=axis)
            acc = jnp.concatenate([acc, tail], axis=axis)
        return self._sum_mod_impl(acc, axis)

    # --------------------------------------------------- host conversions

    def encode(self, values) -> np.ndarray:
        """Host: canonical ints -> device limb array."""
        return to_limbs(np.vectorize(lambda v: int(v) % self.p, otypes=[object])(
            np.asarray(values, dtype=object)
        ), self.L)

    def encode_mont(self, values) -> np.ndarray:
        """Host: canonical ints -> Montgomery-form device limb array."""
        R = 1 << (_W * self.L)
        vals = np.vectorize(lambda v: (int(v) * R) % self.p, otypes=[object])(
            np.asarray(values, dtype=object)
        )
        return to_limbs(vals, self.L)

    def decode(self, limb_array) -> np.ndarray:
        """Host: device limb array -> object array of canonical ints."""
        return from_limbs(np.asarray(limb_array))

    def encode_i64(self, values: np.ndarray) -> np.ndarray:
        """Vectorised int64 fast path (p < 2**63): canonical ints -> limbs."""
        if self.p >= (1 << 63):
            raise ValueError("encode_i64 requires a modulus below 2**63")
        arr = np.asarray(values, dtype=np.int64) % self.p
        out = np.empty(arr.shape + (self.L,), dtype=np.uint32)
        for j in range(self.L):
            out[..., j] = ((arr >> (16 * j)) & 0xFFFF).astype(np.uint32)
        return out

    def decode_i64(self, limb_array) -> np.ndarray:
        """Vectorised limbs -> int64 (p < 2**63)."""
        if self.p >= (1 << 63):
            raise ValueError("decode_i64 requires a modulus below 2**63")
        arr = np.asarray(limb_array).astype(np.int64)
        out = np.zeros(arr.shape[:-1], dtype=np.int64)
        for j in reversed(range(self.L)):
            out = (out << 16) | arr[..., j]
        return out


# Jit-cached entry points (self is static: LimbContext is a frozen dataclass).
_jit_add_mod = jax.jit(LimbContext._add_mod_impl, static_argnums=0)
_jit_sub_mod = jax.jit(LimbContext._sub_mod_impl, static_argnums=0)
_jit_mont_mul = jax.jit(LimbContext._mont_mul_impl, static_argnums=0)
_jit_sum_mod = jax.jit(LimbContext._sum_mod_impl, static_argnums=(0, 2))
