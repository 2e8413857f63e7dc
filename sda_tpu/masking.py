"""Masking schemes: None / Full / ChaCha.

Semantics mirror /root/reference/client/src/crypto/masking/:

- ``none.rs``: empty mask, pass-through.
- ``full.rs``: additive one-time pad; participant uploads the full mask
  (encrypted for the recipient), recipient sums all masks and subtracts.
- ``chacha.rs``: participant uploads only a small PRG *seed* (as i64 words);
  recipient re-expands every seed — a bandwidth/compute trade.

All signed arithmetic uses Rust truncated remainders; values stay in
``(-m, m)`` until ``positive()`` at the reveal edge.
"""

from __future__ import annotations

import numpy as np

from sda_tpu import chacha
from sda_tpu.fields import PrimeField, trunc_add_mod, trunc_mod, trunc_sub_mod
from sda_tpu.utils.errors import Invalid

__all__ = ["NoneMasker", "FullMasker", "ChaChaMasker", "masker_for_scheme"]


class NoneMasker:
    """No masking (none.rs): secrets are shared directly with the clerks."""

    def mask(self, secrets):
        return np.zeros(0, dtype=np.int64), np.asarray(secrets, dtype=np.int64).copy()

    def combine(self, masks):
        for m in masks:
            if len(m) != 0:
                raise Invalid("unexpected non-empty mask for None masking")
        return np.zeros(0, dtype=np.int64)

    def unmask(self, mask_and_masked):
        mask, masked = mask_and_masked
        if len(mask) != 0:
            raise Invalid("unexpected non-empty mask for None masking")
        return np.asarray(masked).copy()


class FullMasker:
    """Full-entropy additive pad (full.rs).

    ``device_bulk_threshold``: when set and ``participants * dimension``
    reaches it, :meth:`combine` — the reveal-side hot loop that sums every
    participant's full-length mask (full.rs:38-52, driven from
    receive.rs:102-118) — streams the mask vectors through the accelerator
    limb accumulator (:func:`sda_tpu.engine.device_combine`). Masks are
    canonical ``[0, p)``, so the device's canonical sum is bit-identical
    to the host fold (no signed-representative divergence to reconcile).

    Routing note: the device route pays one host->device pass over the
    mask bytes, while the host fold (``trunc_add_mod``) already sustains
    ~2.5 GB/s on two cores — so it only wins when the accelerator link is
    faster than that times the core count (true for PCIe-attached chips,
    false for tunneled dev boxes; ``bench.py``'s ``fullmask_reveal``
    section measures both on the current host).
    """

    def __init__(self, modulus: int, device_bulk_threshold: int | None = None):
        self.modulus = modulus
        self._field = PrimeField(modulus)
        self.device_bulk_threshold = device_bulk_threshold

    # folds are exact in int64 via trunc_add_mod for any p < 2**63; only
    # genuinely >63-bit moduli pay for python-int (object) arithmetic.
    @property
    def _i64_ok(self) -> bool:
        return self.modulus < (1 << 63)

    def mask(self, secrets):
        secrets = np.asarray(secrets)
        masks = self._field.sample(secrets.shape)
        if self._i64_ok:
            masks = np.asarray(masks, dtype=np.int64)
            masked = trunc_add_mod(secrets, masks, self.modulus)  # full.rs:30-33
        else:
            masked = trunc_mod(secrets + masks, self.modulus)
        return masks, masked

    def combine(self, masks):
        masks = list(masks)
        if not masks:
            return np.zeros(0, dtype=np.int64)
        d = len(masks[0])
        if (
            self.device_bulk_threshold is not None
            and self._i64_ok
            and len(masks) * d >= self.device_bulk_threshold
        ):
            for m in masks:
                if len(m) != d:
                    raise Invalid("mask dimension mismatch")
            from sda_tpu.engine import device_combine

            return device_combine(self.modulus, masks)
        if self._i64_ok:
            acc = np.zeros(d, dtype=np.int64)
            for m in masks:
                if len(m) != d:
                    raise Invalid("mask dimension mismatch")
                m = np.asarray(m, dtype=np.int64)
                # decrypted wire masks can carry any i64; pre-reduce
                # out-of-domain vectors so trunc_add_mod stays exact
                if m.size and not (
                    int(m.min()) > -self.modulus and int(m.max()) < self.modulus
                ):
                    m = trunc_mod(np.asarray(m, dtype=object), self.modulus).astype(
                        np.int64
                    )
                acc = trunc_add_mod(acc, m, self.modulus)
            return acc
        acc = np.zeros(d, dtype=object)
        for m in masks:
            if len(m) != d:
                raise Invalid("mask dimension mismatch")
            acc = trunc_mod(acc + np.asarray(m, dtype=object), self.modulus)
        return acc

    def unmask(self, mask_and_masked):
        mask, masked = mask_and_masked
        if len(mask) != len(masked):
            raise Invalid("mask/masked dimension mismatch")
        if self._i64_ok:
            return trunc_sub_mod(
                np.asarray(masked, dtype=np.int64),
                np.asarray(mask, dtype=np.int64),
                self.modulus,
            )  # full.rs:62
        return trunc_mod(np.asarray(masked) - np.asarray(mask), self.modulus)


class ChaChaMasker:
    """Seed-compressed masking (chacha.rs): upload the PRG seed, not the mask.

    ``device_bulk_threshold``: when set and ``participants * dimension``
    reaches it, :meth:`combine` expands seeds on the accelerator
    (:mod:`sda_tpu.ops.chacha_kernel`), falling back to the exact host path
    for the (astronomically rare) seeds whose streams hit a gen_range
    rejection — the result is bit-identical either way.
    """

    def __init__(
        self,
        modulus: int,
        dimension: int,
        seed_bitsize: int,
        device_bulk_threshold: int | None = None,
    ):
        self.modulus = modulus
        self.dimension = dimension
        self.seed_bitsize = seed_bitsize
        self.device_bulk_threshold = device_bulk_threshold

    def mask(self, secrets):
        secrets = np.asarray(secrets)
        if secrets.shape[0] != self.dimension:
            raise Invalid("input dimension does not match masking scheme")
        seed_words = chacha.new_seed(self.seed_bitsize)
        mask = chacha.expand_masks([seed_words], self.dimension, self.modulus)[0]
        # overflow-safe even at 63-bit production primes (masks are
        # uniform in [0, p), so a plain int64 add can cross 2**63)
        masked = trunc_add_mod(secrets, np.asarray(mask, dtype=np.int64), self.modulus)
        # the uploaded "mask" is the seed, widened to i64 words (chacha.rs:48-52)
        return np.array(seed_words, dtype=np.int64), masked

    def combine(self, seeds_as_i64):
        seeds = [np.asarray(s, dtype=np.int64) for s in seeds_as_i64]
        if not seeds:
            return np.zeros(self.dimension, dtype=np.int64)
        # re-expand every participant's seed and fold (chacha.rs:60-75)
        word_lists = [[int(np.uint32(w)) for w in s] for s in seeds]
        if (
            self.device_bulk_threshold is not None
            and len(seeds) * self.dimension >= self.device_bulk_threshold
            and self.modulus % 2 == 1
        ):
            from sda_tpu.ops.chacha_kernel import combine_masks_device

            combined, bad = combine_masks_device(word_lists, self.dimension, self.modulus)
            if not bad:
                return np.array([int(x) for x in combined], dtype=np.int64)
            # exact-but-slow host fix-up for seeds whose stream hit a
            # gen_range rejection: redo everything host-side (rare)
        masks = chacha.expand_masks(word_lists, self.dimension, self.modulus)
        acc = np.zeros(self.dimension, dtype=np.int64)
        for row in masks:
            # rows are uniform in [0, p): overflow-safe fold required at
            # 63-bit production primes
            acc = trunc_add_mod(acc, np.asarray(row, dtype=np.int64), self.modulus)
        return acc

    def unmask(self, mask_and_masked):
        mask, masked = mask_and_masked
        if len(mask) != len(masked):
            raise Invalid("mask/masked dimension mismatch")
        return trunc_sub_mod(
            np.asarray(masked, dtype=np.int64),
            np.asarray(mask, dtype=np.int64),
            self.modulus,
        )


def masker_for_scheme(scheme, device_bulk_threshold: int | None = None):
    """Factory mirroring CryptoModule's masker construction (masking/mod.rs:33-52).

    ``device_bulk_threshold`` forwards to maskers with an accelerator bulk
    path (ChaCha seed re-expansion and the Full-mask combine, both at
    reveal time).
    """
    from sda_tpu import protocol as proto

    if isinstance(scheme, proto.NoMasking):
        return NoneMasker()
    if isinstance(scheme, proto.FullMasking):
        return FullMasker(scheme.modulus, device_bulk_threshold=device_bulk_threshold)
    if isinstance(scheme, proto.ChaChaMasking):
        return ChaChaMasker(
            scheme.modulus,
            scheme.dimension,
            scheme.seed_bitsize,
            device_bulk_threshold=device_bulk_threshold,
        )
    raise Invalid(f"unknown masking scheme: {scheme!r}")
