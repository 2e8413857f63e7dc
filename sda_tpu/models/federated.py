"""The flagship workload: federated-model secure aggregation.

One object = one deployable configuration of the full device pipeline
(mask -> share -> transpose -> combine -> reconstruct -> unmask), matching
the reference's end-to-end loop (full_loop.rs) at bulk scale: 1M-dimension
gradient vectors from many participants (BASELINE configs 2-5).

Masking on device uses a counter-based PRG pad shared via seed (the
ChaCha-scheme semantics with a TPU-native PRG; bit-exact rand-0.3 ChaCha
stays on the host path in :mod:`sda_tpu.chacha`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sda_tpu.engine import TpuAggregationEngine
from sda_tpu.ops.modmat import uniform_limbs
from sda_tpu.sharing import AdditiveScheme, PackedShamirScheme

__all__ = ["FederatedAggregation"]


class FederatedAggregation:
    """Compiled secure-aggregation workload for a fixed configuration."""

    def __init__(self, scheme, dimension: int, masked: bool = True):
        self.scheme = scheme
        self.dimension = dimension
        self.masked = masked
        self.engine = TpuAggregationEngine(scheme.device_spec(), dimension)
        ctx = self.engine.ctx
        spec = self.engine.spec

        def forward(secrets, key):
            """One aggregation step: secrets [P, nb, k, L] -> revealed sums.

            The jittable "forward pass": per-participant mask pads cancel in
            the aggregate, so the device applies masks (participant side),
            aggregates shares, and unmasks with the combined pad (recipient
            side) — the full protocol data flow on device.
            """
            kr, km = jax.random.split(key)
            p_count = secrets.shape[0]
            if self.masked:
                pads = uniform_limbs(ctx, km, secrets.shape[:-1])
                masked = ctx.add_mod(secrets, pads)
                pad_sum = ctx.sum_mod(pads, axis=0)  # recipient-side combine
            else:
                masked = secrets
                pad_sum = None
            rand = uniform_limbs(ctx, kr, (p_count, self.engine.nb, spec.randomness_count))
            out = self.engine.aggregate(masked, rand)  # [nb, k, L]
            if pad_sum is not None:
                out = ctx.sub_mod(out, pad_sum)
            return out

        self.forward = jax.jit(forward)

    # ---------------------------------------------------------- host edges

    def example_inputs(self, participants: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        secrets = rng.integers(0, min(self.scheme_modulus, 1 << 31), size=(participants, self.dimension))
        limbs = self.engine.encode_secrets(secrets.astype(object))
        return jnp.asarray(limbs), jax.random.key(seed)

    @property
    def scheme_modulus(self) -> int:
        return self.engine.spec.modulus

    def reveal(self, out_limbs) -> np.ndarray:
        return self.engine.decode_output(out_limbs)

    # --------------------------------------------------------- constructors

    @classmethod
    def packed_64bit(cls, dimension: int = 1024, committee: int = 8) -> "FederatedAggregation":
        """BASELINE config-2 shape: 64-bit prime field, packed Shamir.

        The production prime is pseudo-Mersenne (p = 2^63 - 871, 72 | p-1)
        so device canonicalisation is multiply-free (fields.
        find_special_prime_field); any odd prime works via the generic
        Montgomery path.
        """
        from sda_tpu.fields import find_special_prime_field

        p, w2, w3 = find_special_prime_field(63, 8, 9)
        scheme = PackedShamirScheme(
            secret_count=3,
            share_count=committee,
            privacy_threshold=4,
            prime_modulus=p,
            omega_secrets=w2,
            omega_shares=w3,
        )
        return cls(scheme, dimension)

    @classmethod
    def packed_128bit(cls, dimension: int = 10_000) -> "FederatedAggregation":
        """BASELINE config-3 shape: 128-bit modulus, multi-limb arithmetic
        (pseudo-Mersenne p = 2^127 - 1495 for the multiply-free device
        canonicalisation)."""
        from sda_tpu.fields import find_special_prime_field

        p, w2, w3 = find_special_prime_field(127, 8, 9)
        scheme = PackedShamirScheme(
            secret_count=3,
            share_count=8,
            privacy_threshold=4,
            prime_modulus=p,
            omega_secrets=w2,
            omega_shares=w3,
        )
        return cls(scheme, dimension)

    @classmethod
    def additive_small(cls, dimension: int = 10, modulus: int = 433, share_count: int = 3):
        """README-walkthrough shape (config 1)."""
        return cls(AdditiveScheme(share_count=share_count, modulus=modulus), dimension)
