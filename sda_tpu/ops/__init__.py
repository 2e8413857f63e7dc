"""Device compute kernels for modular field math.

- :mod:`sda_tpu.ops.limbs`  — 16-bit-limb Montgomery arithmetic (uint32 only;
  TPU-native: no 64-bit integer emulation needed), any modulus width.
- :mod:`sda_tpu.ops.modmat` — batched modular matmul / combine built on limbs
  (the share-generation, combination, and reconstruction hot paths).
- :mod:`sda_tpu.ops.pallas_kernels` — hand-written Pallas TPU kernels for the
  streaming combine and fused share pipelines.
"""

from sda_tpu.ops import limbs, modmat

__all__ = ["limbs", "modmat"]
