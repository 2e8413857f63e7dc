"""sda-tpu: a TPU-native secure-aggregation framework.

A from-scratch rebuild of the capabilities of snipsco/sda (a Rust MPC framework
for privately aggregating vectors from many participants) designed TPU-first:

- the cryptographic field math (additive + packed-Shamir secret sharing over
  prime fields, masking, share combination) is expressed as batched modular
  linear algebra compiled with JAX/XLA and hand-written Pallas kernels;
- scale-out happens over a ``jax.sharding.Mesh`` (participant axis sharded over
  chips, per-clerk combines as local segment sums + ``psum`` collectives,
  snapshot transposition as ``all_to_all``), not over protocol-level HTTP;
- the untrusted coordination plane (REST service, stores, sealed-box
  encryption, signatures) stays as a thin host-side layer for protocol parity
  with the reference (see /root/reference/README.md:176-195 for the layer map
  being re-imagined here).

Layer map (bottom-up):

- :mod:`sda_tpu.fields`    prime-field arithmetic (host numpy + device jnp)
- :mod:`sda_tpu.ntt`       mixed radix-2/3 number-theoretic transforms
- :mod:`sda_tpu.sharing`   additive & packed-Shamir share/combine/reconstruct
- :mod:`sda_tpu.masking`   None/Full/ChaCha maskers
- :mod:`sda_tpu.ops`       Pallas TPU kernels (modular ops, NTT, combine)
- :mod:`sda_tpu.parallel`  mesh utilities, sharded collectives
- :mod:`sda_tpu.engine`    the TPU executor for bulk aggregation workloads
- :mod:`sda_tpu.protocol`  wire-level resources & scheme descriptors
- :mod:`sda_tpu.service`   the 6 SDA service interfaces
- :mod:`sda_tpu.server`    in-process server + ACL + snapshot pipeline
- :mod:`sda_tpu.stores`    storage backends (json-file; mongo-gated)
- :mod:`sda_tpu.client`    participant / clerk / recipient workflows
- :mod:`sda_tpu.http`      REST transport (server + client proxy)
"""

__version__ = "0.1.0"

from sda_tpu.utils.errors import (
    SdaError,
    PermissionDenied,
    InvalidCredentials,
    Invalid,
)

__all__ = [
    "SdaError",
    "PermissionDenied",
    "InvalidCredentials",
    "Invalid",
    "__version__",
]
