"""Bulk device-pipeline example: aggregate many participants' vectors.

The protocol-level flow (agents, sealed boxes, HTTP) is shown by
simple-cli-example.sh; this example drives the accelerator compute core
directly — the path a serving deployment uses once participations are
decrypted: share-generate + combine + reconstruct for a whole batch of
participants in one compiled step, then verify the reveal against the
plain modular sum.

Run on any backend (CPU works; a TPU makes it fast):

    python examples/bulk_aggregation.py [--participants 32] [--dimension 4096]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# runnable as `python examples/bulk_aggregation.py` from anywhere: the repo
# root (this file's parent directory) is the import root for sda_tpu
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--participants", type=int, default=32)
    ap.add_argument("--dimension", type=int, default=4096)
    args = ap.parse_args()

    import numpy as np

    from sda_tpu.models import FederatedAggregation

    # 64-bit pseudo-Mersenne production field, packed Shamir (3 secrets per
    # polynomial, committee of 8, tolerates 1 missing clerk)
    model = FederatedAggregation.packed_64bit(dimension=args.dimension)
    print(f"field: p = {model.scheme_modulus} "
          f"({model.scheme_modulus.bit_length()}-bit)", file=sys.stderr)

    secrets, key = model.example_inputs(participants=args.participants, seed=0)
    t0 = time.perf_counter()
    out = model.forward(secrets, key)  # mask + share + combine + reconstruct
    revealed = model.reveal(out)
    dt = time.perf_counter() - t0

    # ground truth: the plain modular sum of everyone's vectors (the same
    # draws example_inputs made)
    rng = np.random.default_rng(0)
    plain = rng.integers(
        0, min(model.scheme_modulus, 1 << 31),
        size=(args.participants, args.dimension),
    )
    want = plain.astype(object).sum(axis=0) % model.scheme_modulus
    ok = all(int(a) == int(b) for a, b in zip(revealed, want))
    print(f"aggregated {args.participants} x {args.dimension}-dim in "
          f"{dt*1e3:.1f} ms (first call includes compile); reveal "
          f"{'matches' if ok else 'DOES NOT match'} the modular sum",
          file=sys.stderr)
    print(" ".join(str(int(x)) for x in revealed[:8]), "...")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
