"""Measure the clerk-combine routing crossover backing
``sda_tpu.client.DEVICE_COMBINE_CROSSOVER``.

Both bulk routes pay the identical libsodium seal_open cost, so the choice
is between what happens after the open:

- **fused native** (ShareDecryptor.open_combine): varint-decode +
  modular-accumulate in the same C++ pass, no materialisation;
- **streamed device** (_streamed_decrypt + engine.device_combine): native
  batch decode, then host->device transfer + limb accumulate on the
  accelerator, one-chunk lookahead.

This times both FULL paths (including the shared opens) on synthetic but
real sealed jobs across job sizes, prints per-path rates, and reports the
observed crossover in total share elements. Writes CROSSOVER.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)


def main() -> int:
    import numpy as np

    from sda_tpu import protocol as proto
    from sda_tpu import sodium
    from sda_tpu.client import _streamed_decrypt
    from sda_tpu.client.crypto import ShareDecryptor
    from sda_tpu.engine import device_combine
    from sda_tpu.fields import find_special_prime_field
    from sda_tpu.utils.varint import encode_varints

    p, _, _ = find_special_prime_field(63, 8, 9)
    ek, dk = sodium.box_keypair()
    dec = ShareDecryptor(ek, dk)
    rng = np.random.default_rng(0)

    # (boxes, elements_per_box): config-2-like through config-4-like jobs
    shapes = [(1000, 334), (1000, 3334), (2000, 8334), (1000, 33334)]
    rows = []
    for n_boxes, d in shapes:
        vec = rng.integers(0, 1 << 62, size=d, dtype=np.int64) % p
        boxes = [
            proto.Encryption(data=sodium.seal(encode_varints(vec), ek))
            for _ in range(n_boxes)
        ]
        total = n_boxes * d

        t0 = time.perf_counter()
        fused = dec.open_combine(boxes, p, d)
        t_fused = time.perf_counter() - t0
        if fused is None:
            print("native library unavailable; nothing to measure")
            return 1

        # warm the device path's jit for this dimension first
        device_combine(p, _streamed_decrypt(dec, boxes[:256]))
        t0 = time.perf_counter()
        dev = device_combine(p, _streamed_decrypt(dec, boxes))
        t_dev = time.perf_counter() - t0
        assert np.array_equal(np.asarray(dev) % p, np.asarray(fused) % p)

        row = {
            "boxes": n_boxes,
            "elements_per_box": d,
            "total_elements": total,
            "fused_native_s": round(t_fused, 4),
            "streamed_device_s": round(t_dev, 4),
            "fused_elements_per_s": round(total / t_fused),
            "device_elements_per_s": round(total / t_dev),
            "winner": "device" if t_dev < t_fused else "fused_native",
        }
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    # crossover: first size where the device path wins (None if never)
    crossover = next(
        (r["total_elements"] for r in rows if r["winner"] == "device"), None
    )
    artifact = {
        "metric": "clerk combine routing crossover (total share elements)",
        "host_cores": os.cpu_count(),
        "rows": rows,
        "observed_crossover_elements": crossover,
        "note": (
            "both paths pay identical seal_open cost; the race is host "
            "decode+accumulate vs decode+transfer+device accumulate. On "
            "hosts where the accelerator link is fast (PCIe/owned chip) the "
            "device path wins earlier than on this tunneled dev box."
        ),
    }
    with open(os.path.join(ROOT, "CROSSOVER.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    sys.exit(main())
