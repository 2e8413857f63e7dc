"""Per-kernel roofline report for the headline configuration.

For each stage of the byte-limb (gen-4) aggregation pipeline this prints
the achieved fraction of the detected chip's HBM / MXU-int8 / VPU / PRNG
ceilings and the distance to speed-of-light (BASELINE: "speed-of-light
modular kernels"). Run on a real chip; numbers come from device trace
events, not wall clock (tunneled backends deflate wall-clock loops).

Usage: python bench_roofline.py [--dimension 1000002] [--participants 768]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dimension", type=int, default=1_000_002)
    ap.add_argument("--participants", type=int, default=768)
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--breakdown", action="store_true",
                    help="also print per-module device-time breakdown")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _make_planar_secrets, _mxu8_model
    from sda_tpu.models import FederatedAggregation
    from sda_tpu.utils.profiling import detect_chip, device_time, roofline

    model = FederatedAggregation.packed_64bit(dimension=args.dimension)
    engine = model.engine
    mxu8 = engine.mxu8
    spec = engine.spec
    P, lanes = args.participants, args.lanes
    k, n = spec.secret_count, spec.share_count
    chip = detect_chip()
    print(f"# chip: {chip.name}  (p = 2^{spec.modulus.bit_length()} - "
          f"{(1 << spec.modulus.bit_length()) - spec.modulus})", file=sys.stderr)

    nbp = -(-engine.nb // lanes) * lanes
    rows = P * k * mxu8.L8
    sec8 = _make_planar_secrets(engine, jax.random.key(7), rows, nbp)

    # ---- fused: share + combine + reconstruct (one dispatch)
    dt, out = device_time(
        lambda i: engine.aggregate_mxu8_kernel(
            sec8, jnp.asarray(i, jnp.int32), p_count=P, lanes=lanes
        ),
        iters=8,
    )
    rep = roofline(
        dt, **_mxu8_model(engine, P, nbp, sec8.size, out.size * 4)
    )
    print(f"# full pipeline: {dt*1e3:.2f} ms  {json.dumps(rep)}", file=sys.stderr)

    # ---- combined-only variant (streaming accumulate path, no stage 2)
    dt_c, comb = device_time(
        lambda i: engine.mxu8_kernel_combined(
            sec8, jnp.asarray(i, jnp.int32), P, lanes
        ),
        iters=8,
    )
    rep_c = roofline(
        dt_c,
        **_mxu8_model(engine, P, nbp, sec8.size, comb.size * 4, recon=False),
    )
    print(f"# combine-only:  {dt_c*1e3:.2f} ms  {json.dumps(rep_c)}", file=sys.stderr)

    breakdown = None
    if args.breakdown:
        from sda_tpu.utils.profiling import device_breakdown

        breakdown = device_breakdown(
            lambda i: engine.aggregate_mxu8_kernel(
                sec8, jnp.asarray(i, jnp.int32), p_count=P, lanes=lanes
            ),
            iters=5,
        )
        for name, ms in list(breakdown.items())[:12]:
            print(f"# breakdown: {ms:8.3f} ms  {name}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline pipeline roofline",
                "chip": chip.name,
                "ms_per_step": round(dt * 1e3, 3),
                "full_pipeline": rep,
                "combine_only": rep_c,
                **({"breakdown_ms": breakdown} if breakdown else {}),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
