"""Per-kernel roofline report for the headline configuration.

For each stage of the MXU aggregation pipeline this prints the achieved
fraction of the detected chip's HBM / MXU-int8 / VPU ceilings and the
distance to speed-of-light (BASELINE: "speed-of-light modular kernels").
Run on a real chip; numbers come from device trace events, not wall clock.

Usage: python bench_roofline.py [--dimension 1000002] [--participants 128]
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dimension", type=int, default=1_000_002)
    ap.add_argument("--participants", type=int, default=128)
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--breakdown", action="store_true",
                    help="also print per-module device-time breakdown")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sda_tpu.models import FederatedAggregation
    from sda_tpu.ops.modmat import uniform_limbs
    from sda_tpu.utils.profiling import detect_chip, device_time, roofline

    model = FederatedAggregation.packed_64bit(dimension=args.dimension)
    engine = model.engine
    mxu = engine.mxu
    spec = engine.spec
    P, lanes = args.participants, args.lanes
    k, r, n = spec.secret_count, spec.randomness_count, spec.share_count
    L7 = mxu.L7
    chip = detect_chip()
    print(f"# chip: {chip.name}", file=sys.stderr)

    secrets = jax.jit(
        lambda key: uniform_limbs(engine.ctx, key, (P, engine.nb, k))
    )(jax.random.key(7))
    sec7 = jax.jit(lambda x: engine.planar7_secrets(x, lanes))(secrets)
    sec7.block_until_ready()
    nbp = sec7.shape[1]

    # reduced big-matrix accounting (sda_tpu/ops/mxu_kernel.py): stage-1
    # output is n_pad = roundup(n*L7, 32) rows; rand-sum contracts
    # groups * 8 * ceil(r*2L7/4) P-independent rows; the in-kernel
    # reconstruction contracts n*L7 rows into roundup(k*L7, 32)
    n_pad = -(-(n * L7) // 32) * 32
    n_pad2 = -(-(k * L7) // 32) * 32
    words_per_p = -(-(r * 2 * L7) // 4)
    groups = -(-P // 129)

    # ---- stage 1+2 fused: share + combine + reconstruct (one dispatch)
    dt, out = device_time(
        lambda i: engine.aggregate_mxu_kernel(
            sec7, jnp.asarray(i, jnp.int32), p_count=P, lanes=lanes
        ),
        iters=10,
    )
    mxu_ops = 2.0 * nbp * (
        n_pad * (P * k * L7 + groups * 8 * words_per_p) + n_pad2 * n * L7
    )
    vpu_ops = nbp * (P * words_per_p * 5.0 + 40.0 * n * L7)
    hbm = sec7.size + out.size * 4
    rep = roofline(dt, hbm_bytes=hbm, mxu_int8_ops=mxu_ops, vpu_u32_ops=vpu_ops)
    print(f"# full pipeline: {dt*1e3:.2f} ms  {json.dumps(rep)}", file=sys.stderr)

    # ---- combined-only variant (streaming accumulate path, no stage 2)
    dt_c, comb = device_time(
        lambda i: engine.mxu_kernel_combined(
            sec7, jnp.asarray(i, jnp.int32), P, lanes
        ),
        iters=10,
    )
    mxu_ops_c = 2.0 * nbp * n_pad * (P * k * L7 + groups * 8 * words_per_p)
    hbm_c = sec7.size + comb.size * 4
    rep_c = roofline(
        dt_c, hbm_bytes=hbm_c, mxu_int8_ops=mxu_ops_c,
        vpu_u32_ops=nbp * P * words_per_p * 5.0,
    )
    print(f"# combine-only:  {dt_c*1e3:.2f} ms  {json.dumps(rep_c)}", file=sys.stderr)

    breakdown = None
    if args.breakdown:
        from sda_tpu.utils.profiling import device_breakdown

        breakdown = device_breakdown(
            lambda i: engine.aggregate_mxu_kernel(
                sec7, jnp.asarray(i, jnp.int32), p_count=P, lanes=lanes
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
