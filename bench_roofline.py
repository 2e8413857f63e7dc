"""Per-kernel roofline report for the headline configuration.

For each stage of the MXU aggregation pipeline this prints the achieved
fraction of the chip's HBM / MXU-int8 / VPU ceilings and the distance to
speed-of-light (BASELINE: "speed-of-light modular kernels"). Run on a real
chip; numbers come from device trace events, not wall clock.

Usage: python bench_roofline.py [--dimension 1000002] [--participants 32]
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dimension", type=int, default=1_000_002)
    ap.add_argument("--participants", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sda_tpu.models import FederatedAggregation
    from sda_tpu.ops.modmat import uniform_limbs
    from sda_tpu.utils.profiling import V5E, device_time, roofline

    model = FederatedAggregation.packed_64bit(dimension=args.dimension)
    engine = model.engine
    mxu = engine.mxu
    spec = engine.spec
    P, nb = args.participants, engine.nb
    k, r, n = spec.secret_count, spec.randomness_count, spec.share_count
    L7, L16 = mxu.L7, engine.ctx.L

    secrets = jax.jit(
        lambda key: uniform_limbs(engine.ctx, key, (P, nb, k))
    )(jax.random.key(7))
    sec7 = jax.jit(lambda x: engine.planar7_secrets(x, 1024))(secrets)
    sec7.block_until_ready()
    nbp = sec7.shape[1]

    # ---- stage 1: fused share + combine (the MXU kernel)
    from sda_tpu.ops.mxu_kernel import fused_share_combine_mxu

    @jax.jit
    def share_combine(sec7, seed):
        return fused_share_combine_mxu(
            mxu, spec.share_matrix, sec7, P, k, r, seed=seed, lanes=1024, out7=True
        )

    dt, comb7 = device_time(
        lambda i: share_combine(sec7, jnp.asarray(i, jnp.int32)), iters=10
    )
    cols = 3 * L7  # widest slot (2*L7 raw rand) + L7 - 1 + rand-sum carry
    n_pad = -(-(n * cols) // 32) * 32
    # rand-sum mode (P <= 129): randomness contracts over 8*ceil(r*2L7/4)
    # P-independent rows instead of P*r*2L7
    words_per_p = -(-(r * 2 * L7) // 4)
    mxu_ops = 2.0 * nbp * n_pad * (P * k * L7 + 8 * words_per_p)
    hbm = sec7.size + comb7.size
    rep = roofline(dt, hbm_bytes=hbm, mxu_int8_ops=mxu_ops)
    print(f"# share+combine: {dt*1e3:.2f} ms  {json.dumps(rep)}", file=sys.stderr)

    # ---- stage 2: reconstruction (same kernel, p_count=1)
    c7flat = comb7.reshape(-1, comb7.shape[-1])

    @jax.jit
    def rec(c7, seed):
        out = fused_share_combine_mxu(
            mxu, spec.reconstruct_matrix, c7, 1, n, 0, lanes=1024
        )
        return out + (seed & 0)  # seed keeps every timed execution distinct

    dt_r, out = device_time(lambda i: rec(c7flat, jnp.asarray(i, jnp.uint32)), iters=10)
    cols_r = 2 * L7 - 1
    n_pad_r = -(-(k * cols_r) // 32) * 32
    mxu_ops_r = 2.0 * nbp * n_pad_r * n * L7
    hbm_r = c7flat.size + out.size * 4
    rep_r = roofline(dt_r, hbm_bytes=hbm_r, mxu_int8_ops=mxu_ops_r)
    print(f"# reconstruct:   {dt_r*1e3:.2f} ms  {json.dumps(rep_r)}", file=sys.stderr)

    total = dt + dt_r
    print(
        json.dumps(
            {
                "metric": "headline pipeline roofline",
                "chip": V5E.name,
                "ms_per_step": round(total * 1e3, 3),
                "share_combine": rep,
                "reconstruct": rep_r,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
