import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sda_tpu.models import FederatedAggregation
from sda_tpu.ops.mxu8 import Mxu8Context, fused_share_combine_mxu8
from sda_tpu.utils.profiling import device_time, roofline

dimension = 1_000_002
model = FederatedAggregation.packed_64bit(dimension=dimension)
engine = model.engine
spec, ctx = engine.spec, engine.ctx
mxu8 = Mxu8Context.create(ctx)
k_, r_ = spec.secret_count, spec.randomness_count

import os
cfgs = [tuple(map(int, x.split("x"))) for x in os.environ.get("CFGS", "512x1024,1024x512").split(",")]
for participants, lanes in cfgs:
    nbp = -(-engine.nb // lanes) * lanes
    rows = participants * k_ * mxu8.L8
    sec8 = jax.jit(lambda key: jax.random.bits(key, (rows, nbp), dtype=jnp.uint8).astype(jnp.int8))(jax.random.key(7))
    sec8.block_until_ready()
    f = jax.jit(
        lambda s8, seed: fused_share_combine_mxu8(
            mxu8, spec.share_matrix, s8, participants, k_, r_, seed=seed,
            lanes=lanes, reconstruct_matrix=spec.reconstruct_matrix,
        )
    )
    try:
        dt, out = device_time(lambda i: f(sec8, jnp.asarray(i, jnp.int32)), iters=5)
    except Exception as e:
        print(f"P={participants} lanes={lanes}: FAIL {str(e)[:160]}")
        jax.clear_caches(); continue
    hbm = sec8.size + out.size * 4
    rep = roofline(dt, hbm_bytes=hbm)
    print(f"P={participants} lanes={lanes}: {dt*1e3:.3f} ms  {participants/dt:.0f} aggs/s  hbm-frac {rep['utilization']['hbm']:.3f}")
    del sec8, out
    jax.clear_caches()
