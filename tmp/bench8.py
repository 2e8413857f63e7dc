"""Benchmark the mxu8 kernel at the headline shape vs the 7-bit kernel."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from sda_tpu.models import FederatedAggregation
from sda_tpu.ops.modmat import uniform_limbs
from sda_tpu.ops.mxu8 import Mxu8Context, fused_share_combine_mxu8, planar8_from_batched
from sda_tpu.utils.profiling import device_time, roofline

dimension, participants = 1_000_002, 128
model = FederatedAggregation.packed_64bit(dimension=dimension)
engine = model.engine
spec, ctx = engine.spec, engine.ctx
mxu8 = Mxu8Context.create(ctx)
k_, r_ = spec.secret_count, spec.randomness_count

secrets = jax.jit(
    lambda key: uniform_limbs(ctx, key, (participants, engine.nb, k_))
)(jax.random.key(7))

for lanes in (512, 1024, 2048):
    sec8 = jax.jit(lambda x: planar8_from_batched(mxu8, x, lanes))(secrets)
    sec8.block_until_ready()
    f = jax.jit(
        lambda s8, seed: fused_share_combine_mxu8(
            mxu8, spec.share_matrix, s8, participants, k_, r_, seed=seed,
            lanes=lanes, reconstruct_matrix=spec.reconstruct_matrix,
        )
    )
    dt, out = device_time(lambda i: f(sec8, jnp.asarray(i, jnp.int32)), iters=10)
    hbm = sec8.size + out.size * out.dtype.itemsize
    rep = roofline(dt, hbm_bytes=hbm)
    print(
        f"lanes={lanes}: {dt*1e3:.3f} ms  ({participants/dt:.0f} aggs/s, "
        f"stream {sec8.size/1e9:.3f} GB, hbm-frac {rep['utilization']['hbm']:.3f})"
    )
    # correctness cross-check
    ref = jax.jit(lambda s: ctx.sum_mod(s, axis=0))(secrets)
    from sda_tpu.ops.mxu8 import batched_from_planar_lm
    got = batched_from_planar_lm(out, engine.nb, 3)
    assert bool(jnp.array_equal(got, ref)), "reveal mismatch"
