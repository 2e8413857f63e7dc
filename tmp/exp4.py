import sys, os
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tmp")
import numpy as np, jax, jax.numpy as jnp
from sda_tpu.models import FederatedAggregation
from sda_tpu.ops.modmat import uniform_limbs
import mxu8x
from sda_tpu.ops.mxu8 import Mxu8Context, planar8_from_batched
from sda_tpu.utils.profiling import device_time

dimension, participants = 1_000_002, 128
model = FederatedAggregation.packed_64bit(dimension=dimension)
engine = model.engine
spec, ctx = engine.spec, engine.ctx
mxu8 = Mxu8Context.create(ctx)
k_, r_ = spec.secret_count, spec.randomness_count
secrets = jax.jit(lambda key: uniform_limbs(ctx, key, (participants, engine.nb, k_)))(jax.random.key(7))

for lanes in (1024, 2048):
    sec8 = jax.jit(lambda x: planar8_from_batched(mxu8, x, lanes))(secrets)
    sec8.block_until_ready()
    for ds in ("arbitrary", "parallel"):
        os.environ["MXU8_DS"] = ds
        os.environ["MXU8_DBG"] = "full"
        for pg in (8, 16, 32):
            f = jax.jit(
                lambda s8, seed: mxu8x.fused_share_combine_mxu8(
                    mxu8, spec.share_matrix, s8, participants, k_, r_, seed=seed,
                    lanes=lanes, reconstruct_matrix=spec.reconstruct_matrix, pg=pg,
                )
            )
            dt, out = device_time(lambda i: f(sec8, jnp.asarray(i, jnp.int32)), iters=10)
            print(f"A lanes={lanes} ds={ds} pg={pg}: {dt*1e3:.3f} ms")
            jax.clear_caches()
