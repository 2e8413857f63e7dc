import sys, os
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tmp")
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
lanes = 1024
secrets = jax.jit(lambda key: uniform_limbs(ctx, key, (participants, engine.nb, k_)))(jax.random.key(7))
sec8 = jax.jit(lambda x: planar8_from_batched(mxu8, x, lanes))(secrets)
sec8.block_until_ready()

for dbg in ("full", "nomul", "nofold", "nochain"):
    os.environ["MXU8_DBG"] = dbg
    f = jax.jit(
        lambda s8, seed: mxu8x.fused_share_combine_mxu8(
            mxu8, spec.share_matrix, s8, participants, k_, 0, seed=seed, lanes=lanes,
        )
    )
    dt, out = device_time(lambda i: f(sec8, jnp.asarray(i, jnp.int32)), iters=10)
    print(f"B2-{dbg}: {dt*1e3:.3f} ms")
    jax.clear_caches()
