"""Decompose mxu8 kernel time: no-rand / no-recon / rand-only variants."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from sda_tpu.models import FederatedAggregation
from sda_tpu.ops.modmat import uniform_limbs
from sda_tpu.ops.mxu8 import Mxu8Context, fused_share_combine_mxu8, planar8_from_batched
from sda_tpu.utils.profiling import device_time

dimension, participants = 1_000_002, 128
model = FederatedAggregation.packed_64bit(dimension=dimension)
engine = model.engine
spec, ctx = engine.spec, engine.ctx
mxu8 = Mxu8Context.create(ctx)
k_, r_ = spec.secret_count, spec.randomness_count
lanes = 1024

secrets = jax.jit(
    lambda key: uniform_limbs(ctx, key, (participants, engine.nb, k_))
)(jax.random.key(7))
sec8 = jax.jit(lambda x: planar8_from_batched(mxu8, x, lanes))(secrets)
sec8.block_until_ready()

def run(tag, rand_count, recon):
    f = jax.jit(
        lambda s8, seed: fused_share_combine_mxu8(
            mxu8, spec.share_matrix, s8, participants, k_, rand_count,
            seed=seed, lanes=lanes,
            reconstruct_matrix=spec.reconstruct_matrix if recon else None,
        )
    )
    dt, out = device_time(lambda i: f(sec8, jnp.asarray(i, jnp.int32)), iters=10)
    print(f"{tag}: {dt*1e3:.3f} ms")
    return dt

run("A full (rand+recon)", r_, True)
run("B no-rand + recon", 0, True)
run("B2 no-rand no-recon", 0, False)
run("C rand no-recon", r_, False)
