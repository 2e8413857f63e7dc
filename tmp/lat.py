import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from sda_tpu.models import FederatedAggregation
from sda_tpu.ops.mxu8 import fused_share_combine_mxu8
from sda_tpu.utils.profiling import device_time
from bench import _make_planar_secrets

model = FederatedAggregation.packed_64bit(dimension=1002)
engine = model.engine
spec, ctx, mxu8 = engine.spec, engine.ctx, engine.mxu8
k_, r_ = spec.secret_count, spec.randomness_count
lanes = 384
rows = 100 * k_ * mxu8.L8
sec8 = _make_planar_secrets(engine, jax.random.key(1), rows, lanes)

f_k = jax.jit(lambda s8, seed: fused_share_combine_mxu8(
    mxu8, spec.share_matrix, s8, 100, k_, r_, seed=seed, lanes=lanes,
    reconstruct_matrix=spec.reconstruct_matrix))
dt, _ = device_time(lambda i: f_k(sec8, jnp.asarray(i, jnp.int32)), iters=50)
print(f"kernel-only: {dt*1e6:.2f} us")

dt2, _ = device_time(lambda i: engine.aggregate_mxu8_kernel(sec8, jnp.asarray(i, jnp.int32), p_count=100, lanes=lanes), iters=50)
print(f"kernel+transform: {dt2*1e6:.2f} us")

f_c = jax.jit(lambda s8, seed: fused_share_combine_mxu8(
    mxu8, spec.share_matrix, s8, 100, k_, r_, seed=seed, lanes=lanes))
dt3, _ = device_time(lambda i: f_c(sec8, jnp.asarray(i, jnp.int32)), iters=50)
print(f"combined-only: {dt3*1e6:.2f} us")

f_nr = jax.jit(lambda s8, seed: fused_share_combine_mxu8(
    mxu8, spec.share_matrix, s8, 100, k_, 0, seed=seed, lanes=lanes,
    reconstruct_matrix=spec.reconstruct_matrix))
dt4, _ = device_time(lambda i: f_nr(sec8, jnp.asarray(i, jnp.int32)), iters=50)
print(f"no-rand recon: {dt4*1e6:.2f} us")
