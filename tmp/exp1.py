"""Experiment: decompose the headline kernel's 2.55 ms into components.

Variants (all at the headline shape: P=128, dim=1M, 64-bit field):
  A. full kernel (share+combine+reconstruct, rand-sum mode)   [r02 headline]
  B. no randomness (rand_count=0): DMA + secrets matmul + epilogue
  C. no reconstruction stage (reconstruct_matrix=None, u32 out)
  D. pure-DMA floor: trivial pallas kernel streaming the same tiles
  E. lanes sweep on the full kernel
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from sda_tpu.models import FederatedAggregation
from sda_tpu.ops.modmat import uniform_limbs
from sda_tpu.ops.mxu_kernel import fused_share_combine_mxu
from sda_tpu.utils.profiling import device_time

dimension, participants = 1_000_002, 128
model = FederatedAggregation.packed_64bit(dimension=dimension)
engine = model.engine
spec, mxu = engine.spec, engine.mxu
k_, r_ = spec.secret_count, spec.randomness_count

secrets = jax.jit(
    lambda key: uniform_limbs(engine.ctx, key, (participants, engine.nb, k_))
)(jax.random.key(7))

for lanes in (1024,):
    sec7 = jax.jit(lambda x: engine.planar7_secrets(x, lanes))(secrets)
    sec7.block_until_ready()
    rows, nbp = sec7.shape
    print(f"sec7 {sec7.shape} = {sec7.size/1e9:.3f} GB, tiles={nbp//lanes}")

    # A: full kernel
    dt, _ = device_time(
        lambda i: engine.aggregate_mxu_kernel(
            sec7, jnp.asarray(i, dtype=jnp.int32), p_count=participants, lanes=lanes
        ),
        iters=10,
    )
    print(f"A full (lanes={lanes}): {dt*1e3:.3f} ms")

    # B: rand_count=0 (no PRNG/no rand accumulation/no rand matmul)
    f_b = jax.jit(
        lambda sec7, s: fused_share_combine_mxu(
            mxu, spec.share_matrix, sec7, participants, k_, 0, seed=s,
            lanes=lanes, reconstruct_matrix=spec.reconstruct_matrix,
        )
    )
    dt_b, _ = device_time(lambda i: f_b(sec7, jnp.asarray(i, jnp.int32)), iters=10)
    print(f"B no-rand: {dt_b*1e3:.3f} ms")

    # C: no reconstruction stage (u32 out => bigger output write)
    f_c = jax.jit(
        lambda sec7, s: fused_share_combine_mxu(
            mxu, spec.share_matrix, sec7, participants, k_, r_, seed=s,
            lanes=lanes,
        )
    )
    dt_c, _ = device_time(lambda i: f_c(sec7, jnp.asarray(i, jnp.int32)), iters=10)
    print(f"C no-recon: {dt_c*1e3:.3f} ms")

    # B2: no rand AND no recon
    f_b2 = jax.jit(
        lambda sec7, s: fused_share_combine_mxu(
            mxu, spec.share_matrix, sec7, participants, k_, 0, seed=s, lanes=lanes,
        )
    )
    dt_b2, _ = device_time(lambda i: f_b2(sec7, jnp.asarray(i, jnp.int32)), iters=10)
    print(f"B2 no-rand no-recon: {dt_b2*1e3:.3f} ms")

    # D: pure DMA floor — stream the same input tiles, reduce each to 8 rows
    def dma_kernel(x_ref, o_ref):
        # minimal compute: int8 -> int32 row-slice sum to force a read
        o_ref[...] = jnp.sum(x_ref[...].astype(jnp.int32), axis=0, keepdims=True)

    def run_dma(x):
        grid = (x.shape[1] // lanes,)
        return pl.pallas_call(
            dma_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((rows, lanes), lambda t: (0, t), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, lanes), lambda t: (0, t), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, nbp), jnp.int32),
        )(x)

    f_d = jax.jit(run_dma)
    dt_d, _ = device_time(lambda i: f_d(sec7), iters=10)
    bw = sec7.size / dt_d / 1e9
    print(f"D pure-DMA: {dt_d*1e3:.3f} ms -> {bw:.0f} GB/s effective")
