"""Find which kernel construct breaks DMA/compute overlap.

Start from the pure-DMA kernel (known to overlap) and add pieces:
  D0: row-sum only
  D1: + int8 matmul against a [96, rows] VMEM matrix
  D2: + PRNG draw (no accumulation, folded into output trivially)
  D3: + PRNG draw + u16-field accumulation
  D4: D3 + matmul (the real share+rand structure, trivial epilogue)
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sda_tpu.models import FederatedAggregation
from sda_tpu.ops.modmat import uniform_limbs
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
rows, nbp = sec8.shape
big = np.random.randint(-128, 128, size=(96, rows), dtype=np.int8)
words_per_p, pg = 20, 8


def make(variant):
    def kernel(seed_ref, big_ref, x_ref, o_ref):
        T = lanes
        if variant == "D0":
            o_ref[...] = jnp.sum(x_ref[...].astype(jnp.int32), axis=0, keepdims=True)[:1]
            return
        acc = jnp.zeros((96, T), jnp.int32)
        if variant in ("D1", "D4"):
            acc = jax.lax.dot_general(
                big_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        if variant in ("D2", "D3", "D4"):
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            accE = jnp.zeros((words_per_p, T), jnp.uint32)
            accO = jnp.zeros((words_per_p, T), jnp.uint32)
            for _ in range(participants // pg):
                w = pltpu.bitcast(
                    pltpu.prng_random_bits((pg * words_per_p, T)), jnp.uint32
                )
                if variant == "D2":
                    accE = accE + w[:words_per_p]  # one add: consume the draw
                else:
                    w = w.reshape(pg, words_per_p, T)
                    for j in range(pg):
                        accE = accE + (w[j] & 0xFFFF)
                        accO = accO + (w[j] >> 16)
            o_ref[...] = acc[:1] + (accE[:1] + accO[:1]).astype(jnp.int32)
            return
        o_ref[...] = acc[:1]

    def run(x, seed):
        return pl.pallas_call(
            kernel,
            grid=(nbp // lanes,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(big.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, lanes), lambda t: (0, t), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, lanes), lambda t: (0, t), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, nbp), jnp.int32),
        )(jnp.asarray([seed], jnp.int32), jnp.asarray(big), x)

    return jax.jit(run)


for v in ("D0", "D1", "D2", "D3", "D4"):
    f = make(v)
    dt, _ = device_time(lambda i: f(sec8, i), iters=10)
    print(f"{v}: {dt*1e3:.3f} ms")
    jax.clear_caches()
