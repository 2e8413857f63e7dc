"""Micro-bench: u32 multiply cost in a Pallas TPU kernel.

Streams the headline-sized input, then does N multiplies on [8,1024] u32
blocks per tile — variants: array*array, array*SMEM-scalar, array*const.
The delta over the no-mul baseline gives the per-mul cost.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sda_tpu.utils.profiling import device_time

lanes = 1024
nbp = 64 * lanes
rows = 256  # small stream so compute dominates
x = jnp.ones((rows, nbp), dtype=jnp.int8)

def make(n_mul, mode):
    def kernel(s_ref, x_ref, o_ref):
        a = x_ref[:8, :].astype(jnp.uint32) + 3
        acc = a
        for i in range(n_mul):
            if mode == "arr":
                acc = (acc * a) & 0xFFFF
            elif mode == "smem":
                acc = (acc * s_ref[i % 4]) & 0xFFFF
            else:
                acc = (acc * jnp.uint32(40503 + i)) & 0xFFFF
        o_ref[...] = acc[:1].astype(jnp.int32)

    def run(xx):
        return pl.pallas_call(
            kernel,
            grid=(nbp // lanes,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rows, lanes), lambda t: (0, t), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, lanes), lambda t: (0, t), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, nbp), jnp.int32),
        )(jnp.asarray([3, 5, 7, 11], jnp.uint32), xx)

    return jax.jit(run)

for mode in ("arr", "const"):
    base = None
    for n_mul in (0, 128):
        f = make(n_mul, mode)
        dt, _ = device_time(lambda i: f(x), iters=10)
        if n_mul == 0:
            base = dt
        else:
            per = (dt - base) / n_mul / (nbp // lanes)
            print(f"{mode} n={n_mul}: {dt*1e3:.3f} ms -> {per*1e9:.1f} ns/mul/tile ({per*940e6*1e0:.2f} cyc on [8,1024])")
        jax.clear_caches()
