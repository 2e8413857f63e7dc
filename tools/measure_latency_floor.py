"""Config-2 single-job latency decomposition: launch floor vs kernel work.

BASELINE config 2 (1k-dim, 100 participants) is a ~1.2 MB-input job whose
single-launch time sat at 0.21 of HBM speed-of-light in r3. This tool
separates what is shrinkable from what is the platform's launch floor, by
timing (device-trace, not wall clock):

1. the real config-2 kernel (share+combine+reconstruct, one launch);
2. a NO-OP Pallas kernel with identical block specs / grid / output shape
   (just writes zeros) — the pure launch + DMA floor for this shape;
3. the same no-op with a 1-element input — the bare launch floor;
4. the real kernel on 64 lane-concatenated jobs (the serving answer).

If (1) - (2) is small, the gap to SoL is launch overhead, not kernel
inefficiency — and the artifact documents the floor. Writes
LATENCY_FLOOR.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench
    from sda_tpu.models import FederatedAggregation
    from sda_tpu.utils.profiling import device_time, roofline

    dimension, participants = 1002, 100
    model = FederatedAggregation.packed_64bit(dimension=dimension)
    engine = model.engine
    mxu8 = engine.mxu8
    k = engine.spec.secret_count
    lanes = -(-engine.nb // 128) * 128
    rows = participants * k * mxu8.L8
    sec8 = bench._make_planar_secrets(engine, jax.random.key(1), rows, lanes)
    out_rows = engine.ctx.L * k

    # 1. the real single-launch job
    dt_real, out = device_time(
        lambda i: engine.aggregate_mxu8_kernel(
            sec8, jnp.asarray(i, dtype=jnp.int32), p_count=participants,
            lanes=lanes,
        ),
        iters=30,
    )
    bench._reveal_check_slice(engine, sec8, out, participants, width=lanes)
    rep = roofline(
        dt_real,
        **bench._mxu8_model(engine, participants, lanes, sec8.size,
                            out_rows * lanes * 4),
    )

    # 2. no-op with the same input block + output shape (launch + DMA
    # floor). The seed scalar flows into the output so every timed
    # execution is distinct (device_time's contract)
    def noop_kernel(seed_ref, s_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref) + seed_ref[0].astype(o_ref.dtype)

    noop = pl.pallas_call(
        noop_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((rows, lanes), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((out_rows, lanes), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, lanes), jnp.uint32),
    )
    noop_j = jax.jit(lambda s, x: noop(s, x))
    dt_noop, _ = device_time(
        lambda i: noop_j(jnp.asarray([i], jnp.int32), sec8), iters=30
    )

    # 3. bare launch floor: 1-row input, same output
    tiny = jnp.zeros((8, 128), jnp.int8)
    bare = pl.pallas_call(
        noop_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )
    bare_j = jax.jit(lambda s, x: bare(s, x))
    dt_bare, _ = device_time(
        lambda i: bare_j(jnp.asarray([i], jnp.int32), tiny), iters=30
    )

    # 4. serving mode: 64 jobs lane-concatenated into one launch
    jobs = 64
    nbp_b = jobs * lanes
    sec8b = bench._make_planar_secrets(engine, jax.random.key(2), rows, nbp_b)
    dt_b, outb = device_time(
        lambda i: engine.aggregate_mxu8_kernel(
            sec8b, jnp.asarray(i, dtype=jnp.int32), p_count=participants,
            lanes=1024 if nbp_b % 1024 == 0 else lanes,
        ),
        iters=10,
    )
    bench._reveal_check_slice(engine, sec8b, outb, participants)

    kernel_work_s = dt_real - dt_noop
    artifact = {
        "metric": "config-2 single-launch latency decomposition (device-trace)",
        "shape": {"dimension": dimension, "participants": participants,
                  "lanes": lanes, "input_bytes": int(sec8.size)},
        "single_job_s": round(dt_real, 7),
        "noop_same_shape_s": round(dt_noop, 7),
        "bare_launch_s": round(dt_bare, 7),
        "kernel_work_s": round(kernel_work_s, 7),
        "speed_of_light_s": rep["speed_of_light_s"],
        "fraction_of_sol": rep["fraction_of_sol"],
        "launch_floor_fraction_of_job": round(dt_noop / dt_real, 4),
        "batched64_per_job_s": round(dt_b / jobs, 7),
        "batched64_speedup_per_job": round(dt_real / (dt_b / jobs), 2),
        "note": (
            "noop_same_shape_s is a Pallas kernel with identical grid/"
            "block/output specs that only zeroes its output: the "
            "irreducible launch + input-DMA floor at this shape. "
            "kernel_work_s is what the compute epilogue actually costs."
        ),
    }
    with open(os.path.join(ROOT, "LATENCY_FLOOR.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
