"""Config-3 (128-bit) launch-shape sweep: chunked reduction grid vs the
single-chunk launch (VERDICT r5 #5).

The r4 config-3 ran 1,024 participants as ONE chunk on a 9-step lane grid
(lanes=384) and sat at 0.776 of HBM SoL; the gap profile pointed at
pipeline head/tail on the short grid. The chunked reduction grid
((lane_blocks, n_chunks), VMEM canonical accumulator — the same in-kernel
accumulation that lifted config-4) multiplies the grid steps and halves
the per-step block, so the head/tail and double-buffering both improve —
at the cost of one extra carry/fold epilogue per extra chunk (cheap at
L=8). This sweeps (n_chunks, lanes), prints a table, and writes
CONFIG3_SWEEP.json.
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
    import jax
    import jax.numpy as jnp

    import bench
    from sda_tpu.models import FederatedAggregation
    from sda_tpu.utils.profiling import device_time_samples, roofline

    dimension, total = 10_002, 1024
    model = FederatedAggregation.packed_128bit(dimension=dimension)
    engine = model.engine
    mxu8 = engine.mxu8
    k = engine.spec.secret_count

    # lanes must be a multiple of 128 (Mosaic block constraint)
    variants = [(1, 384), (2, 384), (4, 384), (2, 256), (4, 256), (8, 256),
                (2, 512), (4, 512)]
    rows_out = []
    for n_chunks, lanes in variants:
        if total % n_chunks:
            continue
        p_chunk = total // n_chunks
        nbp = -(-engine.nb // lanes) * lanes
        rows = p_chunk * k * mxu8.L8
        sec8_all = jnp.concatenate(
            [
                bench._make_planar_secrets(engine, jax.random.key(10 + i), rows, nbp)
                for i in range(n_chunks)
            ],
            axis=0,
        )
        sec8_all.block_until_ready()
        out = engine.aggregate_mxu8_kernel_chunked(
            sec8_all, n_chunks, p_chunk, seed=1, lanes=lanes
        )
        bench._reveal_check_slice(engine, sec8_all, out, total, width=lanes)

        sp, _ = device_time_samples(
            lambda i: engine.aggregate_mxu8_kernel_chunked(
                sec8_all, n_chunks, p_chunk, seed=1 + i, lanes=lanes
            ),
            samples=3, iters=3,
        )
        dt = sp["median"]
        per = bench._mxu8_model(
            engine, p_chunk, nbp, sec8_all.size // n_chunks, 0, recon=False
        )
        agg = {key: v * n_chunks for key, v in per.items()}
        # fused stage-2 runs once per lane block (last chunk), not per chunk
        rec_once = bench._mxu8_model(engine, p_chunk, nbp, 0, 0, recon=True)
        agg["mxu_int8_ops"] += rec_once["mxu_int8_ops"] - per["mxu_int8_ops"]
        agg["hbm_bytes"] += engine.ctx.L * k * nbp * 4
        rep = roofline(dt, **agg)
        row = {
            "n_chunks": n_chunks, "lanes": lanes, "nbp": nbp,
            "grid_steps": (nbp // lanes) * n_chunks,
            "ms": round(dt * 1e3, 4),
            "ms_min": round(sp["min"] * 1e3, 4),
            "ms_max": round(sp["max"] * 1e3, 4),
            "fraction_of_sol": rep["fraction_of_sol"],
            "aggs_s": round(total / dt, 1),
        }
        rows_out.append(row)
        print(f"# config3 n_chunks={n_chunks} lanes={lanes}: "
              f"{row['ms']} ms, sol {row['fraction_of_sol']}", file=sys.stderr)

    best = max(rows_out, key=lambda r: r["fraction_of_sol"])

    # ---- decomposition controls at the best shape: name the ceiling
    import functools

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sda_tpu.ops.mxu8 import fused_share_combine_mxu8

    n_chunks, lanes = best["n_chunks"], best["lanes"]
    p_chunk = total // n_chunks
    nbp = -(-engine.nb // lanes) * lanes
    rows = p_chunk * k * mxu8.L8
    spec, ctx = engine.spec, engine.ctx
    sec8_all = jnp.concatenate(
        [
            bench._make_planar_secrets(engine, jax.random.key(10 + i), rows, nbp)
            for i in range(n_chunks)
        ],
        axis=0,
    )
    controls = {}

    # seed flows into the output: every timed execution distinct
    # (device_time's contract — identical dispatches can dedup)
    def noop_kernel(seed_ref, s_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref) + seed_ref[0].astype(jnp.uint32)

    out_rows = ctx.L * k
    noop = pl.pallas_call(
        noop_kernel,
        grid=(nbp // lanes, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((rows, lanes), lambda t, c: (c, t),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((out_rows, lanes), lambda t, c: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, nbp), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    noop_j = jax.jit(lambda s, x: noop(s, x))
    sp_noop, _ = device_time_samples(
        lambda i: noop_j(jnp.asarray([i], jnp.int32), sec8_all),
        samples=3, iters=3,
    )
    controls["noop_dma_floor_ms"] = round(sp_noop["median"] * 1e3, 4)

    for name, kw in (
        ("combined_draw", dict(reconstruct_matrix=spec.reconstruct_matrix,
                               rand_participants=1)),
        ("no_reconstruction", dict()),
    ):
        fn = jax.jit(functools.partial(
            lambda sec, seed, kw=kw: fused_share_combine_mxu8(
                mxu8, spec.share_matrix, sec, p_chunk, k,
                spec.randomness_count, seed=seed, lanes=lanes,
                n_chunks=n_chunks, **kw,
            )
        ))
        sp_c, _ = device_time_samples(
            lambda i: fn(sec8_all, jnp.asarray(i, jnp.int32)), samples=3, iters=3
        )
        controls[f"{name}_ms"] = round(sp_c["median"] * 1e3, 4)
    print(f"# config3 controls at best shape: {controls}", file=sys.stderr)

    artifact = {
        "metric": "config-3 (128-bit, 10k-dim, 1024 participants) launch-shape sweep",
        "rows": rows_out,
        "best": best,
        "controls_at_best": controls,
    }
    with open(os.path.join(ROOT, "CONFIG3_SWEEP.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
