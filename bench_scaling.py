"""Mesh scaling benchmark: ops/s efficiency at 1, 2, 4, ... devices.

BASELINE config 5 asks for >=80% weak-scaling efficiency on a multi-host
slice. Real multi-chip hardware is unavailable in this environment, so by
default this drives the sharded pipeline on the virtual host-platform mesh
(the same XLA collectives that ride ICI on a pod slice) and reports
weak-scaling efficiency of the full aggregation step; on a real slice the
same script runs unmodified with JAX_PLATFORMS unset.

Usage: python bench_scaling.py [--devices 8] [--dim-per-device 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--dim-per-device", type=int, default=6144)
    ap.add_argument("--participants-per-device", type=int, default=8)
    ap.add_argument("--cpu-mesh", action="store_true", default=None,
                    help="force the virtual CPU mesh (default: auto)")
    ap.add_argument("--streaming-chunks", type=int, default=0,
                    help="also run the config-5 streaming x sharded step "
                         "with this many participant chunks")
    args = ap.parse_args()

    # XLA_FLAGS are parsed once, at the process's first backend init, so the
    # virtual host-CPU device count must be in place before jax.devices() is
    # ever called (harmless when the run lands on real chips: the flag only
    # affects the host platform).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + f" --xla_force_host_platform_device_count={args.devices}").strip()
    os.environ["XLA_FLAGS"] = flags

    import jax

    if args.cpu_mesh or len(jax.devices()) < args.devices:
        # XLA:CPU's algebraic simplifier circular-rewrites on 16-bit-limb
        # mask/shift chains; disable it for the CPU-mesh fallback ONLY (the
        # TPU backend needs algsimp — e.g. to eliminate int8 transposes).
        if "xla_disable_hlo_passes" not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] += " --xla_disable_hlo_passes=algsimp"
        if jax.default_backend() != "cpu":
            # backends may already be initialized (this image's sitecustomize
            # pre-imports jax on the remote-TPU platform); clear and re-create
            # them on the virtual host-CPU platform
            import jax.extend.backend as jeb

            jax.config.update("jax_platforms", "cpu")
            jeb.clear_backends()

    from sda_tpu.engine import TpuAggregationEngine
    from sda_tpu.fields import find_special_prime_field
    from sda_tpu.parallel import ShardedAggregationPipeline, make_mesh
    from sda_tpu.sharing import PackedShamirScheme
    from sda_tpu.ops.modmat import uniform_limbs

    p, w2, w3 = find_special_prime_field(63, 8, 9)
    scheme = PackedShamirScheme(3, 8, 4, p, w2, w3)

    results = {}
    n_dev = 1
    base_rate = None
    while n_dev <= min(args.devices, len(jax.devices())):
        # weak scaling: problem grows with the participant axis
        p_count = args.participants_per_device * n_dev
        dim = 3 * args.dim_per_device
        engine = TpuAggregationEngine(scheme.device_spec(), dim)
        mesh = make_mesh({"p": n_dev, "d": 1, "c": 1}, devices=jax.devices()[:n_dev])
        pipe = ShardedAggregationPipeline(engine, mesh)
        key = jax.random.key(0)
        secrets_arr = jax.jit(
            lambda k: uniform_limbs(engine.ctx, k, (p_count, engine.nb, 3)),
        )(key)
        if jax.default_backend() != "cpu" and hasattr(pipe, "aggregate_mxu8"):
            # real chips: the gen-4 byte-limb kernel (in-VMEM PRNG randomness)
            sec8 = jax.jit(lambda x: engine.planar8_secrets(x, 512))(secrets_arr)
            step = lambda i: pipe.aggregate_mxu8(sec8, i)  # noqa: E731
        else:
            # virtual CPU mesh: jnp pipeline (Pallas PRNG has no CPU lowering)
            secrets = pipe.shard_inputs(secrets_arr)
            step = lambda i: pipe.aggregate_from_key(  # noqa: E731
                secrets, jax.random.key(i)
            )
        out = step(0)
        jax.block_until_ready(out)
        iters = 5
        if jax.default_backend() == "cpu":
            t0 = time.perf_counter()
            for i in range(iters):
                out = step(i + 1)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
        else:
            # tunneled TPU backends deflate wall-clock loop timing (see
            # sda_tpu/utils/profiling.py) — use the profiler device trace
            from sda_tpu.utils.profiling import device_time

            dt, out = device_time(step, iters=iters)
        # field-op accounting per step (share matmul + combine + reconstruct)
        spec = engine.spec
        m, n, k = spec.secret_count + spec.randomness_count, spec.share_count, spec.secret_count
        fieldops = p_count * engine.nb * (2 * m * n + n) + engine.nb * 2 * n * k
        rate = fieldops / dt
        if base_rate is None:
            base_rate = rate
            base_dt = dt
        if jax.default_backend() == "cpu":
            # virtual mesh on ONE shared CPU: ideal weak scaling is time
            # growing linearly with the n-times-larger problem
            eff = (base_dt * n_dev) / dt
        else:
            # real chips: ideal is constant time as devices grow with work
            eff = rate / (base_rate * n_dev)
        results[n_dev] = {
            "ms_per_step": round(dt * 1e3, 2),
            "gfieldops_per_s": round(rate / 1e9, 2),
            "weak_scaling_efficiency": round(eff, 3),
        }
        print(f"# {n_dev} devices: {dt*1e3:.1f} ms/step, "
              f"{rate/1e9:.2f} Gfield-ops/s, efficiency {eff:.1%}", file=sys.stderr)
        n_dev *= 2

    streaming = None
    if args.streaming_chunks > 0:
        # BASELINE config 5 shape (scaled): the participant axis streams in
        # chunks through per-chip fused combines (zero collectives in the
        # loop); ONE final modular all-reduce + reconstruction closes the
        # step. Reported split: local compute vs the collective finish —
        # the communication/compute ratio that governs multi-host scaling.
        import jax.numpy as jnp

        n_dev = min(args.devices, len(jax.devices()))
        n_chunks = args.streaming_chunks
        p_chunk = args.participants_per_device * n_dev
        dim = 3 * args.dim_per_device
        engine = TpuAggregationEngine(scheme.device_spec(), dim)
        mesh = make_mesh({"p": n_dev, "d": 1, "c": 1}, devices=jax.devices()[:n_dev])
        pipe = ShardedAggregationPipeline(engine, mesh)
        key = jax.random.key(1)
        sec = jax.jit(
            lambda k: uniform_limbs(engine.ctx, k, (p_chunk, engine.nb, 3))
        )(key)
        if jax.default_backend() == "cpu":
            rand = jax.jit(
                lambda k: uniform_limbs(
                    engine.ctx, k, (p_chunk, engine.nb, engine.spec.randomness_count)
                )
            )(key)
            planar = jax.jit(lambda s, r: engine.planar8_ext(
                jnp.concatenate([s, r], axis=2), 512))(sec, rand)
            ext = True
        else:
            planar = jax.jit(lambda s: engine.planar8_secrets(s, 512))(sec)
            ext = False
        planar = pipe.shard_planar(planar)
        chunks = [planar] * n_chunks  # same device buffer: isolates compute

        step_fn = pipe._mxu8_chunk_step_ext if ext else pipe._mxu8_chunk_step
        step_acc = (
            pipe._mxu8_chunk_step_ext_acc if ext else pipe._mxu8_chunk_step_acc
        )

        def chunk_loop(seed0):
            acc = None
            for i in range(n_chunks):
                # the pipeline scales seeds into disjoint per-shard windows
                # internally; consecutive chunk indices are the right input
                seed_i = jnp.asarray(seed0 * n_chunks + i, jnp.int32)
                if acc is None:
                    acc = step_fn(chunks[i], seed_i)
                else:
                    acc = step_acc(chunks[i], acc, seed_i)
            return acc

        acc0 = jax.block_until_ready(chunk_loop(0))
        if jax.default_backend() == "cpu":
            t0 = time.perf_counter()
            jax.block_until_ready(chunk_loop(1))
            t1 = time.perf_counter()
            jax.block_until_ready(pipe._mxu8_stream_finish(acc0))
            t2 = time.perf_counter()
            loop_s, finish_s = t1 - t0, t2 - t1
        else:
            from sda_tpu.utils.profiling import device_time

            loop_s, _ = device_time(chunk_loop, iters=3)
            finish_s, _ = device_time(
                lambda i: pipe._mxu8_stream_finish(acc0), iters=5
            )
        total_p = p_chunk * n_chunks
        spec = engine.spec
        m, n = spec.secret_count + spec.randomness_count, spec.share_count
        fieldops = total_p * engine.nb * (2 * m * n + n)
        partial_bytes = n * engine.nb * engine.ctx.L * 4  # per-shard all-reduce payload
        streaming = {
            "participants": total_p,
            "dimension": dim,
            "chunks": n_chunks,
            "chunk_loop_ms": round(loop_s * 1e3, 2),
            "finish_ms": round(finish_s * 1e3, 2),
            "comm_fraction": round(finish_s / (loop_s + finish_s), 4),
            "gfieldops_per_s": round(fieldops / (loop_s + finish_s) / 1e9, 2),
            "allreduce_payload_mb": round(partial_bytes / 1e6, 3),
        }
        print(f"# streaming x sharded ({n_dev} dev, {n_chunks} chunks, "
              f"{total_p} participants x {dim} dim): loop {loop_s*1e3:.1f} ms + "
              f"finish {finish_s*1e3:.1f} ms "
              f"(comm fraction {streaming['comm_fraction']:.1%})", file=sys.stderr)

    print(json.dumps({
        "metric": "weak-scaling efficiency of sharded aggregation (mesh)",
        "platform": jax.default_backend(),
        "results": results,
        **({"streaming_sharded": streaming} if streaming else {}),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
