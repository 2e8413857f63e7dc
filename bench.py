"""Benchmark harness: one JSON line for the driver, detail lines to stderr.

Headline metric: shared-vector aggregations/s at 1M dimension — the full
device pipeline (packed-Shamir share generation for every participant,
clerk combine across participants, recipient reconstruction) over a 64-bit
prime field on the available accelerator, using the fused MXU int8 kernels
(sda_tpu/ops/mxu_kernel.py).

Also reports the BASELINE.md config ladder to stderr:
  config 2 — 1k-dim, 64-bit field, 100 participants (single pass)
  config 3 — 10k-dim, 128-bit modulus (8x16-bit-limb Montgomery), 1k
             participants (streamed in 64-participant passes)
  config 4 — 1M-dim, 10k+ participants, participant-streaming (the
             participation matrix never resides in HBM; inputs are
             synthesised on device inside the timed loop, so the rate is
             conservative)

``vs_baseline`` is the speedup against the host reference implementation
(the numpy protocol layer in :mod:`sda_tpu.sharing`, measured on a scaled
slice of the same workload and extrapolated linearly) — the reference
project publishes no numbers of its own (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timeit(fn, iters: int, warmup: int = 1):
    """Per-step device time via the JAX profiler (see
    :mod:`sda_tpu.utils.profiling` for why wall clock is not trusted)."""
    from sda_tpu.utils.profiling import device_time

    return device_time(fn, iters=iters, warmup=warmup)


def _fieldops(engine, participants):
    """Montgomery-multiply-equivalent accounting for one aggregation step."""
    spec = engine.spec
    nb = engine.nb
    m, n, k = spec.secret_count + spec.randomness_count, spec.share_count, spec.secret_count
    return participants * nb * (2 * m * n) + participants * nb * n + nb * (2 * n * k)


def _bench_headline(dimension: int, participants: int):
    """Config-4 shape single pass: canonical secrets resident in HBM."""
    import jax
    import jax.numpy as jnp

    from sda_tpu.models import FederatedAggregation
    from sda_tpu.ops.modmat import uniform_limbs

    model = FederatedAggregation.packed_64bit(dimension=dimension)
    engine = model.engine

    # generate the participation matrix on device (host->device transfer of
    # a GB-scale tensor through the dev tunnel would dominate and measure
    # nothing), then pre-pack to the kernels' compact int8 limb layout
    @jax.jit
    def make_secrets(key):
        return uniform_limbs(
            engine.ctx, key, (participants, engine.nb, engine.spec.secret_count)
        )

    secrets = make_secrets(jax.random.key(7))
    lanes = 1024
    sec7 = jax.jit(lambda x: engine.planar7_secrets(x, lanes))(secrets)
    sec7.block_until_ready()

    dt, out = _timeit(
        lambda i: engine.aggregate_mxu_kernel(
            sec7, jnp.asarray(i, dtype=jnp.int32), p_count=participants, lanes=lanes
        ),
        iters=10,
    )
    # cross-check the reveal: reconstruct∘share is the identity on the secret
    # slots, so the output must equal Σ_p secrets mod p exactly, whatever the
    # sharing randomness was (randomness correctness itself is pinned
    # host-side by tests/test_mxu.py::test_randsum_carry_save_alignment).
    ref = jax.jit(lambda s: engine.ctx.sum_mod(s, axis=0))(secrets)
    if not bool(jnp.array_equal(out, ref)):
        raise AssertionError("MXU-kernel reveal != modular participant sum")

    # roofline: achieved fraction of the detected chip's ceilings
    from sda_tpu.utils.profiling import roofline

    mxu = engine.mxu
    spec = engine.spec
    L7 = mxu.L7
    k, r, n = spec.secret_count, spec.randomness_count, spec.share_count
    nbp = sec7.shape[1]
    n_pad = -(-(n * L7) // 32) * 32
    words_per_p = -(-(r * 2 * L7) // 4)
    groups = -(-participants // 129)
    mxu_ops = 2.0 * nbp * (
        n_pad * (participants * k * L7 + groups * 8 * words_per_p)  # stage 1
        + 32 * n * L7  # in-kernel reconstruction
    )
    # carry-save randomness accumulation (5 VPU ops/word) + epilogues
    vpu_ops = nbp * (participants * words_per_p * 5.0 + 40.0 * n * L7)
    hbm = sec7.size + out.size * out.dtype.itemsize
    rep = roofline(dt, hbm_bytes=hbm, mxu_int8_ops=mxu_ops, vpu_u32_ops=vpu_ops)
    return dt, model, rep


def _bench_config2():
    import jax
    import jax.numpy as jnp

    from sda_tpu.models import FederatedAggregation
    from sda_tpu.ops.modmat import uniform_limbs

    dimension, participants = 1002, 100
    model = FederatedAggregation.packed_64bit(dimension=dimension)
    engine = model.engine
    secrets = jax.jit(
        lambda k: uniform_limbs(engine.ctx, k, (participants, engine.nb, 3))
    )(jax.random.key(1))
    sec7 = jax.jit(lambda x: engine.planar7_secrets(x, 128))(secrets)
    sec7.block_until_ready()
    dt, _ = _timeit(
        lambda i: engine.aggregate_mxu_kernel(
            sec7, jnp.asarray(i, dtype=jnp.int32), p_count=participants, lanes=128
        ),
        iters=30,
    )
    print(
        f"# config 2 (1k-dim, 64-bit, {participants} participants): "
        f"{dt*1e3:.2f} ms/step, {participants/dt:.0f} aggregations/s, "
        f"{_fieldops(engine, participants)/dt/1e9:.2f} Gfield-ops/s",
        file=sys.stderr,
    )


def _bench_config3():
    """128-bit modulus: 8x16-bit-limb Montgomery epilogue, 19 int8 limbs."""
    import jax
    import jax.numpy as jnp

    from sda_tpu.models import FederatedAggregation
    from sda_tpu.ops.modmat import uniform_limbs

    dimension, p_chunk, n_chunks = 10_002, 64, 16  # 1,024 participants
    model = FederatedAggregation.packed_128bit(dimension=dimension)
    engine = model.engine
    lanes = 256
    secrets = jax.jit(
        lambda k: uniform_limbs(engine.ctx, k, (p_chunk, engine.nb, 3))
    )(jax.random.key(2))
    sec7 = jax.jit(lambda x: engine.planar7_secrets(x, lanes))(secrets)
    sec7.block_until_ready()

    def step(i):
        return engine.aggregate_mxu_kernel_streaming(
            [sec7] * n_chunks, p_chunk, seed0=i, lanes=lanes
        )

    dt, _ = _timeit(step, iters=5)
    total = p_chunk * n_chunks
    print(
        f"# config 3 (10k-dim, 128-bit modulus, {total} participants): "
        f"{dt*1e3:.1f} ms/step, {total/dt:.0f} aggregations/s, "
        f"{_fieldops(engine, total)/dt/1e9:.2f} Gfield-ops/s",
        file=sys.stderr,
    )


def _bench_config4_streaming(dimension: int):
    """10k+ participants at 1M-dim: the 80+ GB participation matrix streams
    through the kernel in 64-participant chunks.

    A handful of distinct chunks are pre-generated and cycled (the data is
    HBM-resident and re-read every step, which is the realistic IO pattern);
    sharing randomness is fresh in every kernel pass.
    """
    import jax
    import jax.numpy as jnp

    from sda_tpu.models import FederatedAggregation

    p_chunk, n_chunks = 128, 79  # 10,112 participants
    model = FederatedAggregation.packed_64bit(dimension=dimension)
    engine = model.engine
    mxu = engine.mxu
    lanes = 1024
    nbp = -(-engine.nb // lanes) * lanes
    rows = p_chunk * engine.spec.secret_count * mxu.L7

    @jax.jit
    def make_chunk(key):
        # uniform 7-bit limbs = uniform values < 2^63; linearity makes the
        # non-canonical representatives exact mod p downstream
        bits = jax.random.bits(key, (rows, nbp), dtype=jnp.uint8)
        return (bits & 0x7F).astype(jnp.int8)

    pool = [make_chunk(jax.random.key(i)) for i in range(4)]
    jax.block_until_ready(pool)

    def step(i):
        make = lambda j: pool[j % len(pool)]  # noqa: E731
        return engine.aggregate_mxu_kernel_streaming(
            [make] * n_chunks, p_chunk, seed0=1 + i * n_chunks, lanes=lanes
        )

    dt, _ = _timeit(step, iters=2, warmup=0)
    total = p_chunk * n_chunks
    print(
        f"# config 4 (1M-dim, {total} participants, streamed from HBM in "
        f"{p_chunk}-participant chunks): {dt:.2f} s/step, "
        f"{total/dt:.0f} aggregations/s sustained",
        file=sys.stderr,
    )


def _bench_host_baseline(dimension: int, participants: int):
    """Host numpy protocol path on a slice, extrapolated to the full size."""
    from sda_tpu.fields import find_prime_field
    from sda_tpu.sharing import PackedShamirScheme

    p, w2, w3 = find_prime_field(62, 8, 9)
    scheme = PackedShamirScheme(3, 8, 4, p, w2, w3)
    slice_dim = max(999, dimension // 200)
    slice_parts = min(participants, 8)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    shares = [
        scheme.share_vector(rng.integers(0, 1 << 31, size=slice_dim).astype(object), rng=rng)
        for _ in range(slice_parts)
    ]
    combined = [(j, scheme.combine([s[j] for s in shares])) for j in range(8)]
    scheme.reconstruct(combined, dimension=slice_dim)
    dt = time.perf_counter() - t0
    scale = (dimension / slice_dim) * (participants / slice_parts)
    return dt * scale


def main():
    dimension = 1_000_002  # divisible by secret_count=3
    participants = 128  # VMEM-optimal chunk for the fused kernel at 1024 lanes
    dt, model, rep = _bench_headline(dimension, participants)
    aggs_per_s = participants / dt
    fieldops = _fieldops(model.engine, participants)
    print(
        f"# headline: {dt*1e3:.2f} ms/step for {participants} x {dimension}-dim "
        f"({aggs_per_s:.0f} aggregations/s, {fieldops/dt/1e9:.2f} Gfield-ops/s)",
        file=sys.stderr,
    )
    print(f"# roofline: {json.dumps(rep)}", file=sys.stderr)
    _bench_config2()
    _bench_config3()
    _bench_config4_streaming(dimension)
    host_dt = _bench_host_baseline(dimension, participants)
    print(f"# host-numpy baseline (extrapolated): {host_dt:.1f} s/step", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "1M-dim shared-vector aggregations/s (packed Shamir, 64-bit prime, full share+combine+reconstruct)",
                "value": round(aggs_per_s, 3),
                "unit": "participants/s",
                "vs_baseline": round(host_dt / dt, 2),
                "chip": rep["chip"],
                "binding_resource": rep["binding_resource"],
                "fraction_of_sol": rep["fraction_of_sol"],
                "utilization": rep["utilization"],
            }
        )
    )


if __name__ == "__main__":
    main()
