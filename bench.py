"""Benchmark harness: one JSON line for the driver, detail lines to stderr.

Headline metric: shared-vector aggregations/s at 1M dimension — the full
device pipeline (packed-Shamir share generation for every participant,
clerk combine across participants, recipient reconstruction) over a 64-bit
prime field on the available accelerator.

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


def _bench_device(dimension: int, participants: int, warmup: int = 1, iters: int = 3):
    import jax
    import jax.numpy as jnp

    from sda_tpu.models import FederatedAggregation
    from sda_tpu.ops.modmat import uniform_limbs

    model = FederatedAggregation.packed_64bit(dimension=dimension)
    engine = model.engine
    ctx = engine.ctx
    spec = engine.spec

    # generate the participation matrix on device (host->device transfer of a
    # 0.5 GB tensor through the dev tunnel would dominate and measure nothing)
    @jax.jit
    def make_secrets(key):
        return uniform_limbs(ctx, key, (participants, engine.nb, spec.secret_count))

    secrets = make_secrets(jax.random.key(7))
    secrets.block_until_ready()

    # fused Pallas path (share generation + combine without HBM round trips)
    def fn(seed):
        return model.engine.aggregate_fused(secrets, seed=seed, rows=8)

    out = fn(0)
    out.block_until_ready()  # compile + warmup
    for _ in range(warmup):
        fn(1).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(2)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    # cross-check the reveal against the unfused jnp pipeline
    ref = model.engine.aggregate_from_key(secrets, jax.random.key(0))
    if not bool(jnp.array_equal(out, ref)):
        raise AssertionError("fused/unfused reveal mismatch")
    return dt, model


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
    participants = 32
    dt, model = _bench_device(dimension, participants)
    aggs_per_s = participants / dt
    # field-op accounting: share matmul (k+r)*n mont_muls + adds per batch row
    spec = model.engine.spec
    nb = model.engine.nb
    m, n, k = spec.secret_count + spec.randomness_count, spec.share_count, spec.secret_count
    fieldops = participants * nb * (2 * m * n) + participants * nb * n + nb * (2 * n * k)
    print(
        f"# device: {dt*1e3:.1f} ms/step for {participants} x {dimension}-dim "
        f"({aggs_per_s:.2f} aggregations/s, {fieldops/dt/1e9:.2f} Gfield-ops/s)",
        file=sys.stderr,
    )
    host_dt = _bench_host_baseline(dimension, participants)
    print(f"# host-numpy baseline (extrapolated): {host_dt:.1f} s/step", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "1M-dim shared-vector aggregations/s (packed Shamir, 64-bit prime, full share+combine+reconstruct)",
                "value": round(aggs_per_s, 3),
                "unit": "participants/s",
                "vs_baseline": round(host_dt / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
