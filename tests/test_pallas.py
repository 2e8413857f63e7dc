"""Pallas fused kernels vs the reference jnp pipeline (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sda_tpu.engine import TpuAggregationEngine
from sda_tpu.sharing import AdditiveScheme, PackedShamirScheme

REF = dict(
    secret_count=3,
    share_count=8,
    privacy_threshold=4,
    prime_modulus=433,
    omega_secrets=354,
    omega_shares=150,
)


@pytest.mark.parametrize(
    "scheme",
    [PackedShamirScheme(**REF), AdditiveScheme(share_count=4, modulus=(1 << 61) - 1)],
    ids=["packed433", "additive61"],
)
def test_fused_matches_unfused(scheme, rng):
    d = 24
    engine = TpuAggregationEngine(scheme.device_spec(), d)
    p_count = 5
    modulus = engine.spec.modulus
    secrets = np.array(
        [[int(rng.integers(0, min(modulus, 2**31))) for _ in range(d)] for _ in range(p_count)],
        dtype=object,
    )
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    ext = jnp.concatenate([enc, rand], axis=2)

    golden = engine.reconstruct(engine.combine(engine.share(ext)))
    fused = engine.aggregate_fused_ext(ext, rows=1, interpret=True)
    assert np.array_equal(np.asarray(golden), np.asarray(fused))
    expect = [int(sum(secrets[i][j] for i in range(p_count))) % modulus for j in range(d)]
    assert [int(x) for x in engine.decode_output(np.asarray(fused))] == expect


def test_fused_tile_padding(rng):
    # NB not a multiple of the tile: padding batches must be inert
    scheme = PackedShamirScheme(**REF)
    engine = TpuAggregationEngine(scheme.device_spec(), 10)  # nb = 4
    secrets = np.array([[int(rng.integers(0, 433)) for _ in range(10)] for _ in range(3)], dtype=object)
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(3, rng=rng))
    ext = jnp.concatenate([enc, rand], axis=2)
    fused = engine.aggregate_fused_ext(ext, rows=1, interpret=True)
    expect = [int(sum(secrets[i][j] for i in range(3))) % 433 for j in range(10)]
    assert [int(x) for x in engine.decode_output(np.asarray(fused))] == expect


@pytest.mark.tpu
def test_fused_prng_variant_reveals_sum(rng):
    """On-chip-randomness variant: different randomness, same reveal."""
    if jax.default_backend() == "cpu":
        pytest.skip("pltpu PRNG primitives have no CPU interpret lowering")
    scheme = PackedShamirScheme(**REF)
    engine = TpuAggregationEngine(scheme.device_spec(), 9)
    secrets = np.array([[int(rng.integers(0, 433)) for _ in range(9)] for _ in range(4)], dtype=object)
    enc = jnp.asarray(engine.encode_secrets(secrets))
    # interpret mode can't execute pltpu PRNG primitives even on the TPU
    # backend — this lane compiles the kernel natively on the chip
    fused = engine.aggregate_fused(enc, seed=42, rows=1, interpret=False)
    expect = [int(sum(secrets[i][j] for i in range(4))) % 433 for j in range(9)]
    assert [int(x) for x in engine.decode_output(np.asarray(fused))] == expect


def test_fused_rejects_bad_shapes():
    scheme = PackedShamirScheme(**REF)
    engine = TpuAggregationEngine(scheme.device_spec(), 12)
    from sda_tpu.ops.pallas_kernels import fused_share_combine_planar as f

    with pytest.raises(ValueError):  # last axis must be 128
        f(engine.ctx, jnp.zeros((2, 7, 2, 1, 64), jnp.uint32), engine.share_mat, 4)
    with pytest.raises(ValueError):  # slot count mismatch
        f(engine.ctx, jnp.zeros((2, 5, 2, 1, 128), jnp.uint32), engine.share_mat, 4)


def test_fused_streaming_matches_single_pass(rng):
    """Chunked participant streaming equals the one-shot fused result."""
    scheme = PackedShamirScheme(**REF)
    engine = TpuAggregationEngine(scheme.device_spec(), 9)
    secrets = np.array(
        [[int(rng.integers(0, 433)) for _ in range(9)] for _ in range(6)], dtype=object
    )
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(6, rng=rng))
    ext = jnp.concatenate([enc, rand], axis=2)
    one_shot = engine.aggregate_fused_ext(ext, rows=1, interpret=True)
    streamed = engine.aggregate_fused_streaming(
        [ext[:2], ext[2:4], ext[4:]], rows=1, interpret=True
    )
    assert np.array_equal(np.asarray(one_shot), np.asarray(streamed))
    expect = [int(sum(secrets[i][j] for i in range(6))) % 433 for j in range(9)]
    assert [int(x) for x in engine.decode_output(np.asarray(streamed))] == expect
