"""MXU int8-matmul path vs the CIOS reference (interpret mode on CPU).

Covers sda_tpu/ops/mxu.py and sda_tpu/ops/mxu_kernel.py: the limb-folded
int8 matmul, the carry/Montgomery-chunk epilogue, the fused Pallas kernel
(on-chip randomness and caller-randomness protocol paths), and the
participant-streaming accumulation. Reference hot paths being reimplemented:
share generation packed_shamir.rs:40-44 + combine combiner.rs:16-29.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sda_tpu.engine import TpuAggregationEngine
from sda_tpu.fields import find_prime_field
from sda_tpu.ops.limbs import LimbContext
from sda_tpu.ops.modmat import modmat
from sda_tpu.ops.mxu import MxuContext, limbs7_host, mxu_modmat
from sda_tpu.ops.mxu_kernel import (
    batched_from_planar16,
    fused_share_combine_mxu,
    planar7_from_batched,
)
from sda_tpu.sharing import PackedShamirScheme


@pytest.mark.parametrize("bits", [10, 30, 62], ids=["p10", "p30", "p62"])
def test_mxu_modmat_matches_cios(bits, rng):
    p, _, _ = find_prime_field(bits, 8, 9)
    ctx = LimbContext.create(p)
    mxu = MxuContext.create(ctx)
    m, n, B = 7, 8, 64
    M = np.array([[int(rng.integers(0, p & 0x7FFFFFFF)) for _ in range(n)] for _ in range(m)], dtype=object)
    x = np.array([[int(rng.integers(0, p & 0x7FFFFFFF)) for _ in range(m)] for _ in range(B)], dtype=object)
    ref = modmat(ctx, jnp.asarray(ctx.encode(x)), jnp.asarray(ctx.encode_mont(M)))
    x7 = jnp.asarray(limbs7_host(x, mxu.L7)).reshape(B, m * mxu.L7)
    out = mxu_modmat(mxu, x7, mxu.matrix_int8(M, [mxu.L7] * m), n, mxu.out_cols([mxu.L7] * m))
    assert jnp.array_equal(out, ref)


def test_mxu_modmat_raw_randomness_slots(rng):
    """Double-width (non-canonical) slots reduce to the exact residue."""
    import random

    p, _, _ = find_prime_field(62, 8, 9)
    ctx = LimbContext.create(p)
    mxu = MxuContext.create(ctx)
    r = random.Random(7)
    m, n, B = 4, 8, 32
    M = np.array([[r.randrange(p) for _ in range(n)] for _ in range(m)], dtype=object)
    xraw = np.array([[r.randrange(1 << (14 * mxu.L7)) for _ in range(m)] for _ in range(B)], dtype=object)
    x7 = jnp.asarray(limbs7_host(xraw, 2 * mxu.L7)).reshape(B, m * 2 * mxu.L7)
    out = mxu_modmat(
        mxu, x7, mxu.matrix_int8(M, [2 * mxu.L7] * m), n, mxu.out_cols([2 * mxu.L7] * m)
    )
    expect = ctx.encode(
        np.array(
            [[sum(int(xraw[b][j]) * int(M[j][i]) for j in range(m)) % p for i in range(n)] for b in range(B)],
            dtype=object,
        )
    )
    assert jnp.array_equal(out, jnp.asarray(expect))


def _scheme64():
    p, w2, w3 = find_prime_field(62, 8, 9)
    return PackedShamirScheme(3, 8, 4, p, w2, w3)


def _example(engine, p_count, d, rng):
    secrets = np.array(
        [[int(rng.integers(0, 1 << 31)) for _ in range(d)] for _ in range(p_count)],
        dtype=object,
    )
    return secrets, jnp.asarray(engine.encode_secrets(secrets))


def _expected_sums(engine, secrets):
    p = engine.ctx.p
    return [int(sum(int(col) for col in secrets[:, j])) % p for j in range(secrets.shape[1])]


def test_engine_aggregate_mxu_reveal(rng):
    d, p_count = 33, 6
    engine = TpuAggregationEngine(_scheme64().device_spec(), d)
    secrets, enc = _example(engine, p_count, d, rng)
    out = engine.aggregate_mxu(enc, jax.random.key(3))
    got = [int(v) for v in engine.decode_output(np.asarray(out))]
    assert got == _expected_sums(engine, secrets)


@pytest.mark.tpu
def test_mxu_kernel_full_step_reveal(rng):
    if jax.default_backend() == "cpu":
        pytest.skip("pltpu PRNG primitives have no CPU interpret lowering")
    d, p_count = 48, 5
    engine = TpuAggregationEngine(_scheme64().device_spec(), d)
    secrets, enc = _example(engine, p_count, d, rng)
    sec7 = engine.planar7_secrets(enc, lanes=128)
    out = engine.aggregate_mxu_kernel(sec7, seed=11, p_count=p_count, lanes=128)
    got = [int(v) for v in engine.decode_output(np.asarray(out))]
    assert got == _expected_sums(engine, secrets)


def test_mxu_kernel_protocol_randomness_exact(rng):
    """Caller-supplied canonical randomness: bit-exact vs the jnp pipeline."""
    d, p_count = 24, 4
    engine = TpuAggregationEngine(_scheme64().device_spec(), d)
    _, enc = _example(engine, p_count, d, rng)
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    ext = jnp.concatenate([enc, rand], axis=2)  # [P, nb, k+r, L16]
    golden = engine.aggregate(enc, rand)
    sec7 = engine.planar7_ext(ext, lanes=128)
    out = engine.aggregate_mxu_kernel(sec7, seed=0, p_count=p_count, lanes=128)
    assert jnp.array_equal(out, golden)


@pytest.mark.tpu
def test_mxu_kernel_streaming_matches_expected(rng):
    if jax.default_backend() == "cpu":
        pytest.skip("pltpu PRNG primitives have no CPU interpret lowering")
    d, p_chunk, n_chunks = 30, 3, 4
    engine = TpuAggregationEngine(_scheme64().device_spec(), d)
    secrets, enc = _example(engine, p_chunk * n_chunks, d, rng)
    chunks = [
        engine.planar7_secrets(enc[i * p_chunk : (i + 1) * p_chunk], lanes=128)
        for i in range(n_chunks)
    ]
    out = engine.aggregate_mxu_kernel_streaming(chunks, p_chunk, seed0=5, lanes=128)
    got = [int(v) for v in engine.decode_output(np.asarray(out))]
    assert got == _expected_sums(engine, secrets)


def test_mxu_kernel_streaming_ext_matches_expected(rng):
    """Streaming with caller (host-CSPRNG) randomness — runs on any backend."""
    d, p_chunk, n_chunks = 30, 3, 4
    engine = TpuAggregationEngine(_scheme64().device_spec(), d)
    secrets, enc = _example(engine, p_chunk * n_chunks, d, rng)
    chunks = []
    for i in range(n_chunks):
        part = enc[i * p_chunk : (i + 1) * p_chunk]
        rand = jnp.asarray(engine.random_ext(p_chunk, rng=rng))
        chunks.append(
            engine.planar7_ext(jnp.concatenate([part, rand], axis=2), lanes=128)
        )
    out = engine.aggregate_mxu_kernel_streaming(chunks, p_chunk, seed0=0, lanes=128)
    got = [int(v) for v in engine.decode_output(np.asarray(out))]
    assert got == _expected_sums(engine, secrets)


def test_mxu_kernel_reconstruct_only_exact(rng):
    """The reconstruct call (p_count=1, no randomness) is an exact modmat."""
    scheme = _scheme64()
    engine = TpuAggregationEngine(scheme.device_spec(), 24)
    mxu = engine.mxu
    p = engine.ctx.p
    combined = np.array(
        [[int(rng.integers(0, 1 << 31)) for _ in range(8)] for _ in range(engine.nb)],
        dtype=object,
    )
    golden = engine.reconstruct(jnp.asarray(engine.ctx.encode(combined)))
    c7 = planar7_from_batched(
        mxu, jnp.asarray(engine.ctx.encode(combined))[None], lanes=128
    )
    rec = fused_share_combine_mxu(
        mxu, engine.spec.reconstruct_matrix, c7, 1, 8, 0, lanes=128
    )
    assert jnp.array_equal(batched_from_planar16(rec, engine.nb), golden)


def test_mxu_kernel_fused_reconstruct_exact(rng):
    """``reconstruct_matrix=``: share+combine+reconstruct in one dispatch
    is bit-exact vs the two-call path and the jnp pipeline."""
    d, p_count = 24, 4
    engine = TpuAggregationEngine(_scheme64().device_spec(), d)
    _, enc = _example(engine, p_count, d, rng)
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    ext = jnp.concatenate([enc, rand], axis=2)
    golden = engine.aggregate(enc, rand)
    sec7 = engine.planar7_ext(ext, lanes=128)
    spec = engine.spec
    rec = fused_share_combine_mxu(
        engine.mxu, spec.share_matrix, sec7, p_count, 3, 4, lanes=128,
        reconstruct_matrix=spec.reconstruct_matrix,
    )
    assert jnp.array_equal(batched_from_planar16(rec, engine.nb), golden)


def test_mxu_kernel_128bit_protocol_exact(rng):
    """BASELINE config 3 field: 125-bit modulus, 18 int8 limbs, L16=8."""
    from sda_tpu.models import FederatedAggregation

    model = FederatedAggregation.packed_128bit(dimension=24)
    engine = model.engine
    p_count = 3
    secrets = np.array(
        [[int(rng.integers(0, 1 << 31)) for _ in range(24)] for _ in range(p_count)],
        dtype=object,
    )
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    golden = engine.aggregate(enc, rand)
    ext7 = engine.planar7_ext(jnp.concatenate([enc, rand], axis=2), lanes=128)
    out = engine.aggregate_mxu_kernel(ext7, seed=0, p_count=p_count, lanes=128)
    assert jnp.array_equal(out, golden)


def test_mxu_kernel_additive_scheme_exact(rng):
    """The additive scheme (odd modulus) runs the same MXU kernel path."""
    from sda_tpu.sharing import AdditiveScheme

    engine = TpuAggregationEngine(
        AdditiveScheme(share_count=4, modulus=(1 << 61) - 1).device_spec(), 16
    )
    p_count = 3
    secrets = np.array(
        [[int(rng.integers(0, 1 << 31)) for _ in range(16)] for _ in range(p_count)],
        dtype=object,
    )
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    golden = engine.aggregate(enc, rand)
    ext7 = engine.planar7_ext(jnp.concatenate([enc, rand], axis=2), lanes=128)
    out = engine.aggregate_mxu_kernel(ext7, seed=0, p_count=p_count, lanes=128)
    assert jnp.array_equal(out, golden)


def test_share_mxu_matches_cios_shares(rng):
    """Per-participant canonical shares (protocol bulk path) are bit-exact."""
    d, p_count = 24, 4
    engine = TpuAggregationEngine(_scheme64().device_spec(), d)
    _, enc = _example(engine, p_count, d, rng)
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    ext = jnp.concatenate([enc, rand], axis=2)
    assert jnp.array_equal(engine.share_mxu(ext), engine.share(ext))


def test_roofline_report():
    from sda_tpu.utils.profiling import V5E, roofline

    rep = roofline(1e-3, hbm_bytes=819e6 / 2, mxu_int8_ops=0, vpu_u32_ops=0)
    assert rep["binding_resource"] == "hbm"
    assert abs(rep["utilization"]["hbm"] - 0.5) < 1e-6
    rep2 = roofline(1e-3, hbm_bytes=1e6, mxu_int8_ops=394e9 * 0.9)
    assert rep2["binding_resource"] == "mxu_int8"
    assert 0 < rep2["fraction_of_sol"] <= 1
    assert rep2["speed_of_light_s"] <= 1e-3


def test_mxu_contraction_bound_enforced():
    p, _, _ = find_prime_field(62, 8, 9)
    ctx = LimbContext.create(p)
    mxu = MxuContext.create(ctx)
    too_long = jnp.zeros((1, 140000), dtype=jnp.int8)
    with pytest.raises(ValueError, match="accumulator bound"):
        mxu_modmat(mxu, too_long, np.zeros((140000, 8), dtype=np.int8), 1, 8)


@pytest.mark.parametrize("bits", [10, 62, 126], ids=["p10", "p62", "p126"])
def test_randsum_carry_save_alignment(bits, rng):
    """The rand-sum path of the fused kernel, replayed exactly in numpy.

    The reveal cross-check cannot see randomness bugs (any contribution of
    the form R·u' cancels at reconstruction), so the privacy-critical claim
    — carry-save-summed raw limbs contracted against ``_big_rows_randsum``
    equal ``Σ_p Σ_slot R[slot]·rand_p[slot] mod p`` — is proven here by
    replaying the kernel's arithmetic (mask-packed u32 lane accumulation,
    14-bit field extraction, lo/hi 7-bit re-split, int8 contraction,
    base-2⁷ carry propagation) on host integers.
    """
    from sda_tpu.ops.mxu_kernel import _big_rows_randsum

    p, _, _ = find_prime_field(bits, 8, 9)
    ctx = LimbContext.create(p)
    mxu = MxuContext.create(ctx)
    L7, n, k, r = mxu.L7, 8, 3, 4
    r2l = 2 * L7
    words_per_p = -(-(r * r2l) // 4)
    n_pad = -(-(n * L7) // 32) * 32  # reduced layout: L7 columns per clerk
    M = np.array(
        [[int(rng.integers(0, p & 0x7FFFFFFFFFFFFFFF)) % p for _ in range(n)]
         for _ in range(k + r)],
        dtype=object,
    )
    big = _big_rows_randsum(mxu, M, k, r, n_pad, words_per_p)

    P = 129  # the carry-save bound: 129 * 127 < 2^14
    words = rng.integers(0, 1 << 32, size=(P, words_per_p), dtype=np.uint64)
    mask2 = np.uint64(127 | (127 << 14))
    accE = (words & mask2).sum(axis=0)
    accO = ((words >> np.uint64(7)) & mask2).sum(axis=0)
    assert accE.max() < 1 << 28 and accO.max() < 1 << 28  # fields carry-free
    sums = [accE & 0x3FFF, accO & 0x3FFF, accE >> np.uint64(14), accO >> np.uint64(14)]
    rand2 = np.concatenate(
        [part for s in sums for part in (s & np.uint64(127), s >> np.uint64(7))]
    ).astype(np.int64)  # [8·words_per_p], kernel row order
    acc = big.astype(np.int64).T.T @ rand2  # int8 values are exact in int64

    for i in range(n):
        digits = acc[i * L7 : (i + 1) * L7]
        got = sum(int(d) << (7 * j) for j, d in enumerate(digits)) % p
        expect = 0
        for pp in range(P):
            for slot in range(r):
                v = 0
                for l1 in range(r2l):
                    idx = slot * r2l + l1
                    w, b = idx // 4, idx % 4
                    v += (int(words[pp, w]) >> (7 * b) & 127) << (7 * l1)
                expect += v * int(M[k + slot, i])
        assert got == expect % p, f"clerk {i} misaligned"
