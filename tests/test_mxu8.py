"""Byte-limb (gen-4) MXU kernel vs the jnp reference (interpret on CPU).

Covers sda_tpu/ops/mxu8.py: the biased-digit algebra (signed int8 operands
+ ones-column correction), the base-256 epilogue, fused reconstruction, the
u16-field randomness-sum matrix, and the engine streaming path. The
replaced reference hot loops are share generation (packed_shamir.rs:40-44 /
batched.rs:19-52) and the clerk combine (combiner.rs:16-29); reveal-level
equality against the CIOS jnp pipeline pins bit-exactness.

PRNG-mode kernels need a real chip (pltpu PRNG has no CPU interpret
lowering) — those are in the `tpu` lane; the randomness-sum matrix algebra
is proven host-side here instead (reveal-level checks cannot see randomness
bugs: any ``R*u`` cancels at reconstruction).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sda_tpu.engine import TpuAggregationEngine
from sda_tpu.fields import find_prime_field
from sda_tpu.ops.limbs import LimbContext, from_limbs
from sda_tpu.ops.mxu8 import (
    Mxu8Context,
    _big8_randsum,
    batched_from_planar_lm,
    fused_share_combine_mxu8,
    limbs8_host,
    planar8_from_batched,
)
from sda_tpu.sharing import DeviceSchemeSpec, PackedShamirScheme

_W8, _W16 = 8, 16


def _engine(p, w2, w3, dimension):
    scheme = PackedShamirScheme(3, 8, 4, p, w2, w3)
    return TpuAggregationEngine(scheme.device_spec(), dimension)


def _engines():
    from sda_tpu.fields import find_special_prime_field

    p64, w2, w3 = find_prime_field(62, 8, 9)
    ps, ws2, ws3 = find_special_prime_field(63, 8, 9)
    ps128, wa, wb = find_special_prime_field(127, 8, 9)
    return [
        pytest.param(_engine(433, 354, 150, 21), id="p433"),
        pytest.param(_engine(p64, w2, w3, 24), id="p64bit"),
        # pseudo-Mersenne: exercises the multiply-free _fold8_special
        pytest.param(_engine(ps, ws2, ws3, 24), id="p63special"),
        pytest.param(_engine(ps128, wa, wb, 24), id="p127special"),
    ]


@pytest.mark.parametrize("engine", _engines())
def test_planar8_roundtrip(engine):
    """Biased planar bytes decode back to the original canonical values."""
    mxu8 = engine.mxu8
    rng = np.random.default_rng(0)
    secrets = engine.encode_secrets(
        rng.integers(0, min(engine.ctx.p, 1 << 62), size=(3, engine.dimension))
    )
    lanes = 8
    planar = np.asarray(planar8_from_batched(mxu8, jnp.asarray(secrets), lanes))
    P, nb, k, _ = secrets.shape
    vals = from_limbs(secrets)
    for pi in range(P):
        for s in range(k):
            for j in range(mxu8.L8):
                row = (pi * k + s) * mxu8.L8 + j
                expect = [
                    (int(vals[pi, b, s]) >> (_W8 * j)) & 0xFF for b in range(nb)
                ]
                got = [(int(v) + 128) % 256 for v in planar[row, :nb]]
                assert got == expect


@pytest.mark.parametrize("engine", _engines())
def test_ext_combined_matches_jnp(engine):
    """Caller-randomness kernel == share+combine on the CIOS jnp path."""
    spec, ctx, mxu8 = engine.spec, engine.ctx, engine.mxu8
    rng = np.random.default_rng(1)
    P = 4
    secrets = engine.encode_secrets(
        rng.integers(0, min(ctx.p, 1 << 62), size=(P, engine.dimension))
    )
    ext = np.concatenate([secrets, engine.random_ext(P, rng=rng)], axis=2)
    ref = engine.combine(engine.share(jnp.asarray(ext)))
    lanes = 8
    ext8 = planar8_from_batched(mxu8, jnp.asarray(ext), lanes)
    out = fused_share_combine_mxu8(
        mxu8, spec.share_matrix, ext8, P, spec.secret_count,
        spec.randomness_count, lanes=lanes, interpret=True,
    )
    got = batched_from_planar_lm(out, engine.nb, spec.share_count)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("engine", _engines())
def test_ext_fused_reconstruction(engine):
    """In-kernel stage-2 == reconstruct(combine(share(ext))) bit-exactly."""
    spec, ctx, mxu8 = engine.spec, engine.ctx, engine.mxu8
    rng = np.random.default_rng(2)
    P = 3
    secrets = engine.encode_secrets(
        rng.integers(0, min(ctx.p, 1 << 62), size=(P, engine.dimension))
    )
    ext = np.concatenate([secrets, engine.random_ext(P, rng=rng)], axis=2)
    ref = engine.reconstruct(engine.combine(engine.share(jnp.asarray(ext))))
    lanes = 8
    ext8 = planar8_from_batched(mxu8, jnp.asarray(ext), lanes)
    out = fused_share_combine_mxu8(
        mxu8, spec.share_matrix, ext8, P, spec.secret_count,
        spec.randomness_count, lanes=lanes,
        reconstruct_matrix=spec.reconstruct_matrix, interpret=True,
    )
    got = batched_from_planar_lm(out, engine.nb, spec.secret_count)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    # the reveal identity holds too: secrets slots of the reconstruction
    assert np.array_equal(
        np.asarray(got), np.asarray(ctx.sum_mod(jnp.asarray(secrets), axis=0))
    )


@pytest.mark.parametrize("engine", _engines())
def test_randsum_matrix_alignment(engine):
    """Host-side proof of the u16-field randomness-sum algebra.

    Draw explicit PRNG words, sum their u16 fields over participants,
    re-split to byte operands exactly as the kernel does, and contract with
    ``_big8_randsum``'s unbiased entries: the result must equal the direct
    ``sum_p M @ rand_p`` contribution mod p. Pins the (c, parity, w) row
    mapping, the field->slot/limb indexing, padding-field handling, and the
    bias constants — none of which a reveal-level test can see.
    """
    _check_randsum_algebra(engine.spec, engine.ctx, engine.mxu8)


def _check_randsum_algebra(spec, ctx, mxu8):
    p = ctx.p
    k, r, n = spec.secret_count, spec.randomness_count, spec.share_count
    L8, L16r = mxu8.L8, mxu8.L16r
    M = np.asarray(spec.share_matrix, dtype=object)
    P = 5
    rng = np.random.default_rng(3)
    words_per_p = r * mxu8.rand_words
    words = rng.integers(0, 1 << 32, size=(P, words_per_p), dtype=np.uint64)

    def field(pi, f):
        w, parity = f // 2, f % 2
        return (int(words[pi, w]) >> (_W16 * parity)) & 0xFFFF

    # direct: each participant's randomness values, through the matrix
    direct = [0] * n
    for pi in range(P):
        for s in range(r):
            val = sum(
                field(pi, s * L16r + l1) << (_W16 * l1) for l1 in range(L16r)
            )
            for i in range(n):
                direct[i] = (direct[i] + int(M[k + s, i]) * val) % p

    # kernel algebra: field sums -> byte rows -> unbiased contraction
    n_bytes = max(2, -(-((P * 0xFFFF).bit_length()) // _W8))
    n_pad = -(-(n * L8 + 1) // 32) * 32
    big, C = _big8_randsum(mxu8, M, k, r, n_pad, words_per_p, n_bytes)
    e = big[: n * L8].astype(np.int64).T + 128  # unbiased entries [rows, cols]
    fsum = [sum(field(pi, f) for pi in range(P)) for f in range(2 * words_per_p)]
    v = []
    for c in range(n_bytes):
        for parity in (0, 1):
            for w in range(words_per_p):
                v.append((fsum[2 * w + parity] >> (_W8 * c)) & 0xFF)
    v = np.asarray(v, dtype=np.int64)
    true_cols = e.T @ v  # [n*L8]
    got = [
        sum(int(true_cols[i * L8 + l2]) << (_W8 * l2) for l2 in range(L8)) % p
        for i in range(n)
    ]
    assert got == direct
    # and the bias constant matches its definition
    assert np.array_equal(np.asarray(C), 128 * e.sum(axis=0))


def test_three_op_accumulate_wrap_algebra():
    """The kernel's 3-op randomness accumulate (accR raw + accO high
    halves; low-half sum recovered as ``accR - (accO << 16)`` in u32 wrap
    arithmetic) equals the direct low-half sum for any words, as long as
    the low-half sum fits u32 — which the carry-chain participant bound
    (p_count <= 65793) guarantees. Pure u32 algebra, pinned at the bound."""
    rng = np.random.default_rng(9)
    for p_count in (1, 7, 100, 65793):
        # adversarial: all-0xFFFF low halves at the participant bound
        w = rng.integers(0, 1 << 32, size=(p_count, 8), dtype=np.uint64)
        w[: p_count // 2] |= 0xFFFF  # saturate many low halves
        w32 = w.astype(np.uint32)
        accR = np.zeros(8, np.uint32)
        accO = np.zeros(8, np.uint32)
        with np.errstate(over="ignore"):
            for j in range(p_count):
                accR = accR + w32[j]
                accO = accO + (w32[j] >> np.uint32(16))
            accE = accR - (accO << np.uint32(16))
        direct = (w & 0xFFFF).sum(axis=0)
        assert (direct < (1 << 32)).all()
        assert accE.astype(np.uint64).tolist() == direct.tolist()


def test_rand_fold_width_staircase():
    """The PRNG fold-bias staircase (advisor r4): for pseudo-Mersenne
    ``p = 2^e - c``, ``rem = 2^b mod p`` is NOT flat in the fold width b —
    it plateaus at ``~c*2^(b-e)`` (bias ~c/2^e) until ``b >= 2e - log2 c``,
    then drops to ``~(c/2^e)^2``. ``rand_fold_k`` selects the step:
    k=1 (default, documented ~2^-53 trade-off) vs k=2 (~2^-106).
    The wider context must keep the randomness-sum algebra exact."""
    from fractions import Fraction

    from sda_tpu.fields import find_special_prime_field

    p, w2, w3 = find_special_prime_field(63, 8, 9)
    ctx = LimbContext.create(p)
    m1 = Mxu8Context.create(ctx)
    m2 = Mxu8Context.create(ctx, rand_fold_k=2)
    e, c = m1.special
    assert (e, c) == (63, (1 << 63) - p)
    assert m1.L16r == 4 and m2.L16r == 8  # b = 64 / 128 bits
    # exact staircase values: rem(64) = 2c (bias ~c/2^e), rem(128) = 4c^2
    # (bias exactly (c/2^e)^2) — e-sized width steps square the bias
    assert pow(2, 16 * m1.L16r, p) == 2 * c
    assert pow(2, 16 * m2.L16r, p) == 4 * c * c
    assert Fraction(4 * c * c, 1 << 128) == Fraction(c, 1 << e) ** 2
    # the k=2 width flows through the summed-randomness operand unchanged
    scheme = PackedShamirScheme(3, 8, 4, p, w2, w3)
    _check_randsum_algebra(scheme.device_spec(), ctx, m2)
    with pytest.raises(ValueError):
        Mxu8Context.create(ctx, rand_fold_k=0)


def test_accumulator_bound_rejected():
    p64, w2, w3 = find_prime_field(62, 8, 9)
    engine = _engine(p64, w2, w3, 24)
    spec, mxu8 = engine.spec, engine.mxu8
    P = 3000  # 3000 * 3 * 8 * (255^2 + 255) > 2^32
    sec8 = jnp.zeros((P * spec.secret_count * mxu8.L8, 8), dtype=jnp.int8)
    with pytest.raises(ValueError, match="carry-chain bound"):
        fused_share_combine_mxu8(
            mxu8, spec.share_matrix, sec8, P, spec.secret_count,
            spec.randomness_count, lanes=8, interpret=True,
        )


def test_uint32_chain_exact_above_int31():
    """Participant counts whose true column values exceed 2^31 (but not the
    uint32 carry-chain bound) are exact — the r4 bound relaxation that lets
    config-3 run 1024 participants in one chunk. Saturated operands push
    every column to its maximum: K_rows * 255^2 > 2^31."""
    p64, w2, w3 = find_prime_field(62, 8, 9)
    engine = _engine(p64, w2, w3, 6)
    spec, ctx, mxu8 = engine.spec, engine.ctx, engine.mxu8
    P = 1100  # ext layout: 1100 * 7 * 8 * 255^2 = 4.0e9: > 2^31, < bound
    # all-0xFF planar bytes = biased 0x7F: every element is the all-ones
    # canonical-by-chunk value, driving the accumulator to its max
    secrets = np.full((P, engine.dimension), (1 << 48) - 1, dtype=np.int64)
    enc = engine.encode_secrets(secrets)
    ext = np.concatenate([enc, engine.random_ext(P, rng=np.random.default_rng(3))], axis=2)
    lanes = 8
    ext8 = planar8_from_batched(mxu8, jnp.asarray(ext), lanes)
    out = fused_share_combine_mxu8(
        mxu8, spec.share_matrix, ext8, P, spec.secret_count,
        spec.randomness_count, lanes=lanes,
        reconstruct_matrix=spec.reconstruct_matrix, interpret=True,
    )
    got = batched_from_planar_lm(out, engine.nb, spec.secret_count)
    ref = ctx.sum_mod(jnp.asarray(enc), axis=0)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.tpu
def test_prng_reveal_on_device():
    """PRNG mode on a real chip: reveal identity vs the modular sum."""
    if jax.default_backend() == "cpu":
        pytest.skip("pltpu PRNG primitives have no CPU interpret lowering")
    p64, w2, w3 = find_prime_field(62, 8, 9)
    engine = _engine(p64, w2, w3, 384)
    spec, ctx, mxu8 = engine.spec, engine.ctx, engine.mxu8
    rng = np.random.default_rng(5)
    P = 8
    secrets = engine.encode_secrets(rng.integers(0, min(ctx.p, 1 << 62), size=(P, 384)))
    sec8 = engine.planar8_secrets(jnp.asarray(secrets), 128)
    out = engine.aggregate_mxu8_kernel(sec8, 7, p_count=P, lanes=128)
    ref = ctx.sum_mod(jnp.asarray(secrets), axis=0)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.tpu
def test_streaming_mxu8_on_device():
    """Chunked streaming + final reconstruction == one-shot pipeline."""
    if jax.default_backend() == "cpu":
        pytest.skip("pltpu PRNG primitives have no CPU interpret lowering")
    p64, w2, w3 = find_prime_field(62, 8, 9)
    engine = _engine(p64, w2, w3, 384)
    spec, ctx, mxu8 = engine.spec, engine.ctx, engine.mxu8
    rng = np.random.default_rng(6)
    chunks = []
    total = None
    for c in range(3):
        secrets = engine.encode_secrets(rng.integers(0, ctx.p, size=(4, 384)))
        chunks.append(engine.planar8_secrets(jnp.asarray(secrets), 128))
        s = ctx.sum_mod(jnp.asarray(secrets), axis=0)
        total = s if total is None else ctx.add_mod(total, s)
    out = engine.aggregate_mxu8_kernel_streaming(chunks, 4, seed0=3, lanes=128)
    assert np.array_equal(np.asarray(out), np.asarray(total))


@pytest.mark.parametrize("engine", _engines())
def test_chunked_reduction_grid_matches_unchunked(engine):
    """n_chunks > 1 (single-launch reduction grid with VMEM accumulator +
    fused stage-2 per chunk) == the same participants through the unchunked
    kernel — both with and without fused reconstruction."""
    spec, ctx, mxu8 = engine.spec, engine.ctx, engine.mxu8
    rng = np.random.default_rng(5)
    n_chunks, P = 3, 2  # 6 participants total
    secrets = engine.encode_secrets(
        rng.integers(0, min(ctx.p, 1 << 62), size=(n_chunks * P, engine.dimension))
    )
    ext = np.concatenate(
        [secrets, engine.random_ext(n_chunks * P, rng=rng)], axis=2
    )
    lanes = 8
    ext8_all = planar8_from_batched(mxu8, jnp.asarray(ext), lanes)
    rows = ext8_all.shape[0] // n_chunks  # chunks stack row-major by P

    # combined (per-clerk) outputs accumulate canonically across chunks
    ref_comb = fused_share_combine_mxu8(
        mxu8, spec.share_matrix, ext8_all, n_chunks * P, spec.secret_count,
        spec.randomness_count, lanes=lanes, interpret=True,
    )
    got_comb = fused_share_combine_mxu8(
        mxu8, spec.share_matrix, ext8_all, P, spec.secret_count,
        spec.randomness_count, lanes=lanes, n_chunks=n_chunks, interpret=True,
    )
    assert np.array_equal(np.asarray(got_comb), np.asarray(ref_comb))

    # fused stage-2: reconstruction is linear, so per-chunk reconstruct +
    # canonical accumulate == reconstruct of the full combine
    ref_rec = fused_share_combine_mxu8(
        mxu8, spec.share_matrix, ext8_all, n_chunks * P, spec.secret_count,
        spec.randomness_count, lanes=lanes,
        reconstruct_matrix=spec.reconstruct_matrix, interpret=True,
    )
    got_rec = fused_share_combine_mxu8(
        mxu8, spec.share_matrix, ext8_all, P, spec.secret_count,
        spec.randomness_count, lanes=lanes, n_chunks=n_chunks,
        reconstruct_matrix=spec.reconstruct_matrix, interpret=True,
    )
    assert np.array_equal(np.asarray(got_rec), np.asarray(ref_rec))
    got_b = batched_from_planar_lm(got_rec, engine.nb, spec.secret_count)
    assert np.array_equal(
        np.asarray(got_b), np.asarray(ctx.sum_mod(jnp.asarray(secrets), axis=0))
    )


def test_engine_chunked_entrypoint_matches_streaming():
    """engine.aggregate_mxu8_kernel_chunked == the per-chunk streaming path
    for caller-provided (host-CSPRNG layout) randomness."""
    from sda_tpu.fields import find_special_prime_field

    p, w2, w3 = find_special_prime_field(63, 8, 9)
    engine = _engine(p, w2, w3, 21)
    spec, ctx, mxu8 = engine.spec, engine.ctx, engine.mxu8
    rng = np.random.default_rng(9)
    n_chunks, P = 2, 3
    secrets = engine.encode_secrets(
        rng.integers(0, 1 << 62, size=(n_chunks * P, engine.dimension))
    )
    ext = np.concatenate(
        [secrets, engine.random_ext(n_chunks * P, rng=rng)], axis=2
    )
    lanes = 8
    ext8_all = planar8_from_batched(mxu8, jnp.asarray(ext), lanes)
    rows = ext8_all.shape[0] // n_chunks
    chunks = [ext8_all[i * rows : (i + 1) * rows] for i in range(n_chunks)]
    ref = engine.aggregate_mxu8_kernel_streaming(chunks, P, lanes=lanes)
    got = engine.aggregate_mxu8_kernel_chunked(
        ext8_all, n_chunks, P, lanes=lanes
    )
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_lane_batched_jobs_exact_per_job():
    """concat_jobs_lanes / split_jobs_lanes: N same-scheme jobs through ONE
    launch reveal exactly what each job reveals alone (per-lane
    independence — the small-job serving mode of docs/SERVING.md)."""
    from sda_tpu.fields import find_special_prime_field

    p, w2, w3 = find_special_prime_field(63, 8, 9)
    engine = _engine(p, w2, w3, 21)
    spec, ctx, mxu8 = engine.spec, engine.ctx, engine.mxu8
    rng = np.random.default_rng(17)
    lanes = 8
    P, n_jobs = 2, 3
    jobs = []
    singles = []
    for _ in range(n_jobs):
        secrets = engine.encode_secrets(
            rng.integers(0, 1 << 62, size=(P, engine.dimension))
        )
        ext = np.concatenate([secrets, engine.random_ext(P, rng=rng)], axis=2)
        planar = planar8_from_batched(mxu8, jnp.asarray(ext), lanes)
        jobs.append(planar)
        out = fused_share_combine_mxu8(
            mxu8, spec.share_matrix, planar, P, spec.secret_count,
            spec.randomness_count, lanes=lanes,
            reconstruct_matrix=spec.reconstruct_matrix, interpret=True,
        )
        singles.append(
            np.asarray(batched_from_planar_lm(out, engine.nb, spec.secret_count))
        )
    batched = engine.concat_jobs_lanes(jobs)
    # the supported serving entry point: one launch, per-job reveal tensors
    outs = engine.aggregate_mxu8_kernel_jobs(batched, 0, P, n_jobs, lanes=lanes)
    assert outs.shape == (n_jobs, engine.nb, spec.secret_count, ctx.L)
    for i in range(n_jobs):
        assert np.array_equal(np.asarray(outs[i]), singles[i])
    # combined-draw serving mode: one equivalent randomness draw per slot;
    # the reconstructed secrets are identical (randomness cancels at
    # reconstruction; only the never-emitted share representation differs)
    outs_c = engine.aggregate_mxu8_kernel_jobs(
        batched, 0, P, n_jobs, lanes=lanes, combined_randomness=True
    )
    for i in range(n_jobs):
        assert np.array_equal(np.asarray(outs_c[i]), singles[i])
    # shape mismatches are rejected, not silently mis-sliced
    with pytest.raises(ValueError, match="share the planar shape"):
        engine.concat_jobs_lanes([jobs[0], jobs[1][:, : lanes // 2]])
