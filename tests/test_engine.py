"""Device engine: bulk aggregation vs the host protocol-layer golden path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sda_tpu.engine import TpuAggregationEngine
from sda_tpu.models import FederatedAggregation
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
    [
        PackedShamirScheme(**REF),
        AdditiveScheme(share_count=5, modulus=433),
        AdditiveScheme(share_count=3, modulus=(1 << 61) - 1),
    ],
    ids=["packed433", "additive433", "additive61bit"],
)
def test_engine_aggregate_matches_sum(scheme, rng):
    d, p_count = 10, 6
    modulus = getattr(scheme, "prime_modulus", None) or scheme.modulus
    engine = TpuAggregationEngine(scheme.device_spec(), d)
    secrets = np.array(
        [[int(rng.integers(0, min(modulus, 2**31))) for _ in range(d)] for _ in range(p_count)],
        dtype=object,
    )
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    out = engine.aggregate(enc, rand)
    got = [int(x) for x in engine.decode_output(out)]
    expect = [int(sum(secrets[i][j] for i in range(p_count))) % modulus for j in range(d)]
    assert got == expect


def test_engine_stage_outputs_match_host_scheme(rng):
    """Device share generation must be reconstructible by the host scheme."""
    scheme = PackedShamirScheme(**REF)
    engine = TpuAggregationEngine(scheme.device_spec(), 4)
    secrets = np.array([[1, 2, 3, 4]], dtype=object)
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(1, rng=rng))
    ext = jnp.concatenate([enc, rand], axis=2)
    shares = engine.share(ext)  # [1, nb, n, L]
    share_vals = engine.decode_shares(np.asarray(shares))[0]  # [nb, n]
    per_clerk = share_vals.T  # [n, nb]
    out = scheme.reconstruct([(i, per_clerk[i]) for i in range(8)], dimension=4)
    from sda_tpu.fields import positive

    assert [int(x) for x in positive(out, 433)] == [1, 2, 3, 4]


def test_federated_model_masked_reveal(rng):
    model = FederatedAggregation.packed_64bit(dimension=64)
    secrets, key = model.example_inputs(participants=8, seed=1)
    out = model.forward(secrets, key)
    revealed = model.reveal(np.asarray(out))
    # golden: plain sum of the example inputs
    rng2 = np.random.default_rng(1)
    raw = rng2.integers(0, min(model.scheme_modulus, 1 << 31), size=(8, 64))
    expect = [int(x) % model.scheme_modulus for x in raw.sum(axis=0)]
    assert [int(x) for x in revealed] == expect


def test_federated_model_128bit(rng):
    model = FederatedAggregation.packed_128bit(dimension=12)
    assert model.engine.ctx.L == 8
    secrets, key = model.example_inputs(participants=4, seed=2)
    out = model.forward(secrets, key)
    revealed = model.reveal(np.asarray(out))
    rng2 = np.random.default_rng(2)
    raw = rng2.integers(0, min(model.scheme_modulus, 1 << 31), size=(4, 12))
    expect = [int(x) % model.scheme_modulus for x in raw.sum(axis=0)]
    assert [int(x) for x in revealed] == expect


def test_sharded_pipeline_matches_single_device(rng):
    from sda_tpu.parallel import ShardedAggregationPipeline, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    scheme = PackedShamirScheme(**REF)
    d = 12
    engine = TpuAggregationEngine(scheme.device_spec(), d)
    mesh = make_mesh({"p": 2, "d": 2, "c": 2})
    pipe = ShardedAggregationPipeline(engine, mesh)
    p_count = 8
    secrets = np.array(
        [[int(rng.integers(0, 433)) for _ in range(d)] for _ in range(p_count)], dtype=object
    )
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    single = engine.aggregate(enc, rand)
    sharded = pipe.aggregate(pipe.shard_inputs(enc), pipe.shard_inputs(rand))
    got_single = [int(x) for x in engine.decode_output(np.asarray(single))]
    got_sharded = [int(x) for x in engine.decode_output(np.asarray(sharded))]
    assert got_single == got_sharded
    expect = [int(sum(secrets[i][j] for i in range(p_count))) % 433 for j in range(d)]
    assert got_sharded == expect


def test_sharded_mxu_kernel_matches_single_device(rng):
    """The MXU-kernel sharded step (caller randomness) is bit-exact vs the
    single-device jnp pipeline on a 2x2x2 virtual mesh."""
    from sda_tpu.parallel import ShardedAggregationPipeline, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    scheme = PackedShamirScheme(**REF)
    d = 12
    engine = TpuAggregationEngine(scheme.device_spec(), d)
    mesh = make_mesh({"p": 2, "d": 2, "c": 2})
    pipe = ShardedAggregationPipeline(engine, mesh)
    p_count = 8
    secrets = np.array(
        [[int(rng.integers(0, 433)) for _ in range(d)] for _ in range(p_count)], dtype=object
    )
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    single = engine.aggregate(enc, rand)
    ext = jnp.concatenate([enc, rand], axis=2)
    ext7 = engine.planar7_ext(ext, lanes=128)
    out = pipe.aggregate_mxu_ext(pipe.shard_planar(ext7))
    # zero-padding batches follow the real ones; decode_output truncates
    got = [int(x) for x in engine.decode_output(np.asarray(out))]
    want = [int(x) for x in engine.decode_output(np.asarray(single))]
    assert got == want
    expect = [int(sum(secrets[i][j] for i in range(p_count))) % 433 for j in range(d)]
    assert got == expect


def test_sharded_mxu_streaming_matches_single_device(rng):
    """The config-5 path (participant streaming x mesh sharding) agrees
    bit-exactly with the single-device pipeline across 3 chunks."""
    from sda_tpu.parallel import ShardedAggregationPipeline, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    scheme = PackedShamirScheme(**REF)
    d = 12
    engine = TpuAggregationEngine(scheme.device_spec(), d)
    mesh = make_mesh({"p": 2, "d": 2, "c": 2})
    pipe = ShardedAggregationPipeline(engine, mesh)
    p_chunk, n_chunks = 8, 3
    p_count = p_chunk * n_chunks
    secrets = np.array(
        [[int(rng.integers(0, 433)) for _ in range(d)] for _ in range(p_count)], dtype=object
    )
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    single = engine.aggregate(enc, rand)
    ext = jnp.concatenate([enc, rand], axis=2)
    chunks = [
        engine.planar7_ext(ext[i * p_chunk : (i + 1) * p_chunk], lanes=128)
        for i in range(n_chunks)
    ]
    out = pipe.aggregate_mxu_streaming(chunks, ext=True)
    got = [int(x) for x in engine.decode_output(np.asarray(out))]
    want = [int(x) for x in engine.decode_output(np.asarray(single))]
    assert got == want
    expect = [int(sum(secrets[i][j] for i in range(p_count))) % 433 for j in range(d)]
    assert got == expect


def test_sharded_mxu8_streaming_matches_single_device(rng):
    """The gen-4 (byte-limb) config-5 path agrees bit-exactly with the
    single-device pipeline across chunks on a (p=2, d=2, c=2) mesh."""
    from sda_tpu.fields import find_special_prime_field
    from sda_tpu.parallel import ShardedAggregationPipeline, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    p, w2, w3 = find_special_prime_field(63, 8, 9)
    scheme = PackedShamirScheme(3, 8, 4, p, w2, w3)
    d = 12
    engine = TpuAggregationEngine(scheme.device_spec(), d)
    mesh = make_mesh({"p": 2, "d": 2, "c": 2})
    pipe = ShardedAggregationPipeline(engine, mesh)
    p_chunk, n_chunks = 8, 2
    p_count = p_chunk * n_chunks
    secrets = np.array(
        [[int(rng.integers(0, 1 << 62)) for _ in range(d)] for _ in range(p_count)],
        dtype=object,
    )
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    single = engine.aggregate(enc, rand)
    ext = jnp.concatenate([enc, rand], axis=2)
    chunks = [
        engine.planar8_ext(ext[i * p_chunk : (i + 1) * p_chunk], lanes=8)
        for i in range(n_chunks)
    ]
    out = pipe.aggregate_mxu8_streaming(chunks, ext=True)
    got = [int(x) for x in engine.decode_output(np.asarray(out))]
    want = [int(x) for x in engine.decode_output(np.asarray(single))]
    assert got == want
    expect = [int(sum(secrets[i][j] for i in range(p_count))) % p for j in range(d)]
    assert got == expect


def test_sharded_mxu8_degraded_committee_and_lane_batch(rng):
    """P4 on the mesh: every sweep of one dropped clerk shard reconstructs
    the same aggregate through the subset-Lagrange fused finish; and two
    lane-concatenated jobs share one sharded launch with per-job-exact
    reveals (VERDICT r4 directive 7)."""
    from sda_tpu.fields import find_special_prime_field
    from sda_tpu.parallel import ShardedAggregationPipeline, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    p, w2, w3 = find_special_prime_field(63, 8, 9)
    scheme = PackedShamirScheme(3, 8, 4, p, w2, w3)
    d = 12
    engine = TpuAggregationEngine(scheme.device_spec(), d)
    mesh = make_mesh({"p": 2, "d": 2, "c": 2})
    pipe = ShardedAggregationPipeline(engine, mesh)
    p_count = 8
    secrets = np.array(
        [[int(rng.integers(0, 1 << 62)) for _ in range(d)] for _ in range(p_count)],
        dtype=object,
    )
    enc = jnp.asarray(engine.encode_secrets(secrets))
    rand = jnp.asarray(engine.random_ext(p_count, rng=rng))
    ext = jnp.concatenate([enc, rand], axis=2)
    chunk = engine.planar8_ext(ext, lanes=8)
    expect = [int(sum(secrets[i][j] for i in range(p_count))) % p for j in range(d)]
    for drop in range(scheme.share_count):
        subset = [i for i in range(scheme.share_count) if i != drop]
        out = pipe.aggregate_mxu8_streaming(
            [chunk], ext=True, indices=subset,
            subset_matrix=scheme.reconstruct_matrix(subset),
        )
        got = [int(x) for x in engine.decode_output(np.asarray(out))]
        assert got == expect, f"dropped shard {drop} diverges"
    # lane batch: second job with different secrets, one launch, exact split
    secrets_b = np.array(
        [[int(rng.integers(0, 1 << 62)) for _ in range(d)] for _ in range(p_count)],
        dtype=object,
    )
    ext_b = jnp.concatenate(
        [
            jnp.asarray(engine.encode_secrets(secrets_b)),
            jnp.asarray(engine.random_ext(p_count, rng=rng)),
        ],
        axis=2,
    )
    job_a = engine.planar8_ext(ext, lanes=8)
    job_b = engine.planar8_ext(ext_b, lanes=8)
    batched = engine.concat_jobs_lanes([job_a, job_b])
    out_lb = np.asarray(pipe.aggregate_mxu8_streaming([batched], ext=True))
    nbp_job = job_a.shape[1]
    expect_b = [
        int(sum(secrets_b[i][j] for i in range(p_count))) % p for j in range(d)
    ]
    for j, want in enumerate((expect, expect_b)):
        sl = out_lb[j * nbp_job : j * nbp_job + engine.nb]
        assert [int(x) for x in engine.decode_output(sl)] == want


def test_device_combine_matches_host(rng):
    from sda_tpu.engine import device_combine
    from sda_tpu.fields import positive
    from sda_tpu.sharing import AdditiveScheme

    # odd and even moduli, signed inputs
    for modulus in (433, 1 << 16, (1 << 61) - 1):
        vecs = [rng.integers(-(modulus - 1), modulus, size=37) for _ in range(9)]
        got = device_combine(modulus, vecs)
        expect = positive(
            AdditiveScheme(share_count=9, modulus=modulus).combine(vecs), modulus
        )
        assert [int(x) for x in got] == [int(x) for x in expect]
        assert all(0 <= int(x) < modulus for x in got)


def test_device_combine_streams_in_chunks(rng):
    """P=2k share vectors drain through the accumulator as a generator —
    peak host memory is O(chunk x d), the clerk.rs:71-72 streaming shape."""
    from sda_tpu.engine import device_combine

    modulus = (1 << 61) - 1
    p_count, d = 2047, 5  # non-multiple of the chunk size: tail path too
    base = rng.integers(0, modulus, size=(p_count, d))

    consumed = 0

    def vectors():
        nonlocal consumed
        for row in base:
            consumed += 1
            yield row

    got = device_combine(modulus, vectors(), chunk_size=64)
    assert consumed == p_count  # the generator was drained lazily, fully
    expect = [int(sum(int(base[i, j]) for i in range(p_count))) % modulus for j in range(d)]
    assert [int(x) for x in got] == expect

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        device_combine(modulus, [])


def test_client_device_bulk_combine_full_loop(rng):
    """Full protocol loop with clerks combining on the accelerator."""
    import numpy as np
    from tests.fixtures import make_client, with_service
    from tests.test_full_loop import CONFIGS, agg_default

    with with_service("memory") as service:
        recipient = make_client(service)
        rkey = recipient.new_encryption_key()
        recipient.upload_agent()
        recipient.upload_encryption_key(rkey)
        agg = agg_default(recipient.agent.id, rkey, **CONFIGS["with_packedshamir"])
        recipient.upload_aggregation(agg)
        clerks = [make_client(service) for _ in range(8)]
        for c in clerks:
            k = c.new_encryption_key()
            c.upload_agent()
            c.upload_encryption_key(k)
            c.device_bulk_threshold = 1  # force the device combine path
        recipient.device_bulk_threshold = 1
        recipient.begin_aggregation(agg.id)
        for _ in range(2):
            p = make_client(service)
            p.upload_agent()
            p.participate(np.array([1, 2, 3, 4]), agg.id)
        recipient.end_aggregation(agg.id)
        recipient.run_chores(-1)
        for c in clerks:
            c.run_chores(-1)
        out = recipient.reveal_aggregation(agg.id)
        assert out.positive().values.tolist() == [2, 4, 6, 8]


def test_client_device_reveal_chacha_full_loop(rng):
    """Recipient reveal with device mask re-expansion + reconstruction."""
    import numpy as np
    from tests.fixtures import make_client, with_service
    from tests.test_full_loop import CONFIGS, agg_default

    with with_service("memory") as service:
        recipient = make_client(service)
        rkey = recipient.new_encryption_key()
        recipient.upload_agent()
        recipient.upload_encryption_key(rkey)
        agg = agg_default(recipient.agent.id, rkey, **CONFIGS["with_chachamask"])
        recipient.upload_aggregation(agg)
        clerks = [make_client(service) for _ in range(8)]
        for c in clerks:
            k = c.new_encryption_key()
            c.upload_agent()
            c.upload_encryption_key(k)
        recipient.device_bulk_threshold = 1  # device mask combine + reconstruct
        recipient.begin_aggregation(agg.id)
        for _ in range(2):
            p = make_client(service)
            p.upload_agent()
            p.participate(np.array([1, 2, 3, 4]), agg.id)
        recipient.end_aggregation(agg.id)
        recipient.run_chores(-1)
        for c in clerks:
            c.run_chores(-1)
        out = recipient.reveal_aggregation(agg.id)
        assert out.positive().values.tolist() == [2, 4, 6, 8]


@pytest.mark.parametrize("config", ["simple", "with_packedshamir"])
def test_client_device_share_generation_full_loop(config, rng):
    """Full protocol loop with participants sharing on the accelerator."""
    import numpy as np
    from tests.fixtures import make_client, with_service
    from tests.test_full_loop import CONFIGS, agg_default

    with with_service("memory") as service:
        recipient = make_client(service)
        rkey = recipient.new_encryption_key()
        recipient.upload_agent()
        recipient.upload_encryption_key(rkey)
        agg = agg_default(recipient.agent.id, rkey, **CONFIGS[config])
        recipient.upload_aggregation(agg)
        clerks = [make_client(service) for _ in range(8)]
        for c in clerks:
            k = c.new_encryption_key()
            c.upload_agent()
            c.upload_encryption_key(k)
        recipient.begin_aggregation(agg.id)
        for _ in range(2):
            p = make_client(service)
            p.upload_agent()
            p.device_bulk_threshold = 1  # force device share generation
            p.participate(np.array([1, 2, 3, 4]), agg.id)
        recipient.end_aggregation(agg.id)
        recipient.run_chores(-1)
        for c in clerks:
            c.run_chores(-1)
        out = recipient.reveal_aggregation(agg.id)
        assert out.positive().values.tolist() == [2, 4, 6, 8]
