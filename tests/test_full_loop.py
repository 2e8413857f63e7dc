"""The real-crypto end-to-end loop across the 4-config scheme matrix.

Mirrors /root/reference/integration-tests/tests/full_loop.rs: recipient +
8 clerks + 2 participants each contributing ``[1, 2, 3, 4]``; expected reveal
``[2, 4, 6, 8]`` for additive / +Full mask / +ChaCha mask / PackedShamir.
"""

import numpy as np
import pytest

from sda_tpu import protocol as proto

from .fixtures import make_client, with_service


def agg_default(recipient_id, recipient_key_id, **overrides):
    base = dict(
        id=proto.new_id(),
        title="foo",
        vector_dimension=4,
        modulus=433,
        recipient=recipient_id,
        recipient_key=recipient_key_id,
        masking_scheme=proto.NoMasking(),
        committee_sharing_scheme=proto.AdditiveSharing(share_count=3, modulus=433),
    )
    base.update(overrides)
    return proto.Aggregation(**base)


CONFIGS = {
    "simple": {},
    "with_fullmask": {"masking_scheme": proto.FullMasking(modulus=433)},
    "with_chachamask": {
        "masking_scheme": proto.ChaChaMasking(modulus=433, dimension=4, seed_bitsize=128)
    },
    "with_packedshamir": {
        "committee_sharing_scheme": proto.PackedShamirSharing(
            secret_count=3,
            share_count=8,
            privacy_threshold=4,
            prime_modulus=433,
            omega_secrets=354,
            omega_shares=150,
        )
    },
}


def check_full_aggregation(service, **overrides):
    # prepare recipient
    recipient = make_client(service)
    recipient_key = recipient.new_encryption_key()
    recipient.upload_agent()
    recipient.upload_encryption_key(recipient_key)

    aggregation = agg_default(recipient.agent.id, recipient_key, **overrides)
    recipient.upload_aggregation(aggregation)

    # prepare clerks
    clerks = [make_client(service) for _ in range(8)]
    for clerk in clerks:
        clerk_key = clerk.new_encryption_key()
        clerk.upload_agent()
        clerk.upload_encryption_key(clerk_key)

    # assign committee
    recipient.begin_aggregation(aggregation.id)

    # participate
    participants = [make_client(service) for _ in range(2)]
    for participant in participants:
        participant.upload_agent()
        participant.participate(np.array([1, 2, 3, 4]), aggregation.id)

    # close aggregation
    recipient.end_aggregation(aggregation.id)

    # status checks go through the recipient's own service handle (the HTTP
    # transport authenticates per agent)
    status = recipient.service.get_aggregation_status(recipient.agent, aggregation.id)
    assert status.aggregation == aggregation.id
    assert status.number_of_participations == 2
    assert len(status.snapshots) == 1
    assert status.snapshots[0].number_of_clerking_results == 0
    assert status.snapshots[0].result_ready is False

    # clerking
    recipient.run_chores(-1)
    for clerk in clerks:
        clerk.run_chores(-1)

    status = recipient.service.get_aggregation_status(recipient.agent, aggregation.id)
    assert status.number_of_participations == 2
    expected_results = aggregation.committee_sharing_scheme.output_size
    assert status.snapshots[0].number_of_clerking_results == expected_results
    assert status.snapshots[0].result_ready is True

    # reveal
    output = recipient.reveal_aggregation(aggregation.id)
    assert output.positive().values.tolist() == [2, 4, 6, 8]


@pytest.mark.parametrize("config", list(CONFIGS))
def test_full_loop(config):
    with with_service("memory") as service:
        check_full_aggregation(service, **CONFIGS[config])


def test_full_loop_jsondir_packed():
    # durable-store variant of the heaviest config
    with with_service("jsondir") as service:
        check_full_aggregation(service, **CONFIGS["with_packedshamir"])


@pytest.mark.parametrize("config", ["simple", "with_packedshamir"])
def test_full_loop_over_http(config):
    # same loop through the real REST transport (lib.rs:143-187 feature matrix)
    with with_service("http") as service:
        check_full_aggregation(service, **CONFIGS[config])


def test_verified_key_cache_skips_refetch_and_never_caches_failures():
    """The client caches (owner, key) pairs that verified once — the
    reference's signing FIXME (no verification caching) answered — but a
    failed verification must be re-tried, never cached."""
    from sda_tpu.utils.errors import Invalid

    with with_service("memory") as service:
        owner = make_client(service)
        key_id = owner.new_encryption_key()
        owner.upload_agent()
        owner.upload_encryption_key(key_id)
        user = make_client(service)

        calls = []
        real_get = user.service.get_encryption_key
        user.service.get_encryption_key = (
            lambda caller, kid: calls.append(kid) or real_get(caller, kid)
        )
        first = user._verified_encryption_key(owner.agent.id, key_id)
        assert calls == [key_id]
        second = user._verified_encryption_key(owner.agent.id, key_id)
        assert calls == [key_id]  # cache hit: no second fetch
        assert first is second

        # a failing verification is NOT cached: both calls re-fetch
        bad = make_client(service)
        bad_calls = []
        bad.service.get_encryption_key = (
            lambda caller, kid: bad_calls.append(kid) or real_get(caller, kid)
        )
        bad.crypto.signature_is_valid = lambda *_: False
        for _ in range(2):
            with pytest.raises(Invalid, match="verification failed"):
                bad._verified_encryption_key(owner.agent.id, key_id)
        assert len(bad_calls) == 2
        assert not bad._verified_keys


def test_end_aggregation_idempotent():
    with with_service("memory") as service:
        recipient = make_client(service)
        key = recipient.new_encryption_key()
        recipient.upload_agent()
        recipient.upload_encryption_key(key)
        agg = agg_default(recipient.agent.id, key)
        recipient.upload_aggregation(agg)
        clerks = [make_client(service) for _ in range(3)]
        for c in clerks:
            ck = c.new_encryption_key()
            c.upload_agent()
            c.upload_encryption_key(ck)
        recipient.begin_aggregation(agg.id)
        recipient.end_aggregation(agg.id)
        recipient.end_aggregation(agg.id)  # receive.rs:68-70: no second snapshot
        status = service.get_aggregation_status(recipient.agent, agg.id)
        assert len(status.snapshots) == 1
