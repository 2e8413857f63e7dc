"""Protocol failure tolerance: clerk dropout, retries, idempotence.

The packed-Shamir scheme tolerates ``share_count - (t + k)`` missing clerks
(crypto.rs:147-153); ``result_ready`` fires at the reconstruction threshold,
not full participation (server.rs:119-121); participation retries are
idempotent via client-generated ids (resources.rs:93-101).
"""

import numpy as np
import pytest

from sda_tpu.utils.errors import Invalid

from .fixtures import make_client, with_service
from .test_full_loop import CONFIGS, agg_default


def test_clerk_dropout_reveal_still_works():
    """7 of 8 clerks respond (threshold = 7): reveal succeeds via the
    Lagrange subset path."""
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
        recipient.begin_aggregation(agg.id)

        for _ in range(2):
            part = make_client(service)
            part.upload_agent()
            part.participate(np.array([1, 2, 3, 4]), agg.id)
        recipient.end_aggregation(agg.id)

        # committee members = first 8 candidates; find them and drop ONE
        committee = service.get_committee(recipient.agent, agg.id)
        members = [cid for cid, _ in committee.clerks_and_keys]
        everyone = {c.agent.id: c for c in clerks + [recipient]}
        responding = [everyone[cid] for cid in members][:-1]  # one dropout
        for c in responding:
            c.run_chores(-1)

        status = recipient.service.get_aggregation_status(recipient.agent, agg.id)
        snap = status.snapshots[0]
        assert snap.number_of_clerking_results == 7
        assert snap.result_ready is True  # threshold t+k = 7 (server.rs:119-121)

        out = recipient.reveal_aggregation(agg.id)
        assert out.positive().values.tolist() == [2, 4, 6, 8]

        # same degraded committee revealed through the device Lagrange path
        recipient.device_bulk_threshold = 1
        out = recipient.reveal_aggregation(agg.id)
        assert out.positive().values.tolist() == [2, 4, 6, 8]


def test_too_many_dropouts_not_ready():
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
        recipient.begin_aggregation(agg.id)
        part = make_client(service)
        part.upload_agent()
        part.participate(np.array([1, 2, 3, 4]), agg.id)
        recipient.end_aggregation(agg.id)

        committee = service.get_committee(recipient.agent, agg.id)
        members = [cid for cid, _ in committee.clerks_and_keys]
        everyone = {c.agent.id: c for c in clerks + [recipient]}
        for cid in members[:6]:  # only 6 of 8 respond: below threshold 7
            everyone[cid].run_chores(-1)
        status = recipient.service.get_aggregation_status(recipient.agent, agg.id)
        assert status.snapshots[0].result_ready is False
        with pytest.raises(Invalid, match="not ready"):
            recipient.reveal_aggregation(agg.id)


def _setup_aggregation(service, n_clerks=3, **overrides):
    """Recipient + clerks + committee for the default 3-clerk additive agg."""
    recipient = make_client(service)
    rkey = recipient.new_encryption_key()
    recipient.upload_agent()
    recipient.upload_encryption_key(rkey)
    agg = agg_default(recipient.agent.id, rkey, **overrides)
    recipient.upload_aggregation(agg)
    clerks = [make_client(service) for _ in range(n_clerks)]
    for c in clerks:
        k = c.new_encryption_key()
        c.upload_agent()
        c.upload_encryption_key(k)
    recipient.begin_aggregation(agg.id)
    return recipient, clerks, agg


def _tampered_signed_key(client):
    """A signed encryption key whose Ed25519 signature is corrupted —
    a malicious agent presenting a key it cannot prove ownership of."""
    from sda_tpu import protocol as proto

    key_id = client.crypto.new_encryption_key()
    signed = client.crypto.sign_export(client.agent, key_id)
    bad_sig = bytearray(signed.signature.data)
    bad_sig[0] ^= 0x01
    return key_id, proto.Signed(
        signature=proto.Signature(bytes(bad_sig)),
        signer=signed.signer,
        body=signed.body,
    )


def _upload_tampered_key(client) -> str:
    key_id, tampered = _tampered_signed_key(client)
    client.service.create_encryption_key(client.agent, tampered)
    return key_id


def test_tampered_clerk_key_rejected_at_participation():
    """A clerk key with a forged signature must abort new_participation
    (participate.rs:82-101: every clerk key is signature-verified before
    shares are encrypted under it)."""
    with with_service("memory") as service:
        recipient = make_client(service)
        rkey = recipient.new_encryption_key()
        recipient.upload_agent()
        recipient.upload_encryption_key(rkey)
        agg = agg_default(recipient.agent.id, rkey)
        recipient.upload_aggregation(agg)
        # every clerk presents a forged key: whatever 3-of-4 candidate
        # subset the committee election picks, at least two bad keys sit
        # in it and the participant must refuse
        clerks = [make_client(service) for _ in range(3)]
        for c in clerks:
            c.upload_agent()
            _upload_tampered_key(c)
        recipient.begin_aggregation(agg.id)

        part = make_client(service)
        part.upload_agent()
        with pytest.raises(Invalid, match="Signature verification failed"):
            part.new_participation(np.array([1, 2, 3, 4]), agg.id)


def test_forged_recipient_key_rejected_at_mask_encryption():
    """With masking on, the participant verifies the recipient key before
    encrypting its mask under it (participate.rs:56-72)."""
    from sda_tpu import protocol as proto

    with with_service("memory") as service:
        recipient = make_client(service)
        recipient.upload_agent()
        bad_key_id = _upload_tampered_key(recipient)
        agg = agg_default(
            recipient.agent.id, bad_key_id,
            masking_scheme=proto.FullMasking(modulus=433),
        )
        recipient.upload_aggregation(agg)
        clerks = [make_client(service) for _ in range(3)]
        for c in clerks:
            c.upload_agent()
            c.upload_encryption_key(c.new_encryption_key())
        recipient.begin_aggregation(agg.id)
        part = make_client(service)
        part.upload_agent()
        with pytest.raises(Invalid, match="Signature verification failed"):
            part.new_participation(np.array([1, 2, 3, 4]), agg.id)


def test_forged_recipient_key_rejected_at_clerking():
    """Clerks verify the recipient key before re-encrypting their combined
    shares under it (clerk.rs:88-100). With no masking the participant
    never touches the recipient key, so the clerk is the first line of
    defense against an unprovable key — it must fail, not leak shares."""
    with with_service("memory") as service:
        recipient = make_client(service)
        recipient.upload_agent()
        bad_key_id, tampered = _tampered_signed_key(recipient)
        agg = agg_default(recipient.agent.id, bad_key_id)  # NoMasking
        recipient.upload_aggregation(agg)
        clerks = [make_client(service) for _ in range(3)]
        for c in clerks:
            c.upload_agent()
            c.upload_encryption_key(c.new_encryption_key())
        recipient.begin_aggregation(agg.id)
        # the forged key lands only after the committee is elected, so the
        # recipient never becomes a committee candidate through it
        service.create_encryption_key(recipient.agent, tampered)

        part = make_client(service)
        part.upload_agent()
        part.participate(np.array([1, 2, 3, 4]), agg.id)
        recipient.end_aggregation(agg.id)

        committee = service.get_committee(recipient.agent, agg.id)
        everyone = {c.agent.id: c for c in clerks + [recipient]}
        clerk = everyone[committee.clerks_and_keys[0][0]]
        with pytest.raises(Invalid, match="Signature verification failed"):
            clerk.run_chores(-1)


def test_corrupted_sealed_box_surfaces_invalid():
    """A corrupted ciphertext in a stored participation must surface
    ``Invalid`` at the clerk (sealed boxes authenticate: sodium.rs:72-92),
    never combine garbage into the aggregate."""
    import dataclasses

    with with_service("memory") as service:
        recipient, clerks, agg = _setup_aggregation(service)
        part = make_client(service)
        part.upload_agent()
        participation = part.new_participation(np.array([1, 2, 3, 4]), agg.id)
        clerk_id, enc = participation.clerk_encryptions[0]
        corrupted = bytearray(enc.data)
        corrupted[len(corrupted) // 2] ^= 0xFF
        tampered = dataclasses.replace(
            participation,
            clerk_encryptions=(
                (clerk_id, type(enc)(data=bytes(corrupted))),
            )
            + tuple(participation.clerk_encryptions[1:]),
        )
        part.upload_participation(tampered)
        recipient.end_aggregation(agg.id)

        everyone = {c.agent.id: c for c in clerks + [recipient]}
        victim = everyone[clerk_id]
        with pytest.raises(Invalid, match="decryption failure"):
            victim.run_chores(-1)


def test_participation_retry_idempotent():
    with with_service("jsondir") as service:
        recipient = make_client(service)
        rkey = recipient.new_encryption_key()
        recipient.upload_agent()
        recipient.upload_encryption_key(rkey)
        agg = agg_default(recipient.agent.id, rkey)
        recipient.upload_aggregation(agg)
        clerks = [make_client(service) for _ in range(3)]
        for c in clerks:
            k = c.new_encryption_key()
            c.upload_agent()
            c.upload_encryption_key(k)
        recipient.begin_aggregation(agg.id)

        part = make_client(service)
        part.upload_agent()
        participation = part.new_participation(np.array([1, 2, 3, 4]), agg.id)
        part.upload_participation(participation)
        part.upload_participation(participation)  # network retry: same id
        status = recipient.service.get_aggregation_status(recipient.agent, agg.id)
        assert status.number_of_participations == 1


def test_clerk_job_durable_until_result():
    """Jobs stay pollable until a result is stored (clerking_jobs.rs:51-58)."""
    with with_service("jsondir") as service:
        recipient = make_client(service)
        rkey = recipient.new_encryption_key()
        recipient.upload_agent()
        recipient.upload_encryption_key(rkey)
        agg = agg_default(recipient.agent.id, rkey)
        recipient.upload_aggregation(agg)
        clerks = [make_client(service) for _ in range(3)]
        for c in clerks:
            k = c.new_encryption_key()
            c.upload_agent()
            c.upload_encryption_key(k)
        recipient.begin_aggregation(agg.id)
        part = make_client(service)
        part.upload_agent()
        part.participate(np.array([1, 2, 3, 4]), agg.id)
        recipient.end_aggregation(agg.id)

        committee = service.get_committee(recipient.agent, agg.id)
        clerk_id = committee.clerks_and_keys[0][0]
        everyone = {c.agent.id: c for c in clerks + [recipient]}
        clerk = everyone[clerk_id]
        # poll twice without pushing a result: same job returned (durable)
        j1 = service.get_clerking_job(clerk.agent, clerk_id)
        j2 = service.get_clerking_job(clerk.agent, clerk_id)
        assert j1 is not None and j1.id == j2.id
        # process + push: queue drains
        result = clerk.process_clerking_job(j1)
        service.create_clerking_result(clerk.agent, result)
        assert service.get_clerking_job(clerk.agent, clerk_id) is None
        # idempotent re-push after the move (retry after lost ack)
        service.create_clerking_result(clerk.agent, result)
