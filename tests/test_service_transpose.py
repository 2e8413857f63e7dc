"""Server-side transposition asserted byte-level with fake ciphertexts.

Mirrors /root/reference/integration-tests/tests/service.rs `full_mocked_loop`:
20 agents, committee of 3, 100 participations with fake 2-byte ciphertexts
``[clerk_index, participant_index]`` so each clerking job can be checked to
contain exactly its own clerk's bytes, plus status transitions.
"""

import pytest

from sda_tpu import protocol as proto
from sda_tpu.utils.errors import Invalid

from .fixtures import dummy_agent, dummy_signed_key, with_service


@pytest.fixture(params=["memory", "jsondir", "mongo"])
def service(request):
    with with_service(request.param) as s:
        yield s


def test_full_mocked_loop(service):
    recipient = dummy_agent()
    service.create_agent(recipient, recipient)
    recipient_key = dummy_signed_key(recipient)
    service.create_encryption_key(recipient, recipient_key)

    # 20 candidate clerks with keys
    clerks = []
    for _ in range(20):
        clerk = dummy_agent()
        service.create_agent(clerk, clerk)
        key = dummy_signed_key(clerk)
        service.create_encryption_key(clerk, key)
        clerks.append((clerk, key))

    agg = proto.Aggregation(
        id=proto.new_id(),
        title="mocked",
        vector_dimension=4,
        modulus=433,
        recipient=recipient.id,
        recipient_key=recipient_key.id,
        masking_scheme=proto.NoMasking(),
        committee_sharing_scheme=proto.AdditiveSharing(share_count=3, modulus=433),
    )
    service.create_aggregation(recipient, agg)

    candidates = service.suggest_committee(recipient, agg.id)
    assert len(candidates) >= 3
    selected = [(c.id, c.keys[0]) for c in candidates[:3]]
    committee = proto.Committee(aggregation=agg.id, clerks_and_keys=tuple(selected))
    service.create_committee(recipient, committee)

    # 100 participations with fake ciphertexts [clerk_index, participant_index]
    for pi in range(100):
        participant = dummy_agent()
        service.create_agent(participant, participant)
        participation = proto.Participation(
            id=proto.new_id(),
            participant=participant.id,
            aggregation=agg.id,
            recipient_encryption=None,
            clerk_encryptions=tuple(
                (clerk_id, proto.Encryption(bytes([ci, pi % 256])))
                for ci, (clerk_id, _) in enumerate(selected)
            ),
        )
        service.create_participation(participant, participation)

    status = service.get_aggregation_status(recipient, agg.id)
    assert status.number_of_participations == 100
    assert status.snapshots == ()

    snapshot = proto.Snapshot(id=proto.new_id(), aggregation=agg.id)
    service.create_snapshot(recipient, snapshot)

    status = service.get_aggregation_status(recipient, agg.id)
    assert len(status.snapshots) == 1
    assert status.snapshots[0].number_of_clerking_results == 0
    assert status.snapshots[0].result_ready is False

    # each clerk's job contains only bytes tagged with its own index
    # candidates include every agent with a signed key — the recipient too
    agents_by_id = {c.id: c for c, _ in clerks}
    agents_by_id[recipient.id] = recipient
    seen_clerks = set()
    for ci, (clerk_id, _) in enumerate(selected):
        clerk_agent = agents_by_id[clerk_id]
        job = service.get_clerking_job(clerk_agent, clerk_id)
        assert job is not None
        assert job.aggregation == agg.id
        assert job.snapshot == snapshot.id
        assert len(job.encryptions) == 100
        for enc in job.encryptions:
            assert enc.data[0] == ci  # byte-level transposition check
        seen_clerks.add(clerk_id)
        # participant order is preserved within each job
        pis = [enc.data[1] for enc in job.encryptions]
        assert pis == sorted(pis) or len(set(pis)) == len(pis)

        # push a fake result
        result = proto.ClerkingResult(
            job=job.id, clerk=clerk_id, encryption=proto.Encryption(bytes([ci]))
        )
        service.create_clerking_result(clerk_agent, result)

    assert len(seen_clerks) == 3
    status = service.get_aggregation_status(recipient, agg.id)
    assert status.snapshots[0].number_of_clerking_results == 3
    assert status.snapshots[0].result_ready is True  # additive: threshold = 3

    result = service.get_snapshot_result(recipient, agg.id, snapshot.id)
    assert result.number_of_participations == 100
    assert len(result.clerk_encryptions) == 3
    assert result.recipient_encryptions is None


def test_clerk_result_spoofing_rejected(service):
    # server.rs:351-360: pushing a result for an unknown job fails
    clerk = dummy_agent()
    service.create_agent(clerk, clerk)
    with pytest.raises(Invalid):
        service.create_clerking_result(
            clerk,
            proto.ClerkingResult(
                job=proto.new_id(), clerk=clerk.id, encryption=proto.Encryption(b"x")
            ),
        )
