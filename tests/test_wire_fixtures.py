"""Frozen JSON wire fixtures — one golden file per resource type.

The reference's wire format is serde_json over the structs in
/root/reference/protocol/src/resources.rs and crypto.rs. These fixtures pin
our serialized shape so any drift (field rename, tagging change, base64
change, canonical-bytes change) fails a test instead of silently breaking
interop with Rust peers.

Regenerate deliberately with:
    python -m tests.test_wire_fixtures   (writes tests/golden/wire/*.json)
"""

import json
from pathlib import Path

import pytest

from sda_tpu import protocol as proto

GOLDEN = Path(__file__).parent / "golden" / "wire"

AGENT_ID = "0de87e33-abb9-4d4b-a84a-b7c22f5ab79a"
VKEY_ID = "1bb1c200-b8b4-40bc-9eb2-66f5ca334338"
EKEY_ID = "2cc2d311-c9c5-51cd-8fc3-77a6db445449"
AGG_ID = "3dd3e422-dad6-62de-9ad4-88b7ec556550"
PART_ID = "4ee4f533-ebe7-73ef-8be5-99c8fd667661"
SNAP_ID = "5ff50644-fcf8-84f0-9cf6-aad90e778772"
JOB_ID = "60061755-0d09-9501-8d07-bbea1f889883"


def _instances():
    vkey = proto.Labelled(id=VKEY_ID, body=proto.VerificationKey(bytes(range(32))))
    agent = proto.Agent(id=AGENT_ID, verification_key=vkey)
    sig = proto.Signature(bytes(range(64)))
    ekey = proto.Labelled(id=EKEY_ID, body=proto.EncryptionKey(bytes(range(32, 64))))
    signed_key = proto.Signed(signature=sig, signer=AGENT_ID, body=ekey)
    enc = proto.Encryption(b"ciphertext-bytes")
    clerking_result = proto.ClerkingResult(job=JOB_ID, clerk=AGENT_ID, encryption=enc)
    return {
        "Agent": agent,
        "Profile": proto.Profile(
            owner=AGENT_ID, name="Name", twitter_id="tw", keybase_id="kb", website="https://x"
        ),
        "SignedEncryptionKey": signed_key,
        "Aggregation": proto.Aggregation(
            id=AGG_ID,
            title="wire fixture",
            vector_dimension=4,
            modulus=433,
            recipient=AGENT_ID,
            recipient_key=EKEY_ID,
            masking_scheme=proto.ChaChaMasking(433, 4, 128),
            committee_sharing_scheme=proto.PackedShamirSharing(3, 8, 4, 433, 354, 150),
        ),
        "AggregationAdditiveFull": proto.Aggregation(
            id=AGG_ID,
            title="wire fixture 2",
            vector_dimension=10,
            modulus=433,
            recipient=AGENT_ID,
            recipient_key=EKEY_ID,
            masking_scheme=proto.FullMasking(433),
            committee_sharing_scheme=proto.AdditiveSharing(3, 433),
        ),
        "ClerkCandidate": proto.ClerkCandidate(id=AGENT_ID, keys=(EKEY_ID,)),
        "Committee": proto.Committee(
            aggregation=AGG_ID, clerks_and_keys=((AGENT_ID, EKEY_ID),)
        ),
        "Participation": proto.Participation(
            id=PART_ID,
            participant=AGENT_ID,
            aggregation=AGG_ID,
            recipient_encryption=enc,
            clerk_encryptions=((AGENT_ID, enc),),
        ),
        "Snapshot": proto.Snapshot(id=SNAP_ID, aggregation=AGG_ID),
        "ClerkingJob": proto.ClerkingJob(
            id=JOB_ID,
            clerk=AGENT_ID,
            aggregation=AGG_ID,
            snapshot=SNAP_ID,
            encryptions=(enc,),
        ),
        "ClerkingResult": clerking_result,
        "SnapshotStatus": proto.SnapshotStatus(
            id=SNAP_ID, number_of_clerking_results=7, result_ready=True
        ),
        "AggregationStatus": proto.AggregationStatus(
            aggregation=AGG_ID,
            number_of_participations=2,
            snapshots=(
                proto.SnapshotStatus(id=SNAP_ID, number_of_clerking_results=7, result_ready=True),
            ),
        ),
        "SnapshotResult": proto.SnapshotResult(
            snapshot=SNAP_ID,
            number_of_participations=2,
            clerk_encryptions=(clerking_result,),
            recipient_encryptions=(enc,),
        ),
        "AuthToken": proto.AuthToken(id=AGENT_ID, body="sekret-token"),
        "Pong": proto.Pong(running=True),
    }


_FROM_OBJ = {
    "SignedEncryptionKey": proto.signed_encryption_key_from_obj,
    "AggregationAdditiveFull": proto.Aggregation.from_obj,
}


@pytest.mark.parametrize("name", sorted(_instances()))
def test_wire_shape_is_frozen(name):
    obj = _instances()[name]
    path = GOLDEN / f"{name}.json"
    assert path.exists(), f"golden fixture missing: {path} (run python -m tests.test_wire_fixtures)"
    frozen = json.loads(path.read_text())
    assert obj.to_obj() == frozen, f"wire shape of {name} drifted from the frozen fixture"
    # and the frozen bytes parse back to an equal object
    from_obj = _FROM_OBJ.get(name, type(obj).from_obj)
    assert from_obj(frozen) == obj


def test_canonical_signing_bytes_are_frozen():
    """Signature payload = compact canonical JSON (helpers.rs:138-142)."""
    ekey = proto.Labelled(id=EKEY_ID, body=proto.EncryptionKey(bytes(range(32, 64))))
    got = proto.canonical(ekey)
    path = GOLDEN / "canonical_labelled_key.bin"
    assert path.exists(), f"golden fixture missing: {path}"
    assert got == path.read_bytes()


def _regenerate():
    GOLDEN.mkdir(parents=True, exist_ok=True)
    for name, obj in _instances().items():
        (GOLDEN / f"{name}.json").write_text(json.dumps(obj.to_obj(), indent=1) + "\n")
    ekey = proto.Labelled(id=EKEY_ID, body=proto.EncryptionKey(bytes(range(32, 64))))
    (GOLDEN / "canonical_labelled_key.bin").write_bytes(proto.canonical(ekey))
    print(f"wrote {len(_instances()) + 1} fixtures to {GOLDEN}")


if __name__ == "__main__":
    _regenerate()
