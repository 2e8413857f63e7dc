"""Protocol serde: JSON format parity and round trips.

Mirrors the reference's serde round-trip tests (byte_arrays.rs:101-151) and
pins the external-tagging conventions the Rust side produces.
"""

import json

import pytest

from sda_tpu import protocol as proto
from sda_tpu.utils.errors import Invalid


def test_binary_base64_roundtrip():
    b = proto.Binary(bytes(range(16)))
    assert proto.Binary.from_obj(b.to_obj()) == b
    assert b.to_obj() == "AAECAwQFBgcICQoLDA0ODw=="


def test_fixed_byte_arrays_enforce_size():
    proto.EncryptionKey(bytes(32))
    with pytest.raises(Invalid):
        proto.EncryptionKey(bytes(31))
    with pytest.raises(Invalid):
        proto.Signature(bytes(63))
    sig = proto.Signature(bytes(64))
    assert proto.Signature.from_obj(sig.to_obj()) == sig


def test_enum_external_tagging():
    # serde: unit variants are bare strings, struct variants single-key objects
    assert proto.masking_scheme_to_obj(proto.NoMasking()) == "None"
    assert proto.masking_scheme_to_obj(proto.FullMasking(433)) == {"Full": {"modulus": 433}}
    cha = proto.ChaChaMasking(433, 4, 128)
    assert proto.masking_scheme_to_obj(cha) == {
        "ChaCha": {"modulus": 433, "dimension": 4, "seed_bitsize": 128}
    }
    assert proto.masking_scheme_from_obj("None") == proto.NoMasking()
    assert proto.encryption_scheme_to_obj(proto.SodiumEncryptionScheme()) == "Sodium"
    enc = proto.Encryption(b"\x01\x02")
    assert enc.to_obj() == {"Sodium": "AQI="}


def test_aggregation_roundtrip_all_schemes():
    for sharing in [
        proto.AdditiveSharing(3, 433),
        proto.PackedShamirSharing(3, 8, 4, 433, 354, 150),
    ]:
        for masking in [proto.NoMasking(), proto.FullMasking(433), proto.ChaChaMasking(433, 4, 128)]:
            agg = proto.Aggregation(
                id=proto.new_id(),
                title="t",
                vector_dimension=4,
                modulus=433,
                recipient=proto.new_id(),
                recipient_key=proto.new_id(),
                masking_scheme=masking,
                committee_sharing_scheme=sharing,
            )
            assert proto.Aggregation.from_obj(json.loads(json.dumps(agg.to_obj()))) == agg


def test_participation_roundtrip_with_and_without_mask():
    for rec in [None, proto.Encryption(b"abc")]:
        p = proto.Participation(
            id=proto.new_id(),
            participant=proto.new_id(),
            aggregation=proto.new_id(),
            recipient_encryption=rec,
            clerk_encryptions=((proto.new_id(), proto.Encryption(b"x")),),
        )
        assert proto.Participation.from_obj(json.loads(json.dumps(p.to_obj()))) == p


def test_canonical_is_compact_declaration_order():
    lab = proto.Labelled(id="abc", body=proto.EncryptionKey(bytes(32)))
    got = proto.canonical(lab).decode()
    # field order = declaration order, compact separators (serde_json::to_vec)
    assert got == '{"id":"abc","body":{"Sodium":"' + "A" * 43 + '="}}'


def test_scheme_derived_properties():
    # crypto.rs:117-154 derived values
    add = proto.AdditiveSharing(share_count=3, modulus=433)
    assert (add.input_size, add.output_size) == (1, 3)
    assert (add.privacy_threshold, add.reconstruction_threshold) == (2, 3)
    ps = proto.PackedShamirSharing(3, 8, 4, 433, 354, 150)
    assert (ps.input_size, ps.output_size) == (3, 8)
    assert ps.reconstruction_threshold == 7  # t + k (crypto.rs:151)
    assert proto.NoMasking().has_mask is False
    assert proto.FullMasking(433).has_mask is True
    assert proto.ChaChaMasking(433, 4, 128).has_mask is True


def test_snapshot_result_roundtrip():
    r = proto.SnapshotResult(
        snapshot=proto.new_id(),
        number_of_participations=2,
        clerk_encryptions=(
            proto.ClerkingResult(job=proto.new_id(), clerk=proto.new_id(),
                                 encryption=proto.Encryption(b"z")),
        ),
        recipient_encryptions=None,
    )
    rt = proto.SnapshotResult.from_obj(json.loads(json.dumps(r.to_obj())))
    assert rt == r
