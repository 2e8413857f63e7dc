"""Wire fixtures lifted from (or hand-derived from) the REFERENCE's own
source — not from this package's encoders.

Two provenance classes, closing the r3 assurance gap that every prior
"bit-exact" pin traced back to builder-authored artifacts:

1. **Literal Rust-side expectations**: the base64 token strings embedded in
   /root/reference/protocol/src/byte_arrays.rs:107-149 are serde-test
   expectations the reference itself asserts. They pin the fixed-byte-array
   wire encoding (zero-padded base64 with ``=`` padding).

2. **Hand-derived JSON**: the `EXPECTED_*` strings below were written by
   reading ONLY the Rust declarations —
   resources.rs:44-67 (Aggregation field declaration order),
   crypto.rs:40-114/159-165 (enum variants; serde 0.9 external tagging:
   unit variants are bare strings, struct variants single-key objects with
   fields in declaration order), helpers.rs:100-107 (Signed field order),
   helpers.rs:146-151 (Labelled field order), helpers.rs:19-86 (ids are
   hyphenated UUID strings), helpers.rs:138-142 (canonical() is
   serde_json::to_vec, i.e. compact separators) — and typed out as literal
   strings, never generated from protocol.py. A systematic misreading of a
   serde convention in protocol.py cannot also be present here unless the
   same mistake was made twice in two different forms.
"""

import base64
import json

from sda_tpu import protocol as proto

# --------------------------------------------------------------------------
# 1. Literal serde-test vectors from byte_arrays.rs:107-149
# --------------------------------------------------------------------------

# byte_arrays.rs:109 / :121 — base64 of [0u8; 8]
B8_ZERO = "AAAAAAAAAAA="
# byte_arrays.rs:141 — base64 of [0u8; 32]
B32_ZERO = "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA="
# byte_arrays.rs:145 — base64 of [0u8; 64]
B64_ZERO = (
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAA=="
)


def test_rust_b8_vector():
    assert base64.b64encode(bytes(8)).decode() == B8_ZERO


def test_rust_b32_vector_pins_key_encoding():
    assert base64.b64encode(bytes(32)).decode() == B32_ZERO
    # the same encoding carries EncryptionKey::Sodium(B32) (crypto.rs:15-18)
    # and VerificationKey::Sodium(B32) (crypto.rs:36-39) on the wire
    assert proto.EncryptionKey(bytes(32)).to_obj() == {"Sodium": B32_ZERO}
    assert proto.VerificationKey(bytes(32)).to_obj() == {"Sodium": B32_ZERO}
    assert proto.EncryptionKey.from_obj({"Sodium": B32_ZERO}).data == bytes(32)


def test_rust_b64_vector_pins_signature_encoding():
    assert base64.b64encode(bytes(64)).decode() == B64_ZERO
    # Signature::Sodium(B64) (crypto.rs:22-25), SigningKey::Sodium(B64)
    # (crypto.rs:29-32)
    assert proto.Signature(bytes(64)).to_obj() == {"Sodium": B64_ZERO}
    assert proto.Signature.from_obj({"Sodium": B64_ZERO}).data == bytes(64)


# --------------------------------------------------------------------------
# 2. Hand-derived Aggregation JSON (resources.rs:44-67 + crypto.rs)
# --------------------------------------------------------------------------

AGG_ID = "11111111-2222-3333-4444-555555555555"
RCPT_ID = "66666666-7777-8888-9999-aaaaaaaaaaaa"
RKEY_ID = "bbbbbbbb-cccc-dddd-eeee-ffffffffffff"

# Derived field-by-field from resources.rs:44-67 in declaration order:
#   id, title, vector_dimension, modulus, recipient, recipient_key,
#   masking_scheme, committee_sharing_scheme, recipient_encryption_scheme,
#   committee_encryption_scheme
# with LinearMaskingScheme::ChaCha{modulus,dimension,seed_bitsize}
# (crypto.rs:57-61), LinearSecretSharingScheme::PackedShamir{secret_count,
# share_count,privacy_threshold,prime_modulus,omega_secrets,omega_shares}
# (crypto.rs:99-114) and AdditiveEncryptionScheme::Sodium as a bare-string
# unit variant (crypto.rs:161-163, serde 0.9 external tagging).
EXPECTED_AGG_CHACHA_PACKED = (
    '{"id":"' + AGG_ID + '",'
    '"title":"secret ballot",'
    '"vector_dimension":4,'
    '"modulus":433,'
    '"recipient":"' + RCPT_ID + '",'
    '"recipient_key":"' + RKEY_ID + '",'
    '"masking_scheme":{"ChaCha":{"modulus":433,"dimension":4,"seed_bitsize":128}},'
    '"committee_sharing_scheme":{"PackedShamir":{"secret_count":3,'
    '"share_count":8,"privacy_threshold":4,"prime_modulus":433,'
    '"omega_secrets":354,"omega_shares":150}},'
    '"recipient_encryption_scheme":"Sodium",'
    '"committee_encryption_scheme":"Sodium"}'
)

# LinearMaskingScheme::None is a unit variant -> bare string (crypto.rs:45,
# serde 0.9); Additive{share_count,modulus} (crypto.rs:82-87).
EXPECTED_AGG_NONE_ADDITIVE = (
    '{"id":"' + AGG_ID + '",'
    '"title":"secret ballot",'
    '"vector_dimension":10,'
    '"modulus":433,'
    '"recipient":"' + RCPT_ID + '",'
    '"recipient_key":"' + RKEY_ID + '",'
    '"masking_scheme":"None",'
    '"committee_sharing_scheme":{"Additive":{"share_count":3,"modulus":433}},'
    '"recipient_encryption_scheme":"Sodium",'
    '"committee_encryption_scheme":"Sodium"}'
)


def _agg(**overrides):
    base = dict(
        id=AGG_ID,
        title="secret ballot",
        vector_dimension=4,
        modulus=433,
        recipient=RCPT_ID,
        recipient_key=RKEY_ID,
        masking_scheme=proto.ChaChaMasking(modulus=433, dimension=4, seed_bitsize=128),
        committee_sharing_scheme=proto.PackedShamirSharing(
            secret_count=3,
            share_count=8,
            privacy_threshold=4,
            prime_modulus=433,
            omega_secrets=354,
            omega_shares=150,
        ),
    )
    base.update(overrides)
    return proto.Aggregation(**base)


def test_aggregation_canonical_matches_hand_derived_chacha_packed():
    agg = _agg()
    assert proto.canonical(agg).decode() == EXPECTED_AGG_CHACHA_PACKED


def test_aggregation_canonical_matches_hand_derived_none_additive():
    agg = _agg(
        vector_dimension=10,
        masking_scheme=proto.NoMasking(),
        committee_sharing_scheme=proto.AdditiveSharing(share_count=3, modulus=433),
    )
    assert proto.canonical(agg).decode() == EXPECTED_AGG_NONE_ADDITIVE


def test_aggregation_roundtrips_from_hand_derived_json():
    """The decoder accepts the hand-derived wire form (not just its own
    output) and reproduces the exact object."""
    obj = json.loads(EXPECTED_AGG_CHACHA_PACKED)
    agg = proto.Aggregation.from_obj(obj)
    assert agg == _agg()


# --------------------------------------------------------------------------
# 3. Hand-derived Signed<Labelled<_, EncryptionKey>> canonical bytes
# --------------------------------------------------------------------------

KEY_ID = "01234567-89ab-cdef-0123-456789abcdef"
SIGNER = "fedcba98-7654-3210-fedc-ba9876543210"

# Labelled{id, body} (helpers.rs:146-151); the body is an
# EncryptionKey::Sodium(B32) single-key object. This is the exact payload
# Ed25519-signed by SignExport (client/src/crypto/signing/mod.rs:72-103,
# sign_detached over Sign::canonical() = serde_json::to_vec,
# helpers.rs:138-142).
EXPECTED_LABELLED_KEY = (
    '{"id":"' + KEY_ID + '","body":{"Sodium":"' + B32_ZERO + '"}}'
)

# Signed{signature, signer, body} in declaration order (helpers.rs:100-107).
EXPECTED_SIGNED_KEY = (
    '{"signature":{"Sodium":"' + B64_ZERO + '"},'
    '"signer":"' + SIGNER + '",'
    '"body":' + EXPECTED_LABELLED_KEY + "}"
)


def test_labelled_key_canonical_matches_hand_derived():
    labelled = proto.Labelled(id=KEY_ID, body=proto.EncryptionKey(bytes(32)))
    assert proto.canonical(labelled).decode() == EXPECTED_LABELLED_KEY


def test_signed_key_canonical_matches_hand_derived():
    signed = proto.Signed(
        signature=proto.Signature(bytes(64)),
        signer=SIGNER,
        body=proto.Labelled(id=KEY_ID, body=proto.EncryptionKey(bytes(32))),
    )
    assert proto.canonical(signed).decode() == EXPECTED_SIGNED_KEY
