"""Host crypto: sealed boxes, signatures, maskers, ChaCha bit-exactness."""

import numpy as np
import pytest

from sda_tpu import sodium
from sda_tpu.chacha import ChaChaRng, expand_masks, new_seed
from sda_tpu.client.crypto import CryptoModule, Keystore
from sda_tpu.client.store import MemoryStore
from sda_tpu.fields import positive, trunc_mod
from sda_tpu.masking import ChaChaMasker, FullMasker, NoneMasker
from sda_tpu.utils.errors import Invalid


# ------------------------------------------------------------------ sodium


def test_sealed_box_roundtrip_and_tamper():
    pk, sk = sodium.box_keypair()
    msg = b"attack at dawn" * 10
    boxed = sodium.seal(msg, pk)
    assert sodium.seal_open(boxed, pk, sk) == msg
    tampered = bytearray(boxed)
    tampered[-1] ^= 1
    with pytest.raises(Invalid):
        sodium.seal_open(bytes(tampered), pk, sk)
    with pytest.raises(Invalid):
        sodium.seal_open(boxed[: sodium.SEALBYTES - 1], pk, sk)


def test_sealed_box_anonymous_sender():
    # two seals of the same message differ (ephemeral sender keys)
    pk, sk = sodium.box_keypair()
    assert sodium.seal(b"m", pk) != sodium.seal(b"m", pk)


def test_sign_verify_detached():
    vk, sk = sodium.sign_keypair()
    sig = sodium.sign_detached(b"payload", sk)
    assert sodium.verify_detached(sig, b"payload", vk)
    assert not sodium.verify_detached(sig, b"payloae", vk)
    other_vk, _ = sodium.sign_keypair()
    assert not sodium.verify_detached(sig, b"payload", other_vk)
    assert not sodium.verify_detached(b"short", b"payload", vk)


def test_crypto_module_sign_export_verifies():
    ks = Keystore(MemoryStore())
    cm = CryptoModule(ks)
    from sda_tpu.client import new_agent

    agent = new_agent(ks)
    key_id = cm.new_encryption_key()
    signed = cm.sign_export(agent, key_id)
    assert signed is not None
    assert cm.signature_is_valid(agent, signed)
    # claimed-signer mismatch raises (signing/mod.rs:111-113)
    other = new_agent(Keystore(MemoryStore()))
    with pytest.raises(Invalid):
        cm.signature_is_valid(other, signed)


# ------------------------------------------------------------------ chacha


def test_chacha_zero_seed_known_vector():
    """rand 0.3's ChaChaRng with an all-zero key is standard ChaCha20
    (key=0, counter=0, nonce=0): the RFC/djb first-block keystream."""
    rng = ChaChaRng([0] * 8)
    first_four = [rng.next_u32() for _ in range(4)]
    # djb test vector, first 16 bytes as LE u32s: ade0b876 903df1a0 e56a5d40 28bd8653
    assert first_four == [0xADE0B876, 0x903DF1A0, 0xE56A5D40, 0x28BD8653]


def test_chacha_counter_carry():
    rng = ChaChaRng([1, 2, 3, 4])
    # drain two blocks; stream must not repeat (counter increments)
    b1 = [rng.next_u32() for _ in range(16)]
    b2 = [rng.next_u32() for _ in range(16)]
    assert b1 != b2


def test_expand_masks_matches_scalar_rng():
    seeds = [new_seed(128) for _ in range(5)]
    batch = expand_masks(seeds, dimension=33, modulus=433)
    for i, words in enumerate(seeds):
        rng = ChaChaRng(words)
        scalar = [rng.gen_range_i64(0, 433) for _ in range(33)]
        assert batch[i].tolist() == scalar


def test_native_expand_matches_numpy():
    """C++ expansion (native/chacha.cpp) is bit-exact vs the numpy path."""
    import sda_tpu.chacha as cc

    if cc._NATIVE_EXPAND is None:
        pytest.skip("libsda_native.so not built")
    seeds = [new_seed(128) for _ in range(4)]
    for m in (433, 12345, (1 << 61) - 1):
        nat = expand_masks(seeds, dimension=40, modulus=m)
        saved, cc._NATIVE_EXPAND = cc._NATIVE_EXPAND, None
        try:
            ref = expand_masks(seeds, dimension=40, modulus=m)
        finally:
            cc._NATIVE_EXPAND = saved
        assert nat.tolist() == ref.tolist()


def test_gen_range_zone_semantics():
    # identical seeds -> identical draws across instances
    a, b = ChaChaRng([7] * 4), ChaChaRng([7] * 4)
    assert [a.gen_range_i64(0, 10**12) for _ in range(8)] == [
        b.gen_range_i64(0, 10**12) for _ in range(8)
    ]


# ----------------------------------------------------------------- masking


def test_none_masker():
    m = NoneMasker()
    mask, masked = m.mask(np.array([1, 2, 3]))
    assert len(mask) == 0 and masked.tolist() == [1, 2, 3]
    assert m.combine([[], []]).tolist() == []
    assert m.unmask((np.zeros(0, np.int64), masked)).tolist() == [1, 2, 3]
    with pytest.raises(Invalid):
        m.combine([[1]])


def test_full_masker_roundtrip():
    m = FullMasker(433)
    secrets = np.array([0, 1, 432, 100])
    mask, masked = m.mask(secrets)
    assert (np.abs(masked) < 433).all()
    out = m.unmask((mask, masked))
    assert positive(out, 433).tolist() == [0, 1, 432, 100]


def test_full_masker_aggregation_property():
    # sum of masked minus sum of masks == sum of secrets (mod m)
    m = FullMasker(433)
    s1, s2 = np.array([1, 2, 3, 4]), np.array([10, 20, 30, 40])
    k1, m1 = m.mask(s1)
    k2, m2 = m.mask(s2)
    masked_sum = trunc_mod(m1.astype(np.int64) + m2, 433)
    combined_mask = m.combine([k1, k2])
    out = m.unmask((combined_mask, masked_sum))
    assert positive(out, 433).tolist() == [11, 22, 33, 44]


def test_chacha_masker_uploads_seed_not_mask():
    m = ChaChaMasker(modulus=433, dimension=50, seed_bitsize=128)
    seed, masked = m.mask(np.arange(50))
    assert len(seed) == 4  # 128 bits as u32 words, not 50 mask elements
    combined = m.combine([seed])
    out = m.unmask((combined, masked))
    assert positive(out, 433).tolist() == list(range(50))
    with pytest.raises(Invalid):
        m.mask(np.arange(49))


def test_decrypt_many_matches_sequential_and_raises_on_tamper():
    """Bulk decryption (native batch / thread pool) == the sequential path,
    and a tampered box surfaces Invalid exactly like decrypt() does
    (clerk.rs:78-82 semantics at bulk scale)."""
    from sda_tpu import sodium
    from sda_tpu import protocol as proto
    from sda_tpu.client.crypto import ShareDecryptor
    from sda_tpu.utils.varint import encode_varints

    ek, dk = sodium.box_keypair()
    rng = np.random.default_rng(7)
    vecs = [
        rng.integers(-(1 << 62), 1 << 62, size=n, dtype=np.int64)
        for n in (5, 33, 1, 129, 64, 7, 12, 90, 2, 40)
    ]
    encs = [proto.Encryption(data=sodium.seal(encode_varints(v), ek)) for v in vecs]
    d = ShareDecryptor(ek, dk)
    got = d.decrypt_many(encs)
    assert len(got) == len(vecs)
    for g, v in zip(got, vecs):
        assert np.array_equal(np.asarray(g), v)
    # tampering any box must raise, not silently combine garbage
    evil = list(encs)
    data = evil[4].data
    evil[4] = proto.Encryption(data=data[:-1] + bytes([data[-1] ^ 1]))
    with pytest.raises(Invalid):
        d.decrypt_many(evil)


def test_open_combine_fused_matches_sequential_fold():
    """Fused native open+combine (native/sealed_batch.cpp) is congruent to
    the sequential decrypt-then-signed-fold (clerk.rs:78-86) — canonical
    [0, p) representatives, same convention as engine.device_combine."""
    from sda_tpu import sodium
    from sda_tpu import protocol as proto
    from sda_tpu.client.crypto import ShareDecryptor
    from sda_tpu.fields import positive
    from sda_tpu.sharing import AdditiveScheme
    from sda_tpu.utils.varint import encode_varints

    p = (1 << 63) - 871  # overflow territory for a naive fold
    ek, dk = sodium.box_keypair()
    rng = np.random.default_rng(3)
    d = 47
    vecs = [
        (rng.integers(0, 1 << 62, size=d, dtype=np.int64) % p) for _ in range(25)
    ]
    # mix in trunc-domain negatives like real wire shares
    vecs[3] = -vecs[3]
    encs = [proto.Encryption(data=sodium.seal(encode_varints(v), ek)) for v in vecs]
    dec = ShareDecryptor(ek, dk)
    got = dec.open_combine(encs, p, d)
    if got is None:
        pytest.skip("native library unavailable")
    want = positive(AdditiveScheme(share_count=3, modulus=p).combine(vecs), p)
    assert got.tolist() == [int(x) for x in want]
    assert (got >= 0).all() and (got < p).all()


def test_open_combine_empty_job_returns_dim_zeros():
    """An empty encryption list is the additive identity at the declared
    dimension — not a zero-length vector (advisor r4: direct users got a
    silently wrong-shaped result)."""
    from sda_tpu import sodium
    from sda_tpu.client.crypto import ShareDecryptor

    ek, dk = sodium.box_keypair()
    got = ShareDecryptor(ek, dk).open_combine([], 10_007, 9)
    if got is None:
        pytest.skip("native library unavailable")
    assert got.shape == (9,) and got.dtype == np.int64
    assert not got.any()


def test_open_combine_error_parity():
    from sda_tpu import sodium
    from sda_tpu import protocol as proto
    from sda_tpu.client.crypto import ShareDecryptor
    from sda_tpu.utils.varint import encode_varints

    p = 10_007
    ek, dk = sodium.box_keypair()
    vecs = [np.arange(8, dtype=np.int64) for _ in range(6)]
    encs = [proto.Encryption(data=sodium.seal(encode_varints(v), ek)) for v in vecs]
    dec = ShareDecryptor(ek, dk)
    if dec.open_combine(encs, p, 8) is None:
        pytest.skip("native library unavailable")
    # tampered box -> Invalid, same message as the sequential seal_open path
    evil = list(encs)
    evil[2] = proto.Encryption(data=encs[2].data[:-1] + bytes([encs[2].data[-1] ^ 1]))
    with pytest.raises(Invalid, match="seal_open failure"):
        dec.open_combine(evil, p, 8)
    # malformed varint stream -> ValueError like decode_varints
    trunc = list(encs)
    trunc[1] = proto.Encryption(data=sodium.seal(b"\x80\x80", ek))
    with pytest.raises(ValueError, match="malformed varint"):
        dec.open_combine(trunc, p, 8)
    # wrong per-clerk share count -> Invalid like the combine dimension check
    short = list(encs)
    short[4] = proto.Encryption(
        data=sodium.seal(encode_varints(np.arange(5, dtype=np.int64)), ek)
    )
    with pytest.raises(Invalid, match="dimension|Wrong"):
        dec.open_combine(short, p, 8)


def test_decrypt_many_error_parity_malformed_varint():
    """A well-sealed box holding a malformed varint stream raises ValueError
    from the native batch exactly like the sequential decode_varints."""
    from sda_tpu import sodium
    from sda_tpu import protocol as proto
    from sda_tpu.client.crypto import ShareDecryptor
    from sda_tpu.utils.varint import encode_varints

    ek, dk = sodium.box_keypair()
    vecs = [np.arange(4, dtype=np.int64) for _ in range(9)]
    encs = [proto.Encryption(data=sodium.seal(encode_varints(v), ek)) for v in vecs]
    encs[5] = proto.Encryption(data=sodium.seal(b"\xff\xff\xff", ek))  # truncated
    dec = ShareDecryptor(ek, dk)
    with pytest.raises(ValueError, match="malformed varint"):
        dec.decrypt_many(encs)


def test_open_combine_long_stream_is_dimension_error():
    """A WELL-FORMED stream of more than dim values is the protocol's
    dimension error, not the codec's ValueError (the sequential combine
    would raise Invalid('Wrong dimension') for the same job)."""
    from sda_tpu import sodium
    from sda_tpu import protocol as proto
    from sda_tpu.client.crypto import ShareDecryptor
    from sda_tpu.utils.varint import encode_varints

    ek, dk = sodium.box_keypair()
    encs = [
        proto.Encryption(data=sodium.seal(encode_varints(np.arange(8, dtype=np.int64)), ek))
        for _ in range(5)
    ]
    dec = ShareDecryptor(ek, dk)
    if dec.open_combine(encs, 10_007, 8) is None:
        pytest.skip("native library unavailable")
    # dim+3 well-formed values: overflows the bounded decode, but the
    # count-only rescan classifies it as a length problem
    evil = list(encs)
    evil[3] = proto.Encryption(
        data=sodium.seal(encode_varints(np.arange(11, dtype=np.int64)), ek)
    )
    with pytest.raises(Invalid, match="dimension|Wrong"):
        dec.open_combine(evil, 10_007, 8)


def test_chacha_core_matches_public_djb_vectors():
    """EXTERNAL ground truth for the ChaCha core: the first two keystream
    blocks for the all-zero 256-bit key with zero counter, as published in
    D. J. Bernstein's ChaCha specification test vectors (and reproduced in
    countless test suites, e.g. the TLS ecosystem's zero-key cases).

    rand 0.3's ChaChaRng is DJB ChaCha20 with the 128-bit block counter in
    state words 12..15 (equivalent to 64-bit-counter + zero nonce for the
    first 2^64 blocks), keystream read as little-endian u32 words — so a
    byte-exact match here pins the whole core against a vector nobody in
    this repo authored."""
    from sda_tpu.chacha import ChaChaRng

    r = ChaChaRng([0] * 8)
    words = [r.next_u32() for _ in range(32)]
    stream = b"".join(int(w).to_bytes(4, "little") for w in words)
    assert stream[:64].hex() == (
        "76b8e0ada0f13d90405d6ae55386bd28bdd219b8a08ded1aa836efcc8b770dc7"
        "da41597c5157488d7724e03fb8d84a376a43b8f41518a11cc387b669b2ee6586"
    )
    assert stream[64:128].hex() == (
        "9f07e7be5551387a98ba977c732d080dcb0f29a048e3656912c6533e32ee7aed"
        "29b721769ce64e43d57133b074d839d531ed1f28510afb45ace10a1f4b794d6f"
    )
