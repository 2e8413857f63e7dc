"""Overflow-safety at 63-bit production primes.

The reference's field element is i64 (/root/reference/client/src/crypto/mod.rs:33-36)
and its combines fold with Rust's signed ``%`` (combiner.rs:20-27, masking/full.rs:38-52,
masking/chacha.rs:56-77). With a production prime p = 2**63 - 871, two canonical
elements can sum past 2**63, so a naive int64 fold wraps negative. These tests pin
the overflow-safe folds (fields.trunc_add_mod / trunc_sub_mod) against a python-int
oracle at exactly that prime.
"""

import numpy as np
import pytest

from sda_tpu.fields import (
    PrimeField,
    find_special_prime_field,
    positive,
    trunc_add_mod,
    trunc_mod,
    trunc_sub_mod,
)
from sda_tpu.masking import ChaChaMasker, FullMasker
from sda_tpu.sharing import AdditiveScheme, PackedShamirScheme

P63 = (1 << 63) - 871  # production prime from find_special_prime_field(63, 8, 9)


def _oracle_trunc(v: int, m: int) -> int:
    r = abs(v) % m
    return r if v >= 0 else -r


@pytest.mark.parametrize("m", [433, (1 << 31) - 1, (1 << 62) + 57, P63])
def test_trunc_add_sub_mod_oracle(m):
    rng = np.random.default_rng(7)
    # cover all sign quadrants and magnitudes right up to +-(m-1)
    mags = rng.integers(0, min(m, 1 << 62), size=200, dtype=np.int64) % m
    edge = np.array([0, 1, m - 1, m // 2, m - 2][: min(5, m)], dtype=np.int64)
    vals = np.concatenate([mags, edge, -mags, -edge])
    a = vals
    b = np.roll(vals, 17)
    got_add = trunc_add_mod(a, b, m)
    got_sub = trunc_sub_mod(a, b, m)
    for i in range(len(vals)):
        assert int(got_add[i]) == _oracle_trunc(int(a[i]) + int(b[i]), m), (a[i], b[i])
        assert int(got_sub[i]) == _oracle_trunc(int(a[i]) - int(b[i]), m), (a[i], b[i])


def test_p63_is_the_production_prime():
    p, _, _ = find_special_prime_field(63, 8, 9)
    assert p == P63


def test_chacha_masker_63bit_prime():
    # ADVICE r3 repro: 4-seed combine at p = 2**63 - 871 produced 63/64 wrong
    # elements with the old int64 fold.
    d = 64
    m = ChaChaMasker(modulus=P63, dimension=d, seed_bitsize=128)
    secrets = [np.arange(d, dtype=np.int64) * (i + 1) for i in range(4)]
    seeds, maskeds = zip(*(m.mask(s) for s in secrets))
    combined_mask = m.combine(list(seeds))
    # oracle combine in exact python ints
    from sda_tpu.chacha import expand_masks

    word_lists = [[int(np.uint32(w)) for w in s] for s in seeds]
    rows = expand_masks(word_lists, d, P63)
    acc = [0] * d
    for row in rows:
        acc = [_oracle_trunc(a + int(r), P63) for a, r in zip(acc, row)]
    assert combined_mask.tolist() == acc
    # end-to-end: sum of masked minus combined mask == sum of secrets
    masked_sum = np.zeros(d, dtype=np.int64)
    for mk in maskeds:
        masked_sum = trunc_add_mod(masked_sum, mk, P63)
    out = positive(m.unmask((combined_mask, masked_sum)), P63)
    want = [(sum(int(s[j]) for s in secrets)) % P63 for j in range(d)]
    assert [int(x) for x in out] == want


def test_full_masker_63bit_prime():
    d = 32
    m = FullMasker(P63)
    secrets = [np.full(d, (P63 - 1) // 2, dtype=np.int64), np.arange(d, dtype=np.int64)]
    masks, maskeds = zip(*(m.mask(s) for s in secrets))
    assert all(np.asarray(k, dtype=np.int64).max() < P63 for k in masks)
    combined = m.combine(list(masks))
    masked_sum = trunc_add_mod(maskeds[0], maskeds[1], P63)
    out = positive(m.unmask((combined, masked_sum)), P63)
    want = [(int(secrets[0][j]) + int(secrets[1][j])) % P63 for j in range(d)]
    assert [int(x) for x in out] == want


def test_additive_combine_63bit_prime_matches_oracle():
    sch = AdditiveScheme(share_count=3, modulus=P63)
    rng = np.random.default_rng(11)
    vecs = [
        (rng.integers(0, 1 << 62, size=16, dtype=np.int64) % P63) for _ in range(5)
    ]
    got = sch.combine(vecs)
    acc = [0] * 16
    for v in vecs:
        acc = [_oracle_trunc(a + int(x), P63) for a, x in zip(acc, v)]
    assert got.tolist() == acc
    assert got.dtype == np.int64


def test_packed_combine_63bit_prime_matches_oracle():
    p, w2, w3 = find_special_prime_field(63, 8, 9)
    sch = PackedShamirScheme(
        secret_count=3,
        share_count=8,
        privacy_threshold=4,
        prime_modulus=p,
        omega_secrets=w2,
        omega_shares=w3,
    )
    rng = np.random.default_rng(13)
    vecs = [(rng.integers(0, 1 << 62, size=8, dtype=np.int64) % p) for _ in range(4)]
    got = sch.combine(vecs)
    acc = [0] * 8
    for v in vecs:
        acc = [_oracle_trunc(a + int(x), p) for a, x in zip(acc, v)]
    assert got.tolist() == acc


def test_full_masker_device_combine_parity():
    """FullMasker.combine past the bulk threshold (device limb accumulator,
    full.rs:38-52 at scale) is bit-identical to the host fold — masks are
    canonical [0, p), so no representative reconciliation is needed."""
    d, parts = 64, 10
    rng = np.random.default_rng(21)
    masks = [
        (rng.integers(0, 1 << 62, size=d, dtype=np.int64) % P63)
        for _ in range(parts)
    ]
    host = FullMasker(P63).combine(masks)
    dev = FullMasker(P63, device_bulk_threshold=1).combine(masks)
    assert dev.tolist() == host.tolist()
    # dimension mismatch raises identically on the device route
    import pytest as _pytest

    from sda_tpu.utils.errors import Invalid

    bad = masks[:3] + [masks[3][:-1]]
    with _pytest.raises(Invalid):
        FullMasker(P63, device_bulk_threshold=1).combine(bad)


def test_combine_fold_hostile_out_of_domain_values():
    """Wire shares outside (-p, p) — any i64 a hostile participant encodes —
    still combine congruently (code-review r4 finding: the int64 fast fold
    required in-domain inputs)."""
    p = 433
    sch = AdditiveScheme(share_count=3, modulus=p)
    vecs = [np.array([1 << 62], dtype=np.int64) for _ in range(3)]
    got = int(sch.combine(vecs)[0])
    assert got % p == (3 * (1 << 62)) % p
    # and at the 63-bit prime
    sch2 = AdditiveScheme(share_count=2, modulus=P63)
    vecs2 = [np.array([(1 << 63) - 5], dtype=np.int64), np.array([7], dtype=np.int64)]
    got2 = int(sch2.combine(vecs2)[0])
    assert got2 % P63 == (((1 << 63) - 5) + 7) % P63


def test_full_masker_hostile_out_of_domain_masks():
    m = FullMasker(433)
    out = m.combine([np.array([1 << 62], dtype=np.int64)] * 2)
    assert int(out[0]) % 433 == (2 * (1 << 62)) % 433
