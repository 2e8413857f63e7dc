"""Sharing schemes: reference semantics, thresholds, linearity.

Covers the gap the reference left open: it had no unit tests for the crypto
schemes (SURVEY.md §4.1) — correctness was only exercised end-to-end.
"""

import numpy as np
import pytest

from sda_tpu.fields import PrimeField, positive
from sda_tpu.sharing import AdditiveScheme, PackedShamirScheme
from sda_tpu.utils.errors import Invalid

REF = dict(
    secret_count=3,
    share_count=8,
    privacy_threshold=4,
    prime_modulus=433,
    omega_secrets=354,
    omega_shares=150,
)


# ----------------------------------------------------------------- additive


def test_additive_share_reconstruct_roundtrip(rng):
    s = AdditiveScheme(share_count=3, modulus=433)
    secrets = np.array([1, 2, 3, 4])
    shares = s.share_vector(secrets, rng=rng)
    assert shares.shape == (3, 4)
    # all shares within (-m, m)
    assert (np.abs(shares) < 433).all()
    out = s.reconstruct([(i, shares[i]) for i in range(3)])
    assert positive(out, 433).tolist() == [1, 2, 3, 4]


def test_additive_linearity(rng):
    s = AdditiveScheme(share_count=3, modulus=433)
    a = np.array([1, 2, 3, 4])
    b = np.array([10, 20, 30, 40])
    sa = s.share_vector(a, rng=rng)
    sb = s.share_vector(b, rng=rng)
    combined = [(j, s.combine([sa[j], sb[j]])) for j in range(3)]
    out = s.reconstruct(combined)
    assert positive(out, 433).tolist() == [11, 22, 33, 44]


def test_additive_fold_semantics():
    # combiner.rs sequential fold: 5, 6, -3 mod 10 -> -2 (not 8)
    s = AdditiveScheme(share_count=3, modulus=10)
    acc = s.combine([np.array([5]), np.array([6]), np.array([-3])])
    assert acc.tolist() == [-2]
    assert positive(acc, 10).tolist() == [8]


# ------------------------------------------------------------ packed shamir


def test_packed_roundtrip_reference_params(rng):
    s = PackedShamirScheme(**REF)
    secrets = np.array([1, 2, 3, 4])  # full_loop 4-dim input
    shares = s.share_vector(secrets, rng=rng)
    assert shares.shape == (8, 2)  # ceil(4/3) = 2 batches
    out = s.reconstruct([(i, shares[i]) for i in range(8)], dimension=4)
    assert positive(out, 433).tolist() == [1, 2, 3, 4]


def test_packed_threshold_subsets(rng):
    s = PackedShamirScheme(**REF)
    secrets = np.array([7, 8, 9])
    shares = s.share_vector(secrets, rng=rng)
    # reconstruction threshold is t + k = 7 (crypto.rs:151)
    assert s.reconstruction_threshold == 7
    for subset in ([0, 1, 2, 3, 4, 5, 6], [1, 2, 3, 4, 5, 6, 7], [0, 2, 3, 4, 5, 6, 7]):
        out = s.reconstruct([(i, shares[i]) for i in subset], dimension=3)
        assert positive(out, 433).tolist() == [7, 8, 9]
    with pytest.raises(Invalid):
        s.reconstruct([(i, shares[i]) for i in range(6)], dimension=3)


def test_packed_linearity(rng):
    s = PackedShamirScheme(**REF)
    a = np.array([1, 2, 3, 4])
    b = np.array([1, 2, 3, 4])
    sa = s.share_vector(a, rng=rng)
    sb = s.share_vector(b, rng=rng)
    combined = [(j, s.combine([sa[j], sb[j]])) for j in range(8)]
    out = s.reconstruct(combined, dimension=4)
    assert positive(out, 433).tolist() == [2, 4, 6, 8]  # full_loop.rs:148 expectation


def test_packed_share_value_at_point_one_is_zero(rng):
    # the public point (1, 0): evaluating the sharing polynomial at 1 gives 0,
    # which is what makes t+k reconstruction work.
    s = PackedShamirScheme(**REF)
    f = PrimeField(433)
    secrets = f.sample((5, 3), rng=rng)
    shares = s.share_batch(secrets, rng=rng)
    # interpolate all n+1 points: [0(at point 1), shares...] then re-evaluate
    from sda_tpu.ntt import intt

    evals_full = np.concatenate([np.zeros((5, 1), dtype=np.int64), shares], axis=1)
    coeffs = intt(f, evals_full, s.omega_shares)
    # degree bound: coefficients beyond m-1 are zero
    assert np.array_equal(coeffs[:, s.m :], np.zeros((5, 9 - s.m), dtype=np.int64))


def test_packed_privacy_randomises_shares(rng):
    # same secrets, two sharings -> different shares (randomness present)
    s = PackedShamirScheme(**REF)
    secrets = np.array([[5, 5, 5]])
    sh1 = s.share_batch(secrets, rng=rng)
    sh2 = s.share_batch(secrets, rng=rng)
    assert not np.array_equal(sh1, sh2)


def test_packed_big_field_roundtrip(rng):
    from sda_tpu.fields import find_prime_field

    p, w2, w3 = find_prime_field(61, 8, 9)
    s = PackedShamirScheme(
        secret_count=3,
        share_count=8,
        privacy_threshold=4,
        prime_modulus=p,
        omega_secrets=w2,
        omega_shares=w3,
    )
    secrets = np.array([p - 1, 0, 12345], dtype=object)
    shares = s.share_vector(secrets, rng=rng)
    out = s.reconstruct([(i, shares[i]) for i in range(8)], dimension=3)
    assert [int(x) for x in positive(out, p)] == [p - 1, 0, 12345]


def test_packed_padding_truncation(rng):
    s = PackedShamirScheme(**REF)
    secrets = np.array([11, 22, 33, 44, 55])  # d=5, k=3 -> 2 batches, 1 pad
    shares = s.share_vector(secrets, rng=rng)
    assert shares.shape == (8, 2)
    out = s.reconstruct([(i, shares[i]) for i in range(8)], dimension=5)
    assert positive(out, 433).tolist() == [11, 22, 33, 44, 55]
