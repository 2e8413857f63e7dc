"""Cross-implementation parity with the tss v0.2 packed-Shamir algorithm.

The reference's share math is pinned to the external
``threshold-secret-sharing`` crate (packed_shamir.rs:40-44, 73-77). These
tests assert point-for-point share equality between
:class:`sda_tpu.sharing.PackedShamirScheme` (matrix/NTT formulation) and the
independent Lagrange oracle in :mod:`tests.tss_oracle`, with identical
injected randomness — at the repo's verified p=433 vector
(/root/reference/integration-tests/tests/full_loop.rs:57-64) and at a
64-bit prime. A Rust clerk and a Python participant interoperate iff these
agree.
"""

import numpy as np
import pytest

from sda_tpu.fields import PrimeField, find_prime_field
from sda_tpu.sharing import PackedShamirScheme

from tests.tss_oracle import oracle_reconstruct, oracle_share

P433 = dict(
    secret_count=3, share_count=8, privacy_threshold=4,
    prime_modulus=433, omega_secrets=354, omega_shares=150,
)


def _rand_elems(rng, p, count):
    """Uniform python ints in [0, p) for arbitrarily large p."""
    bits = p.bit_length() + 64
    nbytes = (bits + 7) // 8
    return [int.from_bytes(rng.bytes(nbytes), "little") % p for _ in range(count)]


def _scheme_share_with_randomness(scheme, secrets, randomness):
    """shares = [0 | secrets | randomness] @ share_matrix (what share_batch does)."""
    f = scheme.field
    ext = np.concatenate(
        [np.zeros(1, dtype=f.dtype), f.canon(secrets), f.canon(randomness)]
    )[None, :]
    return [int(x) for x in f.matmul(ext, scheme.share_matrix)[0]]


def _oracle_params(scheme):
    return dict(
        secret_count=scheme.secret_count,
        share_count=scheme.share_count,
        threshold=scheme.privacy_threshold,
        prime=scheme.prime_modulus,
        omega_secrets=scheme.omega_secrets,
        omega_shares=scheme.omega_shares,
    )


def _configs():
    yield PackedShamirScheme(**P433)
    # a 64-bit prime with the same radix structure (2^3 | and 3^2 | p-1)
    p, w2, w3 = find_prime_field(64, 8, 9)
    assert p.bit_length() >= 64
    yield PackedShamirScheme(
        secret_count=3, share_count=8, privacy_threshold=4,
        prime_modulus=p, omega_secrets=w2, omega_shares=w3,
    )


@pytest.mark.parametrize("scheme", _configs(), ids=["p433", "p64bit"])
def test_share_values_match_oracle_point_for_point(scheme):
    rng = np.random.default_rng(7)
    op = _oracle_params(scheme)
    for _ in range(8):
        secrets = _rand_elems(rng, scheme.prime_modulus, scheme.secret_count)
        randomness = _rand_elems(rng, scheme.prime_modulus, scheme.privacy_threshold)
        ours = _scheme_share_with_randomness(scheme, secrets, randomness)
        theirs = oracle_share(secrets, randomness, **op)
        assert ours == theirs


@pytest.mark.parametrize("scheme", _configs(), ids=["p433", "p64bit"])
def test_oracle_reconstructs_our_shares_and_vice_versa(scheme):
    rng = np.random.default_rng(11)
    op = _oracle_params(scheme)
    k, t, n = scheme.secret_count, scheme.privacy_threshold, scheme.share_count
    secrets = _rand_elems(rng, scheme.prime_modulus, k)
    randomness = _rand_elems(rng, scheme.prime_modulus, t)

    # our shares -> oracle reconstruct (all shares, and a minimal subset)
    ours = _scheme_share_with_randomness(scheme, secrets, randomness)
    assert oracle_reconstruct(list(range(n)), ours, **op) == secrets
    subset = list(range(n - (t + k), n))  # any t+k of n suffice
    assert oracle_reconstruct(subset, [ours[i] for i in subset], **op) == secrets

    # oracle shares -> our reconstruct (full fast path + Lagrange subset path)
    theirs = oracle_share(secrets, randomness, **op)
    batches = np.array(theirs, dtype=object).reshape(n, 1)
    full = scheme.reconstruct([(i, batches[i]) for i in range(n)], dimension=k)
    assert [int(x) for x in full] == secrets
    sub = scheme.reconstruct([(i, batches[i]) for i in subset], dimension=k)
    assert [int(x) for x in sub] == secrets


def test_reconstruct_limit_enforced_like_tss():
    scheme = PackedShamirScheme(**P433)
    op = _oracle_params(scheme)
    with pytest.raises(AssertionError):
        oracle_reconstruct([0, 1, 2], [1, 2, 3], **op)
    assert scheme.reconstruction_threshold == 7  # t + k (crypto.rs:151)


def test_every_threshold_subset_reveals_identically():
    """Sweep EVERY (t+k)-subset of the 8 shares at the reference's p=433
    vector (full_loop.rs:57-64): all C(8,7)=8 threshold subsets (and the
    full set) must reconstruct the same aggregate through BOTH our Lagrange
    subset path and the independent oracle — bounding the secrets-at-
    omega^1..k point-convention risk (docs/PROTOCOL.md §interop note): if
    the convention were wrong, subsets could not all agree with the sum."""
    from itertools import combinations

    scheme = PackedShamirScheme(**P433)
    op = _oracle_params(scheme)
    rng = np.random.default_rng(13)
    p = scheme.prime_modulus
    k, t, n = scheme.secret_count, scheme.privacy_threshold, scheme.share_count
    # aggregate of several participants' sharings (the protocol's case)
    parts = [( _rand_elems(rng, p, k), _rand_elems(rng, p, t)) for _ in range(4)]
    sharings = [oracle_share(s, r, **op) for s, r in parts]
    combined = [sum(sh[i] for sh in sharings) % p for i in range(n)]
    want = [sum(s[j] for s, _ in parts) % p for j in range(k)]
    batches = np.array(combined, dtype=object).reshape(n, 1)
    subsets = list(combinations(range(n), t + k)) + [tuple(range(n))]
    assert len(subsets) == 9
    for subset in subsets:
        got = scheme.reconstruct([(i, batches[i]) for i in subset], dimension=k)
        assert [int(x) for x in got] == want, f"subset {subset} diverges"
        assert oracle_reconstruct(
            list(subset), [combined[i] for i in subset], **op
        ) == want, f"oracle subset {subset} diverges"


def test_linearity_matches_aggregated_reveal():
    """Sum of two sharings reconstructs to the sum — the property clerks use."""
    scheme = PackedShamirScheme(**P433)
    op = _oracle_params(scheme)
    rng = np.random.default_rng(3)
    p = scheme.prime_modulus
    s1 = _rand_elems(rng, p, 3)
    s2 = _rand_elems(rng, p, 3)
    r1 = _rand_elems(rng, p, 4)
    r2 = _rand_elems(rng, p, 4)
    sh1 = oracle_share(s1, r1, **op)
    sh2 = oracle_share(s2, r2, **op)
    combined = [(a + b) % p for a, b in zip(sh1, sh2)]
    want = [(a + b) % p for a, b in zip(s1, s2)]
    assert oracle_reconstruct(list(range(8)), combined, **op) == want
