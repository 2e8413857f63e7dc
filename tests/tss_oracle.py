"""Independent oracle for the tss v0.2 packed secret-sharing algorithm.

The reference delegates its packed-Shamir math to the external
``threshold-secret-sharing`` crate v0.2
(/root/reference/client/src/crypto/sharing/packed_shamir.rs:40-44, 73-77).
That crate's algorithm, re-derived here from its published description (and
NOT from sda_tpu's matrix formulation):

``share(secrets, randomness)``
    Fix the point ``(omega_shares^0 = 1, 0)`` implicitly by placing the value
    0 at position 0 of the secrets-domain evaluation list, the ``k`` secrets
    at positions 1..k (points ``omega_secrets^1..omega_secrets^k``) and the
    ``t`` random values after them. Interpolate the unique polynomial of
    degree < ``t+k+1`` through those ``t+k+1`` points, then evaluate it at
    the share points ``omega_shares^1 .. omega_shares^n`` (the evaluation at
    ``omega_shares^0 = 1`` is the public zero and is discarded —
    ``shares.remove(0)`` in the crate).

``reconstruct(indices, shares)``
    Interpolate through ``(1, 0)`` plus ``(omega_shares^(i+1), share_i)`` for
    each provided index, then evaluate at ``omega_secrets^1..omega_secrets^k``.

This oracle is deliberately NTT-free: plain Lagrange evaluation over python
ints, sharing no code with :mod:`sda_tpu.ntt` / :mod:`sda_tpu.sharing`. Any
agreement between the two is therefore evidence of algorithmic parity with
the crate, not of shared bugs.
"""

from __future__ import annotations


def _lagrange_eval(xs: list[int], ys: list[int], y: int, p: int) -> int:
    """Evaluate the interpolating polynomial of (xs, ys) at point y mod p."""
    acc = 0
    for i, xi in enumerate(xs):
        num, den = 1, 1
        for j, xj in enumerate(xs):
            if i == j:
                continue
            num = num * ((y - xj) % p) % p
            den = den * ((xi - xj) % p) % p
        acc = (acc + ys[i] * num % p * pow(den, -1, p)) % p
    return acc


def oracle_share(
    secrets: list[int],
    randomness: list[int],
    *,
    secret_count: int,
    share_count: int,
    threshold: int,
    prime: int,
    omega_secrets: int,
    omega_shares: int,
) -> list[int]:
    """tss ``PackedSecretSharing::share`` with injected randomness."""
    assert len(secrets) == secret_count
    assert len(randomness) == threshold
    m = threshold + secret_count + 1
    xs = [pow(omega_secrets, i, prime) for i in range(m)]
    ys = [0] + [s % prime for s in secrets] + [r % prime for r in randomness]
    return [
        _lagrange_eval(xs, ys, pow(omega_shares, j + 1, prime), prime)
        for j in range(share_count)
    ]


def oracle_reconstruct(
    indices: list[int],
    shares: list[int],
    *,
    secret_count: int,
    threshold: int,
    prime: int,
    omega_secrets: int,
    omega_shares: int,
    share_count: int | None = None,  # accepted for param-dict symmetry
) -> list[int]:
    """tss ``PackedSecretSharing::reconstruct`` (>= reconstruct_limit shares)."""
    assert len(indices) == len(shares)
    assert len(indices) >= threshold + secret_count, "below reconstruct_limit"
    xs = [1] + [pow(omega_shares, i + 1, prime) for i in indices]
    ys = [0] + [s % prime for s in shares]
    return [
        _lagrange_eval(xs, ys, pow(omega_secrets, e, prime), prime)
        for e in range(1, secret_count + 1)
    ]
