"""NTT correctness: round trips, Vandermonde equivalence, reference roots."""

import numpy as np
import pytest

from sda_tpu.fields import PrimeField
from sda_tpu.ntt import intt, intt_matrix, ntt, ntt_matrix


@pytest.mark.parametrize("n,order_root", [(8, 8), (9, 9), (16, 16), (27, 27), (24, 24)])
def test_roundtrip_mod_433_compatible_prime(n, order_root, rng):
    # pick a prime supporting the order
    from sda_tpu.fields import find_prime_field

    p, _, _ = find_prime_field(20, 16, 27)
    f = PrimeField(p)
    w = f.find_element_of_order(order_root)
    coeffs = f.sample((5, n), rng=rng)
    evals = ntt(f, coeffs, w)
    back = intt(f, evals, w)
    assert np.array_equal(back, coeffs)


def test_ntt_matches_vandermonde(rng):
    f = PrimeField(433)
    for n, w in [(8, 354), (9, 150)]:
        coeffs = f.sample((4, n), rng=rng)
        fast = ntt(f, coeffs, w)
        direct = f.matmul(coeffs, ntt_matrix(f, w, n))
        assert np.array_equal(fast, direct)
        back = f.matmul(fast, intt_matrix(f, w, n))
        assert np.array_equal(back, coeffs)


def test_ntt_evaluates_polynomial():
    f = PrimeField(433)
    w = 354  # order 8
    coeffs = np.array([3, 1, 4, 1, 5, 9, 2, 6])
    evals = ntt(f, coeffs, w)
    for j in range(8):
        x = pow(w, j, 433)
        expect = sum(int(c) * pow(x, i, 433) for i, c in enumerate(coeffs)) % 433
        assert int(evals[j]) == expect


def test_big_field_ntt(rng):
    from sda_tpu.fields import find_prime_field

    p, w2, w3 = find_prime_field(70, 8, 9)
    f = PrimeField(p)
    coeffs = f.sample((3, 8), rng=rng)
    assert np.array_equal(intt(f, ntt(f, coeffs, w2), w2), coeffs)
    coeffs9 = f.sample((3, 9), rng=rng)
    assert np.array_equal(intt(f, ntt(f, coeffs9, w3), w3), coeffs9)
