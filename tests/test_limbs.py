"""Limb Montgomery arithmetic vs exact python-int golden results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sda_tpu.ops.limbs import LimbContext, from_limbs, limbs_for_modulus, to_limbs
from sda_tpu.ops.modmat import modmat, uniform_limbs

MODULI = [
    433,  # reference test-vector field (L=2)
    (1 << 31) - 1,  # Mersenne 31 (L=2)
    2305843009213694257,  # 62-bit software-found prime (L=4)
    (1 << 89) - 1,  # 89-bit Mersenne (L=8)
    0x1000000000000000000000000000DC99D * 0 + (1 << 127) - 1,  # 127-bit Mersenne (L=8)
]


@pytest.mark.parametrize("p", MODULI)
def test_roundtrip_and_ops(p, rng):
    ctx = LimbContext.create(p)
    vals_a = [int(rng.integers(0, min(p, 2**62))) % p for _ in range(64)]
    vals_b = [int(rng.integers(0, min(p, 2**62))) % p for _ in range(64)]
    if p > 2**62:  # exercise high limbs too
        vals_a = [(v * 0x9E3779B97F4A7C15 + 7) % p for v in vals_a]
        vals_b = [(v * 0xC2B2AE3D27D4EB4F + 11) % p for v in vals_b]
    a = jnp.asarray(to_limbs(np.array(vals_a, dtype=object), ctx.L))
    b = jnp.asarray(to_limbs(np.array(vals_b, dtype=object), ctx.L))
    # round trip
    assert [int(x) for x in from_limbs(np.asarray(a))] == vals_a
    # add / sub
    got_add = [int(x) for x in from_limbs(np.asarray(ctx.add_mod(a, b)))]
    assert got_add == [(x + y) % p for x, y in zip(vals_a, vals_b)]
    got_sub = [int(x) for x in from_limbs(np.asarray(ctx.sub_mod(a, b)))]
    assert got_sub == [(x - y) % p for x, y in zip(vals_a, vals_b)]
    # montgomery multiply: mont_mul(a, b~) == a*b mod p
    b_mont = jnp.asarray(ctx.encode_mont(np.array(vals_b, dtype=object)))
    got_mul = [int(x) for x in from_limbs(np.asarray(ctx.mont_mul(a, b_mont)))]
    assert got_mul == [(x * y) % p for x, y in zip(vals_a, vals_b)]
    # to/from mont round trip
    back = ctx.from_mont(ctx.to_mont(a))
    assert [int(x) for x in from_limbs(np.asarray(back))] == vals_a


@pytest.mark.parametrize("p", [433, 2305843009213694257])
def test_sum_mod(p, rng):
    ctx = LimbContext.create(p)
    vals = [[int(rng.integers(0, p if p < 2**62 else 2**62)) % p for _ in range(7)] for _ in range(33)]
    arr = jnp.asarray(to_limbs(np.array(vals, dtype=object), ctx.L))
    got = from_limbs(np.asarray(ctx.sum_mod(arr, axis=0)))
    expect = [sum(row[j] for row in vals) % p for j in range(7)]
    assert [int(x) for x in got] == expect


@pytest.mark.parametrize("p", [433, (1 << 61) - 1])
def test_modmat_matches_host(p, rng):
    ctx = LimbContext.create(p)
    B, m, n = 17, 5, 4
    a_vals = np.array([[int(rng.integers(0, 2**61)) % p for _ in range(m)] for _ in range(B)], dtype=object)
    m_vals = np.array([[int(rng.integers(0, 2**61)) % p for _ in range(n)] for _ in range(m)], dtype=object)
    a = jnp.asarray(ctx.encode(a_vals))
    mm = jnp.asarray(ctx.encode_mont(m_vals))
    got = from_limbs(np.asarray(modmat(ctx, a, mm)))
    expect = [[sum(int(a_vals[i][j]) * int(m_vals[j][l]) for j in range(m)) % p for l in range(n)] for i in range(B)]
    assert [[int(x) for x in row] for row in got] == expect


def test_uniform_limbs_range():
    p = 2305843009213694257
    ctx = LimbContext.create(p)
    out = uniform_limbs(ctx, jax.random.key(0), (1000,))
    vals = [int(x) for x in from_limbs(np.asarray(out))]
    assert all(0 <= v < p for v in vals)
    # rough uniformity: mean within 5% of p/2
    assert abs(sum(vals) / len(vals) - p / 2) < 0.05 * p


def test_limbs_for_modulus():
    assert limbs_for_modulus(433) == 2
    assert limbs_for_modulus((1 << 31) - 1) == 2
    assert limbs_for_modulus((1 << 32) + 15) == 4
    assert limbs_for_modulus((1 << 63) - 25) == 4
    assert limbs_for_modulus((1 << 127) - 1) == 8
    with pytest.raises(ValueError):
        limbs_for_modulus(1 << 130)
