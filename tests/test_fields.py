"""Field arithmetic: Rust remainder semantics, big-modulus paths, roots."""

import numpy as np

from sda_tpu.fields import PrimeField, element_order, find_prime_field, positive, trunc_mod


def test_trunc_mod_matches_rust_semantics():
    # Rust: -7 % 3 == -1 ; 7 % -3 == 1 ; 7 % 3 == 1
    assert trunc_mod(-7, 3) == -1
    assert trunc_mod(7, 3) == 1
    assert trunc_mod(-433, 433) == 0
    out = trunc_mod(np.array([-7, 7, -1, 0, 432, -432]), 433)
    assert out.tolist() == [-7, 7, -1, 0, 432, -432]
    out = trunc_mod(np.array([-440, 440]), 433)
    assert out.tolist() == [-7, 7]


def test_positive_normalizer():
    # receive.rs:14-20: add modulus to negatives only
    assert positive(-1, 433) == 432
    assert positive(5, 433) == 5
    assert positive(np.array([-2, 0, 4]), 433).tolist() == [431, 0, 4]


def test_small_field_ops():
    f = PrimeField(433)
    a = np.array([0, 1, 432, 200])
    b = np.array([432, 432, 432, 300])
    assert f.add(a, b).tolist() == [432, 0, 431, 67]
    assert f.sub(a, b).tolist() == [1, 2, 0, 333]
    assert f.mul(a, b).tolist() == [0, 432, (432 * 432) % 433, (200 * 300) % 433]
    assert f.inv(np.array([2]))[0] == 217  # 2*217 = 434 = 1 mod 433


def test_big_field_ops_exact():
    p = (1 << 89) - 1  # Mersenne prime, 89 bits
    f = PrimeField(p)
    assert not f.small
    a = f.canon(np.array([p - 1, 12345678901234567890], dtype=object))
    b = f.canon(np.array([p - 1, 98765432109876543210], dtype=object))
    got = f.mul(a, b)
    assert int(got[0]) == pow(p - 1, 2, p)
    assert int(got[1]) == (12345678901234567890 * 98765432109876543210) % p
    inv = f.inv(np.array([123456789], dtype=object))
    assert int(inv[0]) * 123456789 % p == 1


def test_reference_roots_433():
    # verified parameter vector: ord(354)=8, ord(150)=9 mod 433
    # (/root/reference/integration-tests/tests/full_loop.rs:57-64)
    assert element_order(354, 433) == 8
    assert element_order(150, 433) == 9


def test_find_element_of_order():
    f = PrimeField(433)
    for n in (8, 9, 16, 27):
        w = f.find_element_of_order(n)
        assert element_order(w, 433) == n


def test_find_prime_field():
    p, w2, w3 = find_prime_field(62, 16, 27)
    assert p.bit_length() >= 62
    assert (p - 1) % (16 * 27) == 0
    assert element_order(w2, p) == 16
    assert element_order(w3, p) == 27


def test_sample_range(rng):
    f = PrimeField(433)
    s = f.sample((10_000,), rng=rng)
    assert s.min() >= 0 and s.max() < 433
    fbig = PrimeField((1 << 89) - 1)
    sb = fbig.sample((16,), rng=rng)
    assert all(0 <= int(x) < fbig.p for x in sb)


def test_sample_default_is_os_csprng(monkeypatch):
    """Protocol-path randomness must come from the OS CSPRNG, never a
    statistical PRG (reference draws every element from OsRng,
    additive.rs:42-44, full.rs:22-35). Pins that ``sample(rng=None)`` reads
    os.urandom for small AND large fields, and that the bytes it got are the
    bytes it used (zone rejection / floor-mod replayed host-side)."""
    import sda_tpu.fields as fields_mod

    calls = []
    fixed = bytes(range(256)) * 64

    def fake_urandom(n):
        calls.append(n)
        return fixed[:n]

    monkeypatch.setattr(fields_mod, "_urandom", fake_urandom)

    f = fields_mod.PrimeField(433)
    out = f.sample((5,))
    assert calls, "small-field sample(rng=None) did not read os.urandom"
    words = np.frombuffer(fixed[: (5 + 4) * 8], dtype=np.uint64)
    zone = (1 << 64) - ((1 << 64) % 433)
    accepted = [int(w) % 433 for w in words if int(w) < zone][:5]
    assert list(out) == accepted

    calls.clear()
    fbig = fields_mod.PrimeField((1 << 89) - 1)
    outb = fbig.sample((3,))
    assert calls, "big-field sample(rng=None) did not read os.urandom"
    nbytes = (fbig.p.bit_length() + 64 + 7) // 8
    expect = [
        int.from_bytes(fixed[i * nbytes : (i + 1) * nbytes], "little") % fbig.p
        for i in range(3)
    ]
    assert [int(x) for x in outb] == expect

    # masking and sharing default paths reach the CSPRNG too
    calls.clear()
    from sda_tpu.masking import FullMasker

    FullMasker(433).mask(np.array([1, 2, 3], dtype=np.int64))
    assert calls, "FullMasker.mask did not use the OS CSPRNG"

    calls.clear()
    from sda_tpu.sharing import AdditiveScheme

    AdditiveScheme(share_count=3, modulus=433).share_vector(np.array([1, 2], dtype=np.int64))
    assert calls, "additive share_vector did not use the OS CSPRNG"
