"""Property-based tests (hypothesis) for the arithmetic and wire layers.

The reference trusts its sharing math to the external tss crate's tests and
has no scheme-level unit tests of its own (SURVEY.md §4 notes the gap);
here randomized properties pin the algebra across arbitrary parameters,
not just the golden vectors:

- trunc_add_mod / trunc_sub_mod == the python-int truncated-remainder
  oracle for every sign combination and any modulus < 2**63;
- varint encode/decode is the identity on arbitrary i64 vectors (both the
  native C++ codec and the numpy fallback);
- additive sharing reconstructs the exact modular sum for random share
  counts, moduli (odd AND even — the additive scheme allows any group
  order), and secrets;
- packed Shamir share->combine->reconstruct == modular sum for random
  participant counts over generated NTT-friendly fields, including
  reconstruction from a random minimal clerk subset (threshold path);
- Aggregation JSON round-trips for arbitrary scheme parameter choices.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from sda_tpu import protocol as proto
from sda_tpu.fields import (
    find_prime_field,
    positive,
    trunc_add_mod,
    trunc_sub_mod,
)
from sda_tpu.sharing import AdditiveScheme, PackedShamirScheme
from sda_tpu.utils import varint


def _oracle_trunc(v: int, m: int) -> int:
    r = abs(v) % m
    return r if v >= 0 else -r


moduli = st.one_of(
    st.integers(min_value=2, max_value=1 << 16),
    st.integers(min_value=(1 << 62) - 4096, max_value=(1 << 63) - 1),
    st.just((1 << 63) - 871),
)


@settings(max_examples=200, deadline=None)
@given(st.data(), moduli)
def test_trunc_add_sub_mod_property(data, m):
    a = data.draw(st.integers(min_value=-(m - 1), max_value=m - 1))
    b = data.draw(st.integers(min_value=-(m - 1), max_value=m - 1))
    got_add = trunc_add_mod(np.array([a], dtype=np.int64), np.array([b], dtype=np.int64), m)
    got_sub = trunc_sub_mod(np.array([a], dtype=np.int64), np.array([b], dtype=np.int64), m)
    assert int(got_add[0]) == _oracle_trunc(a + b, m)
    assert int(got_sub[0]) == _oracle_trunc(a - b, m)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        max_size=40,
    )
)
def test_varint_roundtrip_property(values):
    arr = np.array(values, dtype=np.int64)
    wire = varint.encode_varints(arr)
    back = varint.decode_varints(wire)
    assert back.tolist() == values
    # the numpy fallback agrees with whatever path encode/decode took
    saved, varint._NATIVE = varint._NATIVE, None
    try:
        assert varint.encode_varints(arr) == wire
        assert varint.decode_varints(wire).tolist() == values
    finally:
        varint._NATIVE = saved


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=2, max_value=8),  # share_count
    st.one_of(
        st.integers(min_value=2, max_value=1 << 16),
        st.just((1 << 63) - 871),
        st.integers(min_value=1 << 62, max_value=(1 << 62) + 4096),
    ),  # modulus, odd or even
    st.integers(min_value=1, max_value=12),  # dimension
    st.integers(min_value=1, max_value=5),  # participants
    st.integers(min_value=0, max_value=2**32),  # rng seed
)
def test_additive_roundtrip_property(n, m, d, parts, seed):
    sch = AdditiveScheme(share_count=n, modulus=m)
    rng = np.random.default_rng(seed)
    secrets = [rng.integers(0, m, size=d, dtype=np.int64) for _ in range(parts)]
    shares = [sch.share_vector(s, rng=rng) for s in secrets]
    combined = [(j, sch.combine([sh[j] for sh in shares])) for j in range(n)]
    out = positive(sch.reconstruct(combined, dimension=d), m)
    want = [int(sum(int(s[i]) for s in secrets)) % m for i in range(d)]
    assert [int(x) for x in out] == want


@settings(max_examples=15, deadline=None)
@given(
    st.sampled_from([(3, 8, 4), (2, 8, 3), (1, 8, 2), (3, 26, 10)]),
    st.integers(min_value=10, max_value=40),  # min field bits
    st.integers(min_value=1, max_value=8),  # dimension
    st.integers(min_value=1, max_value=4),  # participants
    st.integers(min_value=0, max_value=2**32),
)
def test_packed_shamir_roundtrip_property(kp, bits, d, parts, seed):
    k, n, t = kp
    # generate a field with elements of orders k+t+1 and n+1; the
    # matrix-form pipeline accepts ANY orders (the reference's external
    # NTT crate needed radix-smooth ones — (3, 26, 10) here is neither
    # 2^a nor 3^b smooth and still round-trips)
    p, w2, w3 = find_prime_field(bits, k + t + 1, n + 1)
    sch = PackedShamirScheme(
        secret_count=k, share_count=n, privacy_threshold=t,
        prime_modulus=p, omega_secrets=w2, omega_shares=w3,
    )
    rng = np.random.default_rng(seed)
    secrets = [rng.integers(0, p, size=d, dtype=np.int64) for _ in range(parts)]
    shares = [sch.share_vector(s, rng=rng) for s in secrets]
    combined = [(j, sch.combine([sh[j] for sh in shares])) for j in range(n)]
    want = [int(sum(int(s[i]) for s in secrets)) % p for i in range(d)]
    # all-shares fast path
    out = positive(sch.reconstruct(combined, dimension=d), p)
    assert [int(x) for x in out] == want
    # threshold path: a random minimal subset of clerks suffices
    subset_idx = rng.permutation(n)[: sch.reconstruction_threshold]
    subset = [combined[j] for j in sorted(subset_idx)]
    out2 = positive(sch.reconstruct(subset, dimension=d), p)
    assert [int(x) for x in out2] == want


_schemes = st.one_of(
    st.just(proto.NoMasking()),
    st.builds(proto.FullMasking, modulus=st.integers(2, (1 << 63) - 1)),
    st.builds(
        proto.ChaChaMasking,
        modulus=st.integers(2, (1 << 63) - 1),
        dimension=st.integers(1, 1 << 20),
        seed_bitsize=st.sampled_from([128, 256]),
    ),
)
_sharing = st.one_of(
    st.builds(
        proto.AdditiveSharing,
        share_count=st.integers(1, 64),
        modulus=st.integers(2, (1 << 63) - 1),
    ),
    st.builds(
        proto.PackedShamirSharing,
        secret_count=st.integers(1, 8),
        share_count=st.integers(2, 64),
        privacy_threshold=st.integers(1, 16),
        prime_modulus=st.integers(3, (1 << 63) - 1),
        omega_secrets=st.integers(2, 1 << 32),
        omega_shares=st.integers(2, 1 << 32),
    ),
)


@settings(max_examples=100, deadline=None)
@given(
    st.text(min_size=0, max_size=30),
    st.integers(1, 1 << 31),
    st.integers(2, (1 << 63) - 1),
    _schemes,
    _sharing,
)
def test_aggregation_serde_roundtrip_property(title, dim, modulus, mask, share):
    agg = proto.Aggregation(
        id=proto.new_id(),
        title=title,
        vector_dimension=dim,
        modulus=modulus,
        recipient=proto.new_id(),
        recipient_key=proto.new_id(),
        masking_scheme=mask,
        committee_sharing_scheme=share,
    )
    back = proto.Aggregation.from_obj(agg.to_obj())
    assert back == agg
    # and through actual JSON bytes (what the wire carries)
    import json

    back2 = proto.Aggregation.from_obj(json.loads(proto.canonical(agg).decode()))
    assert back2 == agg
