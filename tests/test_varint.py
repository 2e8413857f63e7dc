"""Varint codec: zigzag LEB128 wire format parity."""

import numpy as np

from sda_tpu.utils.varint import decode_varint, decode_varints, encode_varint, encode_varints


def test_known_zigzag_vectors():
    # integer-encoding crate semantics: zigzag then LEB128
    assert encode_varint(0) == b"\x00"
    assert encode_varint(-1) == b"\x01"
    assert encode_varint(1) == b"\x02"
    assert encode_varint(-2) == b"\x03"
    assert encode_varint(2147483647) == bytes([0xFE, 0xFF, 0xFF, 0xFF, 0x0F])
    assert encode_varint(-2147483648) == bytes([0xFF, 0xFF, 0xFF, 0xFF, 0x0F])


def test_roundtrip_scalar():
    for v in [0, 1, -1, 300, -300, 2**62, -(2**62), 2**63 - 1, -(2**63)]:
        data = encode_varint(v)
        got, size = decode_varint(data)
        assert got == v and size == len(data)


def test_batch_matches_scalar(rng):
    vals = rng.integers(-(2**62), 2**62, size=1000, dtype=np.int64)
    batch = encode_varints(vals)
    scalar = b"".join(encode_varint(int(v)) for v in vals)
    assert batch == scalar
    back = decode_varints(batch)
    assert np.array_equal(back, vals)


def test_stream_decode_offsets():
    vals = [5, -433, 0, 2**40]
    data = b"".join(encode_varint(v) for v in vals)
    out, off = [], 0
    while off < len(data):
        v, size = decode_varint(data, off)
        out.append(v)
        off += size
    assert out == vals


def test_empty():
    assert encode_varints([]) == b""
    assert decode_varints(b"").tolist() == []


def test_varint_matches_public_protobuf_vectors():
    """EXTERNAL ground truth: Google's protobuf encoding documentation
    publishes both the base-128 varint worked example (150 -> `96 01`) and
    the ZigZag mapping table (0->0, -1->1, 1->2, -2->3, 0x7fffffff ->
    0xfffffffe, -0x80000000 -> 0xffffffff). The `integer-encoding` Rust
    crate the reference uses implements exactly this pair, so these
    vectors pin the wire codec against documentation nobody here wrote."""
    from sda_tpu.utils.varint import decode_varint, encode_varint

    # unsigned varint worked example from the protobuf docs: 150 = 0x96 0x01.
    # our codec is zigzag-first, so the raw-varint byte layout is exercised
    # through the zigzag preimage of 150 (= 75): encode(75) -> 0x96 0x01
    assert encode_varint(75).hex() == "9601"
    assert decode_varint(bytes.fromhex("9601"))[0] == 75

    # ZigZag table: signed n -> unsigned (n << 1) ^ (n >> 63)
    table = {0: 0, -1: 1, 1: 2, -2: 3, 2: 4,
             0x7FFFFFFF: 0xFFFFFFFE, -0x80000000: 0xFFFFFFFF}
    for signed, unsigned in table.items():
        wire = encode_varint(signed)
        # decode the wire bytes as a RAW unsigned varint to recover the
        # zigzag image and compare against the published table
        z, shift, i = 0, 0, 0
        while True:
            b = wire[i]
            z |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                break
            shift += 7
        assert z == unsigned, (signed, z, unsigned)
        assert decode_varint(wire)[0] == signed
