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
