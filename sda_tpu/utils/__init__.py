"""Shared utilities: error types, varint codec, serde helpers."""

from sda_tpu.utils.errors import SdaError, PermissionDenied, InvalidCredentials, Invalid
from sda_tpu.utils.varint import encode_varint, decode_varint, encode_varints, decode_varints

__all__ = [
    "SdaError",
    "PermissionDenied",
    "InvalidCredentials",
    "Invalid",
    "encode_varint",
    "decode_varint",
    "encode_varints",
    "decode_varints",
]
