"""Minimal protobuf wire-format codec (pure Python, no dependencies).

The container has neither the spark-protobuf connector jar nor the Python
google.protobuf package, so OTLP protobuf ingest (the reference's native
wire format — factory.go:12-18 consumes pdata from OTLP) is implemented
against the public protobuf encoding spec directly: varints, and the two
wire types OTLP traces actually use (0 = varint, 1 = fixed64,
2 = length-delimited).

Only decoding/encoding primitives live here; OTLP message structure is in
sources/otlp_proto.py. Used inside Arrow-batched mapInPandas — per-payload
Python cost is amortized over the batch, and payloads never leave the
executor.
"""

from __future__ import annotations

import struct


def read_varint(buf: bytes, pos: int) -> "tuple[int, int]":
    """Returns (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def write_varint(value: int) -> bytes:
    if value < 0:
        # proto varints encode negative int64 as 64-bit two's complement
        # (a 10-byte varint); without the mask Python's sign-preserving
        # right shift would loop forever
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's fields.

    value is: int for wire type 0 (varint) and 1 (fixed64, raw little-endian
    unsigned), bytes for wire type 2. Unknown wire types raise (3/4 groups
    are not used by OTLP; 5 = fixed32 is decoded for completeness).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:
            val, pos = read_varint(buf, pos)
        elif wire == 1:
            (val,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        elif wire == 2:
            ln, pos = read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            (val,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} (field {field})")
        yield field, wire, val


def field_bytes(field: int, payload: bytes) -> bytes:
    """Length-delimited field."""
    return write_varint((field << 3) | 2) + write_varint(len(payload)) + payload


def field_varint(field: int, value: int) -> bytes:
    return write_varint(field << 3) + write_varint(value)


def field_fixed64(field: int, value: int) -> bytes:
    return write_varint((field << 3) | 1) + struct.pack("<Q", value)
