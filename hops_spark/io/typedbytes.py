"""typedbytes wire protocol — Hadoop Streaming's binary framing.

Implements the public typedbytes format (reference surface:
hadoop-tools/hadoop-streaming/src/main/java/org/apache/hadoop/
typedbytes/TypedBytesInput.java:34, TypedBytesOutput.java,
Type.java:24-43 — re-implemented from the published spec, not ported)
so an existing `-io typedbytes` streaming job runs against the pipe
bridge unmodified. One byte of type code, then a code-specific body;
all integers big-endian:

    0 BYTES   u32 length + raw bytes
    1 BYTE    1 signed byte
    2 BOOL    1 byte (0/1)
    3 INT     i32
    4 LONG    i64
    5 FLOAT   f32 IEEE-754
    6 DOUBLE  f64 IEEE-754
    7 STRING  u32 length + UTF-8
    8 VECTOR  u32 count + that many typedbytes values
    9 LIST    values until the 255 marker
    10 MAP    u32 count + count (key, value) typedbytes pairs
    255       end-of-LIST marker

Python mapping: bytes↔BYTES, bool↔BOOL, int↔INT/LONG by range,
float↔DOUBLE, str↔STRING, tuple↔VECTOR, list↔LIST, dict↔MAP. The
narrower codes (BYTE, FLOAT) encode via the TBByte/TBFloat wrappers
and decode to plain int/float.
"""

from __future__ import annotations

import struct
from typing import BinaryIO

BYTES, BYTE, BOOL, INT, LONG, FLOAT, DOUBLE, STRING, VECTOR, LIST, MAP = \
    range(11)
MARKER = 255

_I32_MIN, _I32_MAX = -(1 << 31), (1 << 31) - 1


class TBByte(int):
    """Force the 1-byte BYTE encoding for a small int."""


class TBFloat(float):
    """Force the 4-byte FLOAT encoding (lossy for arbitrary doubles)."""


def encode(obj, out: bytearray) -> None:
    """Append one typedbytes-encoded value to ``out``."""
    if isinstance(obj, TBByte):
        out += struct.pack(">Bb", BYTE, int(obj))
    elif isinstance(obj, bool):                 # before int: bool is int
        out += struct.pack(">BB", BOOL, 1 if obj else 0)
    elif isinstance(obj, TBFloat):
        out += struct.pack(">Bf", FLOAT, float(obj))
    elif isinstance(obj, int):
        if _I32_MIN <= obj <= _I32_MAX:
            out += struct.pack(">Bi", INT, obj)
        else:
            out += struct.pack(">Bq", LONG, obj)
    elif isinstance(obj, float):
        out += struct.pack(">Bd", DOUBLE, obj)
    elif isinstance(obj, (bytes, bytearray)):
        out += struct.pack(">BI", BYTES, len(obj)) + bytes(obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out += struct.pack(">BI", STRING, len(b)) + b
    elif isinstance(obj, tuple):
        out += struct.pack(">BI", VECTOR, len(obj))
        for x in obj:
            encode(x, out)
    elif isinstance(obj, list):
        out.append(LIST)
        for x in obj:
            encode(x, out)
        out.append(MARKER)
    elif isinstance(obj, dict):
        out += struct.pack(">BI", MAP, len(obj))
        for k, v in obj.items():
            encode(k, out)
            encode(v, out)
    else:
        raise TypeError(f"typedbytes cannot encode {type(obj).__name__}")


def encode_bytes(obj) -> bytes:
    buf = bytearray()
    encode(obj, buf)
    return bytes(buf)


def _read_exact(f: BinaryIO, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise EOFError(f"typedbytes stream truncated ({len(b)}/{n})")
    return b


def decode(f: BinaryIO):
    """Read one typedbytes value from a binary stream. Raises
    ``StopIteration`` on clean EOF at a value boundary, ``EOFError`` on
    a truncated body, ``ValueError`` on an unknown type code (including
    a stray 255 marker outside a LIST)."""
    t = f.read(1)
    if not t:
        raise StopIteration
    return _decode_body(t[0], f)


def _decode_body(code: int, f: BinaryIO):
    if code == BYTES:
        n = struct.unpack(">I", _read_exact(f, 4))[0]
        return _read_exact(f, n)
    if code == BYTE:
        return struct.unpack(">b", _read_exact(f, 1))[0]
    if code == BOOL:
        return _read_exact(f, 1)[0] != 0
    if code == INT:
        return struct.unpack(">i", _read_exact(f, 4))[0]
    if code == LONG:
        return struct.unpack(">q", _read_exact(f, 8))[0]
    if code == FLOAT:
        return struct.unpack(">f", _read_exact(f, 4))[0]
    if code == DOUBLE:
        return struct.unpack(">d", _read_exact(f, 8))[0]
    if code == STRING:
        n = struct.unpack(">I", _read_exact(f, 4))[0]
        return _read_exact(f, n).decode("utf-8")
    if code == VECTOR:
        n = struct.unpack(">I", _read_exact(f, 4))[0]
        return tuple(_decode_nested(f) for _ in range(n))
    if code == LIST:
        out = []
        while True:
            c = _read_exact(f, 1)[0]
            if c == MARKER:
                return out
            out.append(_decode_body(c, f))
    if code == MAP:
        n = struct.unpack(">I", _read_exact(f, 4))[0]
        out = {}
        for _ in range(n):
            k = _decode_nested(f)
            if isinstance(k, list):      # LIST keys are legal on the wire;
                k = tuple(k)             # Python dicts need them hashable
            out[k] = _decode_nested(f)
        return out
    raise ValueError(f"unknown typedbytes type code {code}")


def _decode_nested(f: BinaryIO):
    """Decode one element INSIDE a container. EOF here is a truncated
    body, not a clean end-of-stream — surface it as ``EOFError`` per the
    decode() contract (a bare ``decode`` would leak ``StopIteration``,
    which comprehensions pass through as bogus clean EOF)."""
    try:
        return decode(f)
    except StopIteration:
        raise EOFError("typedbytes stream truncated inside a container") from None


def decode_pairs(f: BinaryIO):
    """Yield (key, value) pairs until clean EOF — the streaming job's
    record framing (each record is two consecutive typedbytes values)."""
    while True:
        try:
            k = decode(f)
        except StopIteration:
            return
        try:
            v = decode(f)
        except StopIteration:
            # A key with no value is a truncated record, not clean EOF
            # (and PEP 479 would otherwise turn this into RuntimeError).
            raise EOFError("typedbytes stream ended after a key with no value") from None
        yield k, v
