"""typedbytes codec — Hadoop Streaming's binary interchange format
(SURVEY.md §1.2c, §2.10).

Wire format (contrib/streaming typedbytes/Type.java:27-37 and
TypedBytesOutput/Input): every value is a 1-byte type code followed by a
big-endian payload:

  0 BYTES  : int32 length + raw bytes        5 FLOAT  : 4-byte IEEE BE
  1 BYTE   : 1 signed byte                   6 DOUBLE : 8-byte IEEE BE
  2 BOOL   : 1 byte 0/1                      7 STRING : int32 len + utf-8
  3 INT    : 4-byte BE signed                8 VECTOR : int32 count + values
  4 LONG   : 8-byte BE signed                9 LIST   : values + 0xFF end marker
                                            10 MAP    : int32 count + k/v pairs

Use: exact binary compat when piping records to/from external scripts that
speak typedbytes (`-io typedbytes` in the reference's streaming CLI).
Python-side only — encode before `pipe_lines`/subprocess stdin, decode the
stdout. Arrow stays the engine-internal interchange (the Spark mapping the
survey prescribes); this codec exists purely for external-script parity.
"""

from __future__ import annotations

import io
import struct

BYTES, BYTE, BOOL, INT, LONG, FLOAT, DOUBLE, STRING, VECTOR, LIST, MAP = range(11)
_LIST_END = 0xFF


def encode(value, out: io.BytesIO | None = None) -> bytes:
    """Encode one Python value to typedbytes (type inferred)."""
    buf = out or io.BytesIO()
    if isinstance(value, bool):
        buf.write(struct.pack(">BB", BOOL, 1 if value else 0))
    elif isinstance(value, bytes):
        buf.write(struct.pack(">Bi", BYTES, len(value)))
        buf.write(value)
    elif isinstance(value, int):
        if -(2**31) <= value < 2**31:
            buf.write(struct.pack(">Bi", INT, value))
        else:
            buf.write(struct.pack(">Bq", LONG, value))
    elif isinstance(value, float):
        buf.write(struct.pack(">Bd", DOUBLE, value))
    elif isinstance(value, str):
        raw = value.encode("utf-8")
        buf.write(struct.pack(">Bi", STRING, len(raw)))
        buf.write(raw)
    elif isinstance(value, tuple):  # VECTOR: fixed-arity record
        buf.write(struct.pack(">Bi", VECTOR, len(value)))
        for v in value:
            encode(v, buf)
    elif isinstance(value, list):  # LIST: arbitrary length, end-marked
        buf.write(struct.pack(">B", LIST))
        for v in value:
            encode(v, buf)
        buf.write(struct.pack(">B", _LIST_END))
    elif isinstance(value, dict):
        buf.write(struct.pack(">Bi", MAP, len(value)))
        for k, v in value.items():
            encode(k, buf)
            encode(v, buf)
    else:
        raise TypeError(f"typedbytes cannot encode {type(value).__name__}")
    return buf.getvalue() if out is None else b""


def decode(data: bytes | io.BytesIO):
    """Decode one typedbytes value (returns the Python twin)."""
    buf = io.BytesIO(data) if isinstance(data, bytes) else data
    return _read(buf)


def decode_all(data: bytes) -> list:
    """Decode a concatenated stream of typedbytes values."""
    buf = io.BytesIO(data)
    out = []
    while buf.tell() < len(data):
        out.append(_read(buf))
    return out


def _read(buf: io.BytesIO):
    code = buf.read(1)[0]
    if code == BYTES:
        (n,) = struct.unpack(">i", buf.read(4))
        return buf.read(n)
    if code == BYTE:
        return struct.unpack(">b", buf.read(1))[0]
    if code == BOOL:
        return buf.read(1)[0] != 0
    if code == INT:
        return struct.unpack(">i", buf.read(4))[0]
    if code == LONG:
        return struct.unpack(">q", buf.read(8))[0]
    if code == FLOAT:
        return struct.unpack(">f", buf.read(4))[0]
    if code == DOUBLE:
        return struct.unpack(">d", buf.read(8))[0]
    if code == STRING:
        (n,) = struct.unpack(">i", buf.read(4))
        return buf.read(n).decode("utf-8")
    if code == VECTOR:
        (n,) = struct.unpack(">i", buf.read(4))
        return tuple(_read(buf) for _ in range(n))
    if code == LIST:
        out = []
        while True:
            peek = buf.read(1)
            if peek[0] == _LIST_END:
                return out
            buf.seek(-1, io.SEEK_CUR)
            out.append(_read(buf))
    if code == MAP:
        (n,) = struct.unpack(">i", buf.read(4))
        return {_read(buf): _read(buf) for _ in range(n)}
    raise ValueError(f"unknown typedbytes type code {code}")
