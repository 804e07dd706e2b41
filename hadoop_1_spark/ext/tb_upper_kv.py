#!/usr/bin/env python3
"""Typedbytes streaming mapper (`-io typedbytes` parity): reads VECTOR
records (tag 8) of strings from stdin — (doc_id, source) — and emits
VECTOR(upper(source), doc_id) records on stdout.

Deliberately self-contained: it re-implements the typedbytes wire reads
with struct instead of importing the engine's codec, so the registered
pipe query proves cross-implementation wire compatibility (the engine
encodes, an independent script decodes, and vice versa) — the situation
the reference's typedbytes format exists for (contrib/streaming
typedbytes/Type.java:27-37, TypedBytesOutputReader).
"""

import struct
import sys

STRING, VECTOR = 7, 8


def read_value(buf):
    code = buf.read(1)
    if not code:
        return None
    code = code[0]
    if code == STRING:
        (n,) = struct.unpack(">i", buf.read(4))
        return buf.read(n).decode("utf-8")
    if code == VECTOR:
        (n,) = struct.unpack(">i", buf.read(4))
        return tuple(read_value(buf) for _ in range(n))
    raise SystemExit(f"tb_upper_kv: unexpected type code {code}")


def write_string(out, s):
    raw = s.encode("utf-8")
    out.write(struct.pack(">Bi", STRING, len(raw)))
    out.write(raw)


def main():
    stdin, stdout = sys.stdin.buffer, sys.stdout.buffer
    while True:
        rec = read_value(stdin)
        if rec is None:
            break
        doc_id, source = rec[0], rec[1]
        stdout.write(struct.pack(">Bi", VECTOR, 2))
        write_string(stdout, source.upper())
        write_string(stdout, doc_id)
    stdout.flush()


if __name__ == "__main__":
    main()
