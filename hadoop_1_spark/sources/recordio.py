"""Hadoop Record I/O: the `.jr` DDL compiler and the CSV / binary record
codecs, re-expressed for Spark (SURVEY.md §1.2b).

The reference ships an IDL ("record DDL") compiler that turns `.jr` files
into serializable record classes (src/core/org/apache/hadoop/record/
compiler/generated/rcc.jj:153-176 token grammar; JavaGenerator.java emits
the classes), with two wire formats implemented by the runtime:

- CSV (CsvRecordOutput.java:57-140): scalars comma-separated; booleans
  ``T``/``F``; strings prefixed ``'`` with ``%XX`` escapes for
  NUL/LF/CR/comma/rbrace/percent (Utils.toCSVString:108-138); buffers
  ``#`` + lowercase hex (Buffer.toString:220-227); nested record
  ``s{...}``, vector ``v{...}``, map ``m{...}``; one record per line.
- binary (BinaryRecordOutput.java:68-116): byte/bool as one byte,
  int/long zero-compressed (WritableUtils.writeVLong:262-288 — values in
  [-112, 127] are one byte, else a length marker byte then big-endian
  magnitude bytes, negatives one's-complemented), float/double as
  big-endian IEEE, strings/buffers VInt length + bytes, vectors/maps
  VInt size + elements.

Here the DDL compiles to a Spark ``StructType`` (the IDL's type algebra
maps 1:1: vector -> ArrayType, map -> MapType, nested record ->
StructType), and the codecs are plain Python functions applied inside
Arrow-batched ``mapInPandas`` — the same deliberate Python seam as the
typedbytes codec (operators/typedbytes.py): legacy interop formats are a
per-row byte protocol, not a relational operator, so the engine decodes
them at the edge and hands Catalyst a typed DataFrame.

Determinism notes: maps serialize in Java TreeMap key order — string keys
by UTF-16 code units, matching String.compareTo even for supplementary-
plane keys (see ``_treemap_items``); float/double CSV text uses Python
``repr``,
which round-trips exactly within this codec but renders some magnitudes
differently from Java's ``Double.toString`` (1e-4 -> ``0.0001`` vs
``1.0E-4``) — byte-level cross-engine parity is only claimed where the
two grammars agree, value-level parity always.
"""

from __future__ import annotations

import re
import struct as _struct
from dataclasses import dataclass

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# .jr DDL parser
# ---------------------------------------------------------------------------

_SCALARS: dict[str, DataType] = {
    "byte": ByteType(),
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "ustring": StringType(),
    "buffer": BinaryType(),
}

_TOKEN_RE = re.compile(
    r"""
    //[^\n]*                      # one-line comment
  | /\*.*?\*/                     # multi-line comment
  | "(?:[^"])*"                   # cstring (include path)
  | [A-Za-z][A-Za-z0-9_]*         # ident / keyword
  | [{}<>;,.]                     # punctuation
  | \s+                           # whitespace
""",
    re.VERBOSE | re.DOTALL,
)


def _tokenize(text: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"rcc: cannot tokenize at offset {pos}: {text[pos:pos+20]!r}")
        t = m.group(0)
        pos = m.end()
        if t.isspace() or t.startswith("//") or t.startswith("/*"):
            continue
        toks.append(t)
    return toks


@dataclass
class _Parser:
    toks: list[str]
    pos: int = 0

    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("rcc: unexpected end of input")
        self.pos += 1
        return t

    def expect(self, want: str) -> str:
        t = self.next()
        if t != want:
            raise ValueError(f"rcc: expected {want!r}, got {t!r}")
        return t


def _parse_dotted(p: _Parser) -> str:
    name = p.next()
    while p.peek() == ".":
        p.next()
        name += "." + p.next()
    return name


def _parse_type(p: _Parser):
    """Returns either a DataType (scalar), ('vector', inner),
    ('map', key, value), or ('ref', dotted_name)."""
    t = p.next()
    if t in _SCALARS:
        return _SCALARS[t]
    if t == "vector":
        p.expect("<")
        inner = _parse_type(p)
        p.expect(">")
        return ("vector", inner)
    if t == "map":
        p.expect("<")
        key = _parse_type(p)
        p.expect(",")
        val = _parse_type(p)
        p.expect(">")
        return ("map", key, val)
    # record reference, possibly dotted-qualified
    name = t
    while p.peek() == ".":
        p.next()
        name += "." + p.next()
    return ("ref", name)


def parse_jr(text: str) -> dict[str, StructType]:
    """Parse `.jr` DDL text into ``{qualified_record_name: StructType}``.

    Full grammar of rcc.jj minus ``include`` (see load_jr for that):
    modules of classes, fields of scalar / vector / map / record-ref
    types, ``//`` and ``/* */`` comments anywhere. Record references
    resolve against earlier definitions in the same module (bare name)
    or any module (qualified name) — the same visibility rcc gives
    generated classes."""
    return parse_jr_with_env(text, {})


def load_jr(path: str) -> dict[str, StructType]:
    """Parse a `.jr` file, following ``include "other.jr"`` directives
    relative to the file's directory (rcc.jj Include()): included
    records are referenceable from this file's definitions and their
    schemas are returned too, in include order."""
    import os

    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    out: dict[str, StructType] = {}
    body_parts: list[str] = []
    for line in text.splitlines():
        m = re.match(r'\s*include\s+"([^"]+)"', line)
        if m:
            inc = os.path.join(os.path.dirname(os.path.abspath(path)), m.group(1))
            out.update(load_jr(inc))
        else:
            body_parts.append(line)
    out.update(parse_jr_with_env("\n".join(body_parts), dict(out)))
    return out


def parse_jr_with_env(text: str, env: dict[str, StructType]) -> dict[str, StructType]:
    """parse_jr with pre-resolved record names visible (include support)."""
    if not text.strip():
        return {}
    p = _Parser(_tokenize(text))
    raw: dict[str, list[tuple[str, object]]] = {}
    order: list[str] = []
    while p.peek() is not None:
        p.expect("module")
        module = _parse_dotted(p)
        p.expect("{")
        while p.peek() == "class":
            p.next()
            cls = p.next()
            qname = f"{module}.{cls}"
            p.expect("{")
            fields: list[tuple[str, object]] = []
            while p.peek() != "}":
                ftype = _parse_type(p)
                fname = p.next()
                p.expect(";")
                fields.append((fname, ftype))
            p.expect("}")
            raw[qname] = fields
            order.append(qname)
        p.expect("}")

    resolved: dict[str, StructType] = dict(env)

    def resolve(t, module: str) -> DataType:
        if isinstance(t, DataType):
            return t
        if t[0] == "vector":
            return ArrayType(resolve(t[1], module))
        if t[0] == "map":
            return MapType(resolve(t[1], module), resolve(t[2], module))
        name = t[1]
        for cand in (name, f"{module}.{name}"):
            if cand in resolved:
                return resolved[cand]
        # bare-name match against any module (rcc allows cross-module
        # refs of included files by simple name when unambiguous)
        hits = [k for k in resolved if k.rsplit(".", 1)[1] == name]
        if len(hits) == 1:
            return resolved[hits[0]]
        raise ValueError(f"rcc: unresolved record type {name!r} in module {module}")

    for qname in order:
        module = qname.rsplit(".", 1)[0]
        resolved[qname] = StructType(
            [StructField(fn, resolve(ft, module)) for fn, ft in raw[qname]]
        )
    return {q: resolved[q] for q in order}


# ---------------------------------------------------------------------------
# CSV codec (CsvRecordOutput / CsvRecordInput parity)
# ---------------------------------------------------------------------------

_CSV_ESC = {"\0": "%00", "\n": "%0A", "\r": "%0D", ",": "%2C", "}": "%7D", "%": "%25"}
_CSV_UNESC = {v[1:]: k for k, v in _CSV_ESC.items()}


def _csv_string(s: str) -> str:
    return "'" + "".join(_CSV_ESC.get(c, c) for c in s)


def _csv_unstring(s: str) -> str:
    if not s.startswith("'"):
        raise ValueError("Error deserializing string.")
    out, i, body = [], 0, s[1:]
    while i < len(body):
        if body[i] == "%":
            out.append(_CSV_UNESC[body[i + 1 : i + 3].upper()])
            i += 3
        else:
            out.append(body[i])
            i += 1
    return "".join(out)


def _treemap_items(value, key_type: DataType):
    """Map entries in Java TreeMap iteration order (the reference
    serializes maps from a TreeMap). Java orders strings by UTF-16 code
    units (String.compareTo), which diverges from Python's code-point
    sort for supplementary-plane keys (U+10000.. encode as surrogate
    pairs 0xD800.. that sort BELOW 0xE000..0xFFFF code units), so string
    keys sort by their UTF-16-BE encoding (round-6 advice #2)."""
    if isinstance(key_type, StringType):
        # surrogatepass: Java strings may hold lone surrogates as bare
        # code units — they must encode (and order) rather than raise
        return sorted(
            value.items(),
            key=lambda kv: kv[0].encode("utf-16-be", "surrogatepass"),
        )
    return sorted(value.items())


def csv_encode(value, dtype: DataType, top: bool = True) -> str:
    """Encode one value of ``dtype`` to the record-CSV grammar. At top
    level emits the bare comma-joined field list (caller appends the
    newline that CsvRecordOutput.endRecord writes)."""
    if isinstance(dtype, StructType):
        inner = ",".join(
            csv_encode(value[i], f.dataType, False)
            for i, f in enumerate(dtype.fields)
        )
        return inner if top else "s{" + inner + "}"
    if isinstance(dtype, ArrayType):
        return "v{" + ",".join(csv_encode(v, dtype.elementType, False) for v in value) + "}"
    if isinstance(dtype, MapType):
        items = _treemap_items(value, dtype.keyType)
        return "m{" + ",".join(
            csv_encode(k, dtype.keyType, False) + "," + csv_encode(v, dtype.valueType, False)
            for k, v in items
        ) + "}"
    if isinstance(dtype, StringType):
        return _csv_string(value)
    if isinstance(dtype, BinaryType):
        return "#" + bytes(value).hex()
    if isinstance(dtype, BooleanType):
        return "T" if value else "F"
    if isinstance(dtype, (FloatType, DoubleType)):
        return repr(float(value))
    return str(int(value))


class _CsvReader:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def _field(self) -> str:
        # readField: accumulate until , } \n (terminator not consumed
        # except the comma)
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos] not in ",}\n\r":
            self.pos += 1
        val = self.text[start : self.pos]
        if self.pos < len(self.text) and self.text[self.pos] == ",":
            self.pos += 1
        return val

    def _consume(self, tok: str):
        if not self.text.startswith(tok, self.pos):
            raise ValueError(
                f"Error deserializing at {self.pos}: want {tok!r}, "
                f"have {self.text[self.pos:self.pos+4]!r}"
            )
        self.pos += len(tok)

    def _maybe_comma(self):
        if self.pos < len(self.text) and self.text[self.pos] == ",":
            self.pos += 1

    def read(self, dtype: DataType, top: bool = True):
        if isinstance(dtype, StructType):
            if not top:
                self._consume("s{")
            vals = [self.read(f.dataType, False) for f in dtype.fields]
            if not top:
                self._consume("}")
                self._maybe_comma()
            return tuple(vals)
        if isinstance(dtype, ArrayType):
            self._consume("v{")
            out = []
            while not self.text.startswith("}", self.pos):
                out.append(self.read(dtype.elementType, False))
            self._consume("}")
            self._maybe_comma()
            return out
        if isinstance(dtype, MapType):
            self._consume("m{")
            out = {}
            while not self.text.startswith("}", self.pos):
                k = self.read(dtype.keyType, False)
                v = self.read(dtype.valueType, False)
                out[k] = v
            self._consume("}")
            self._maybe_comma()
            return out
        f = self._field()
        if isinstance(dtype, StringType):
            return _csv_unstring(f)
        if isinstance(dtype, BinaryType):
            if not f.startswith("#"):
                raise ValueError("Error deserializing buffer.")
            return bytes.fromhex(f[1:])
        if isinstance(dtype, BooleanType):
            return f == "T"
        if isinstance(dtype, (FloatType, DoubleType)):
            return float(f)
        return int(f)


def csv_decode(line: str, dtype: StructType) -> tuple:
    """Decode one record line (without trailing newline) into a tuple
    shaped like ``dtype`` (nested records as tuples, vectors as lists,
    maps as dicts)."""
    return _CsvReader(line).read(dtype, True)


# ---------------------------------------------------------------------------
# binary codec (BinaryRecordOutput / WritableUtils VInt parity)
# ---------------------------------------------------------------------------


def write_vlong(out: bytearray, i: int) -> None:
    """WritableUtils.writeVLong (io/WritableUtils.java:262-288):
    [-112, 127] one byte; else marker byte -(112+len) (or -(120+len)
    for negatives, stored one's-complemented) then big-endian bytes."""
    if -112 <= i <= 127:
        out.append(i & 0xFF)
        return
    length = -112
    if i < 0:
        i ^= -1
        length = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        length -= 1
    out.append(length & 0xFF)
    n = -(length + 120) if length < -120 else -(length + 112)
    for idx in range(n, 0, -1):
        out.append((i >> ((idx - 1) * 8)) & 0xFF)


def read_vlong(buf: bytes, pos: int) -> tuple[int, int]:
    first = buf[pos]
    if first > 127:
        first -= 256
    pos += 1
    if first >= -112:
        return first, pos
    negative = first < -120
    n = -(first + 120) if negative else -(first + 112)
    val = 0
    for _ in range(n):
        val = (val << 8) | buf[pos]
        pos += 1
    return (val ^ -1) if negative else val, pos


def binary_encode(value, dtype: DataType, out: bytearray | None = None) -> bytes:
    if out is None:
        out = bytearray()
    if isinstance(dtype, StructType):
        for i, f in enumerate(dtype.fields):
            binary_encode(value[i], f.dataType, out)
    elif isinstance(dtype, ArrayType):
        write_vlong(out, len(value))
        for v in value:
            binary_encode(v, dtype.elementType, out)
    elif isinstance(dtype, MapType):
        items = _treemap_items(value, dtype.keyType)
        write_vlong(out, len(items))
        for k, v in items:
            binary_encode(k, dtype.keyType, out)
            binary_encode(v, dtype.valueType, out)
    elif isinstance(dtype, StringType):
        b = value.encode("utf-8")
        write_vlong(out, len(b))
        out.extend(b)
    elif isinstance(dtype, BinaryType):
        b = bytes(value)
        write_vlong(out, len(b))
        out.extend(b)
    elif isinstance(dtype, BooleanType):
        out.append(1 if value else 0)
    elif isinstance(dtype, ByteType):
        out.append(int(value) & 0xFF)
    elif isinstance(dtype, FloatType):
        out.extend(_struct.pack(">f", float(value)))
    elif isinstance(dtype, DoubleType):
        out.extend(_struct.pack(">d", float(value)))
    else:  # int / long: zero-compressed
        write_vlong(out, int(value))
    return bytes(out)


def binary_decode(buf: bytes, dtype: DataType, pos: int = 0):
    return _binary_read(buf, dtype, pos)[0]


def _binary_read(buf: bytes, dtype: DataType, pos: int):
    if isinstance(dtype, StructType):
        vals = []
        for f in dtype.fields:
            v, pos = _binary_read(buf, f.dataType, pos)
            vals.append(v)
        return tuple(vals), pos
    if isinstance(dtype, ArrayType):
        n, pos = read_vlong(buf, pos)
        out = []
        for _ in range(n):
            v, pos = _binary_read(buf, dtype.elementType, pos)
            out.append(v)
        return out, pos
    if isinstance(dtype, MapType):
        n, pos = read_vlong(buf, pos)
        out = {}
        for _ in range(n):
            k, pos = _binary_read(buf, dtype.keyType, pos)
            v, pos = _binary_read(buf, dtype.valueType, pos)
            out[k] = v
        return out, pos
    if isinstance(dtype, StringType):
        n, pos = read_vlong(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if isinstance(dtype, BinaryType):
        n, pos = read_vlong(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if isinstance(dtype, BooleanType):
        return buf[pos] != 0, pos + 1
    if isinstance(dtype, ByteType):
        b = buf[pos]
        return b - 256 if b > 127 else b, pos + 1
    if isinstance(dtype, FloatType):
        return _struct.unpack(">f", buf[pos : pos + 4])[0], pos + 4
    if isinstance(dtype, DoubleType):
        return _struct.unpack(">d", buf[pos : pos + 8])[0], pos + 8
    return read_vlong(buf, pos)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def read_records_csv(spark, path: str, schema: StructType):
    """Read a record-CSV file (one record per line, CsvRecordOutput
    framing) into a typed DataFrame: spark.read.text for distributed,
    splittable line input, then an Arrow-batched mapInPandas decode —
    the one deliberate Python seam, same as typedbytes."""
    import pandas as pd

    lines = spark.read.text(path)

    def decode(batches):
        for pdf in batches:
            rows = [csv_decode(ln, schema) for ln in pdf["value"]]
            yield pd.DataFrame(
                {f.name: [r[i] for r in rows] for i, f in enumerate(schema.fields)}
            )

    return lines.mapInPandas(decode, schema=schema)


# ---------------------------------------------------------------------------
# Versioned read (record versioning, src/test/ddl/test.jr RecRecordOld vs
# RecRecordNew; runtime support lives in org.apache.hadoop.record.meta —
# RecordTypeInfo lets a reader skip/ignore fields whose name or type no
# longer matches its own schema)


def _compatible(w: DataType, r: DataType) -> bool:
    """Same type, or a lossless numeric widening (byte->int->long,
    float->double) — what a versioned reader can carry without guessing."""
    if w == r:
        return True
    widen = {
        ByteType(): (IntegerType(), LongType()),
        IntegerType(): (LongType(),),
        FloatType(): (DoubleType(),),
    }
    if type(w) in (ByteType, IntegerType, FloatType) and r in widen.get(w, ()):
        return True
    if isinstance(w, ArrayType) and isinstance(r, ArrayType):
        return _compatible(w.elementType, r.elementType)
    if isinstance(w, MapType) and isinstance(r, MapType):
        return _compatible(w.keyType, r.keyType) and _compatible(w.valueType, r.valueType)
    if isinstance(w, StructType) and isinstance(r, StructType):
        return True  # projected recursively; per-field rules apply there
    return False


def _project(value, w: DataType, r: DataType):
    if isinstance(w, StructType) and isinstance(r, StructType):
        by_name = {f.name: (i, f.dataType) for i, f in enumerate(w.fields)}
        out = []
        for f in r.fields:
            hit = by_name.get(f.name)
            if hit is None or not _compatible(hit[1], f.dataType):
                out.append(None)  # unknown/retyped field -> reader default
            else:
                out.append(_project(value[hit[0]], hit[1], f.dataType))
        return tuple(out)
    if isinstance(w, ArrayType) and isinstance(r, ArrayType):
        return [_project(v, w.elementType, r.elementType) for v in value]
    if isinstance(w, MapType) and isinstance(r, MapType):
        return {
            _project(k, w.keyType, r.keyType): _project(v, w.valueType, r.valueType)
            for k, v in value.items()
        }
    if isinstance(w, FloatType) and isinstance(r, DoubleType):
        return float(value)
    if isinstance(w, (ByteType, IntegerType)) and isinstance(r, (IntegerType, LongType)):
        return int(value)
    return value


def binary_decode_versioned(
    buf: bytes, writer: StructType, reader: StructType
):
    """Versioned record read: decode the bytes with the WRITER's schema
    (the wire layout is positional — only the writer knows it), then
    project into the READER's schema by field NAME: matching compatible
    fields carry over (with lossless numeric widening), renamed/retyped/
    removed fields become None defaults, reader-only fields are None.
    This is the RecRecordOld -> RecRecordNew evolution contract the
    reference's versioning tests exercise."""
    return _project(binary_decode(buf, writer), writer, reader)
