"""Unix-sort-style key-field sort & partition spec compiler.

Reference parity:
- KeyFieldBasedComparator (mapred/lib/KeyFieldBasedComparator.java:46,65-117)
  with spec strings like ``-k2,2nr -k1.3,1``: per-key-field numeric (``n``)
  and reverse (``r``) options, 1-based field indices, optional char offsets
  within a field, fields joined by a configurable separator.
- KeyFieldBasedPartitioner (mapred/lib/KeyFieldBasedPartitioner.java:43):
  shuffle on selected key fields only.
- Spec parser twin: mapred/lib/KeyFieldHelper.java (tested by
  src/test/.../mapred/lib/TestKeyFieldHelper.java).

DataFrame-land has no raw comparators, so the compiler emits *sort
expressions* (SURVEY.md §4.3): each ``-k`` becomes a Column (substring of
the line's field range, numerically cast if ``n``) with ascending/descending
direction.  Catalyst then range-partitions and sorts on those expressions —
byte-comparator performance comes from UnsafeRow binary sorts for free.

Supported subset: ``-kF1[.C1][opts][,F2[.C2][opts]]`` with opts ⊆ {n, r};
char offsets honored on both endpoints (C2 = last char of field F2 taken,
Java semantics).  Multiple -k specs compose left-to-right.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KSPEC = re.compile(
    r"-k\s*(?P<f1>\d+)(?:\.(?P<c1>\d+))?(?P<opt1>[nr]*)"
    r"(?:,(?P<f2>\d+)(?:\.(?P<c2>\d+))?(?P<opt2>[nr]*))?"
)


@dataclass
class KeySpec:
    field_start: int  # 1-based
    field_end: int | None  # inclusive; None = to end of line
    char_start: int  # 1-based offset within field_start
    char_end: int | None  # 1-based last char within field_end; None = whole field
    numeric: bool
    reverse: bool


def parse_sort_spec(spec: str) -> list[KeySpec]:
    """Parse a ``-k...`` option string (KeyFieldHelper.parseOption,
    KeyFieldHelper.java:158-190).

    Standalone ``-n`` / ``-r`` / ``-nr`` tokens set GLOBAL options that
    apply to every -k spec carrying NO flag of its own (the reference
    copies BOTH global flags onto any spec with neither, :185-189 —
    so ``-nr -k1,1 -k2,2n`` makes spec 1 numeric+reverse but leaves
    spec 2 numeric-only).  A spec containing ONLY global flags (e.g.
    ``-n``) yields the global KeyDescription as the sole spec — a
    whole-line sort carrying those flags (parseOption's keySpecSeen
    branch, :183-189).  A non-empty option with NEITHER -k specs NOR
    flags likewise adds the default global KeyDescription
    (``allKeySpecs.add(global)``, :190-192) — whole line, textual,
    ascending; and an empty option early-returns to "default
    comparison" (:159-162), which is that same whole-line default, so
    both collapse to the one default KeySpec here.
    TestKeyFieldHelper.testparseOption pins all of these shapes,
    including ``-k 1.2`` with the field in the next token."""
    specs: list[KeySpec] = []
    for m in _KSPEC.finditer(spec):
        opts = (m.group("opt1") or "") + (m.group("opt2") or "")
        specs.append(
            KeySpec(
                field_start=int(m.group("f1")),
                field_end=int(m.group("f2")) if m.group("f2") else None,
                char_start=int(m.group("c1")) if m.group("c1") else 1,
                char_end=int(m.group("c2")) if m.group("c2") else None,
                numeric="n" in opts,
                reverse="r" in opts,
            )
        )
    g_numeric = g_reverse = False
    for tok in spec.split():
        if tok == "-n":
            g_numeric = True
        elif tok == "-r":
            g_reverse = True
        elif tok == "-nr":
            g_numeric = g_reverse = True
    if not specs:
        # No -k specs: the global KeyDescription IS the key (whole line,
        # field 1 to end) whether or not flags were given —
        # KeyFieldHelper.java:183-192; an empty option's "default
        # comparison" (:159-162) is the same whole-line default.
        return [
            KeySpec(
                field_start=1,
                field_end=None,
                char_start=1,
                char_end=None,
                numeric=g_numeric,
                reverse=g_reverse,
            )
        ]
    if g_numeric or g_reverse:
        for ks in specs:
            if not (ks.numeric or ks.reverse):
                ks.numeric = g_numeric
                ks.reverse = g_reverse
    return specs


def key_expr(fields: Column, ks: KeySpec, separator: str) -> Column:
    """Extract the key substring for one -k spec from a split-fields array."""
    if ks.field_end is None:
        sub = F.array_join(F.slice(fields, ks.field_start, 1_000_000), separator)
    else:
        n = ks.field_end - ks.field_start + 1
        sub = F.array_join(F.slice(fields, ks.field_start, n), separator)
        if ks.char_end is not None:
            # Keep through char_end of the LAST field: full leading fields +
            # separators + char_end chars of the final field.
            last = F.coalesce(F.try_element_at(fields, F.lit(ks.field_end)), F.lit(""))
            keep = F.length(sub) - F.length(last) + F.least(F.lit(ks.char_end), F.length(last))
            sub = sub.substr(F.lit(1), keep)
    if ks.char_start > 1:
        sub = sub.substr(F.lit(ks.char_start), F.length(sub))
    return sub


def is_whole_line(ks: KeySpec) -> bool:
    """True when the spec selects the ENTIRE line (field 1 through end of
    line, no char offsets, non-numeric): split-on-separator then rejoin
    with the same separator is the identity, so the compiled key equals
    the input line byte-for-byte. Callers sorting large data should then
    order by the existing line column instead of materializing a
    duplicate — halves the range-shuffle and cache bytes of a whole-line
    total-order sort (round-11: keyfield_sort_global sf1 25.3 -> 13.0 s,
    9.0x -> ~4.5x on 10x data)."""
    return (
        ks.field_start == 1
        and ks.field_end is None
        and ks.char_start == 1
        and ks.char_end is None
        and not ks.numeric
    )


def compile_sort_keys(
    line: Column, spec: str, separator: str = "\t"
) -> list[tuple[Column, bool]]:
    """Compile a full sort spec into (key expression, reverse?) pairs.

    Callers that sort large data should MATERIALIZE each key as a column
    first and order by the plain columns: a computed key passed directly to
    a range sort is re-evaluated by the range sampler, the partitioner, and
    the sort itself (3x the split/cast work per row). A whole-line spec
    (is_whole_line) compiles to the line column itself — no split/rejoin
    per row, and no byte-identical duplicate for the caller to carry."""
    fields = F.split(line, re.escape(separator))
    out: list[tuple[Column, bool]] = []
    for ks in parse_sort_spec(spec):
        if is_whole_line(ks):
            out.append((line, ks.reverse))
            continue
        e = key_expr(fields, ks, separator)
        if ks.numeric:
            e = e.cast("double")
        out.append((e, ks.reverse))
    return out


def compile_sort_exprs(line: Column, spec: str, separator: str = "\t") -> list[Column]:
    """Compile a full sort spec into ordered Column expressions."""
    return [
        e.desc() if rev else e.asc()
        for e, rev in compile_sort_keys(line, spec, separator)
    ]


def key_field_sort(
    df: DataFrame, spec: str, separator: str = "\t", column: str = "line"
) -> DataFrame:
    """Globally sort lines by the compiled key-field spec (tiebreak: whole
    line, matching sort(1)'s last-resort comparison)."""
    exprs = compile_sort_exprs(F.col(column), spec, separator)
    return df.orderBy(*exprs, F.col(column).asc())


def key_field_partition(
    df: DataFrame, spec: str, num_partitions: int, separator: str = "\t", column: str = "line"
) -> DataFrame:
    """KeyFieldBasedPartitioner: hash-shuffle on the selected key fields only
    (combine with sortWithinPartitions for the O3+O4 unix-sort idiom)."""
    fields = F.split(F.col(column), re.escape(separator))
    keys = [key_expr(fields, ks, separator) for ks in parse_sort_spec(spec)]
    return df.repartition(num_partitions, *keys)


# ---------------------------------------------------------------------------
# Reference partition-FUNCTION parity (O5-O7).  key_field_partition above
# shuffles on Spark's own hash (the scalable path); the expressions below
# reproduce the reference's literal partition assignment so it can be
# checked as data (a partition histogram) against an independent oracle:
#   HashPartitioner.java:33          (key.hashCode() & MAX_VALUE) % k
#   Text.hashCode                     = WritableComparator.hashBytes
#   WritableComparator.java:138-143   hash = 1; hash = 31*hash + byte
#   KeyFieldBasedPartitioner.java:86-111  currentHash = 0; 31-fold over each
#                                     selected field range, chained
#   BinaryPartitioner.java:133-140    hashBytes over [left..right] offsets
#                                     taken modulo the key length
# All folds are 32-bit signed wraparound; expressed with JVM-side Column
# arithmetic in BIGINT with an explicit wrap (no Python in the hot path,
# and no ANSI overflow since |acc*31 + byte| < 2^37).
# ASCII contract: the fold consumes UTF-8 BYTES in the reference; these
# expressions fold per-CHARACTER codepoints, identical for ASCII keys
# (the driver tables' key material).  Documented, test-pinned.


def _wrap32(e: Column) -> Column:
    """Signed 32-bit wraparound of a BIGINT column (Java int overflow)."""
    x = e + F.lit(2147483648)
    return (
        (x % F.lit(4294967296) + F.lit(4294967296)) % F.lit(4294967296)
        - F.lit(2147483648)
    )


def java_hash_fold(col: Column, seed: int = 0) -> Column:
    """31-multiply/add hash of an ASCII string column, Java semantics.

    seed 0 = String.hashCode / KeyFieldBasedPartitioner.hashCode;
    seed 1 = WritableComparator.hashBytes (Text.hashCode, BinaryPartitioner).
    Empty input returns the seed (hashBytes over zero bytes)."""
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    codes = F.transform(chars, lambda c: F.ascii(c).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(seed).cast("bigint"),
        lambda acc, x: _wrap32(acc * F.lit(31) + x),
    )


def _to_partition(hash_col: Column, num_partitions: int) -> Column:
    """(hash & Integer.MAX_VALUE) % numPartitions, as every reference
    partitioner's final step."""
    return (hash_col.bitwiseAND(F.lit(2147483647)) % F.lit(num_partitions)).cast("int")


def hash_partition_id(col: Column, num_partitions: int) -> Column:
    """O6 HashPartitioner over a Text key: (Text.hashCode & MAX) % k."""
    return _to_partition(java_hash_fold(col, seed=1), num_partitions)


def binary_partition_id(
    col: Column, num_partitions: int, left_offset: int = 0, right_offset: int = -1
) -> Column:
    """O7 BinaryPartitioner: hashBytes over the [left..right] slice of the
    key, offsets interpreted modulo the key length (negative = from the
    end, BinaryPartitioner.java:135-136).  An EMPTY or NULL key raises
    explicitly — the reference's ``% length`` throws ArithmeticException
    on length 0, and getBytes() on a null key would NPE — instead of
    leaking a null partition id (F.length(NULL) is NULL, so without the
    isNull arm NEITHER branch would fire and the otherwise leg would
    emit NULL)."""
    length = F.length(col)
    li = ((F.lit(left_offset) + length) % length).cast("int")
    ri = ((F.lit(right_offset) + length) % length).cast("int")
    sliced = F.substring(col, li + 1, ri - li + 1)
    return F.when(
        length.isNull() | (length == 0),
        F.raise_error(
            F.lit(
                "BinaryPartitioner: empty or null key — offsets are taken "
                "modulo the key length (ArithmeticException / NPE in the "
                "reference, BinaryPartitioner.java:135)"
            )
        ).cast("int"),
    ).otherwise(_to_partition(java_hash_fold(sliced, seed=1), num_partitions))


def key_field_partition_id(
    col: Column, spec: str, num_partitions: int, separator: str = "\t"
) -> Column:
    """O5 KeyFieldBasedPartitioner: seed-0 31-fold over each -k spec's
    selected byte range (interior separators included, endChar inclusive),
    chained across specs in order; empty key partitions to 0
    (KeyFieldBasedPartitioner.java:80-99)."""
    fields = F.split(col, re.escape(separator))
    acc = F.lit(0).cast("bigint")
    for ks in parse_sort_spec(spec):
        sub = key_expr(fields, ks, separator)
        chars = F.filter(F.split(sub, ""), lambda c: c != F.lit(""))
        codes = F.transform(chars, lambda c: F.ascii(c).cast("bigint"))
        acc = F.aggregate(
            codes, acc, lambda a, x: _wrap32(a * F.lit(31) + x)
        )
    return F.when(F.length(col) == 0, F.lit(0)).otherwise(
        _to_partition(acc, num_partitions)
    )
