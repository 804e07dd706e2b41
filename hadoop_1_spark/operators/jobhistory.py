"""JobHistory log parsing — the Rumen input grammar (SURVEY.md §2.11).

The reference's Rumen (tools/rumen/HadoopLogsAnalyzer.java) consumes
JobTracker history logs written by mapred/JobHistory.java:

- one record per logical line: ``RecType KEY="value" KEY="value" ... .``
  (DELIMITER=' ', JobHistory.java:106; LINE_DELIMITER_CHAR='.' :107);
  a physical line NOT ending in an unescaped `` .`` continues onto the
  next line (JobHistory.parseHistoryFromFS:690-716 buffering);
- values are backslash-escaped for ``"``, ``=`` and ``.``
  (charsToEscape:108, StringUtils escape semantics), key names match
  ``\\w+`` and the KEY="VALUE" pairs are regex-extracted
  (JobHistory.java:112-116, parseLine:729-751);
- record types and the key namespace are fixed enums
  (RecordTypes:462-464, Keys:469-479);
- COUNTERS values use the escaped compact string
  ``{(gname)(gdisp)[(cname)(cdisp)(value)]...}...`` with ``{}[]()``
  escaped inside names (mapred/Counters.java:54-62,
  fromEscapedCompactString).

This module implements that grammar bidirectionally (writer for fixtures
and round-trip proofs, parser for interop) plus the Spark entry points:
``history_df`` parses files into (rec_type, kv map) rows through an
Arrow-batched seam — the same edge-decode discipline as typedbytes and
record-CSV — and the CDF analytics stay declarative downstream.

Dialects: the primary target is the 1.x format the reference actually
writes (VERSION Meta record, escaped values, `` .`` terminators) — what
its own HistoryViewer reads back. The pre-0.20 dialect (Rumen's ``-v1``
flag selects between them) differs ONLY in logical-line assembly — a
trailing-space terminator and '\\f' segment boundaries — and
``parse_records(version=0)`` supports it; the rest of HadoopLogsAnalyzer's
~10k LoC is its statistical reducer (CDFs/histograms), covered
declaratively by the rumen_cdf query.
"""

from __future__ import annotations

import re

ESCAPE_CHAR = "\\"
LINE_DELIM = "."
CHARS_TO_ESCAPE = ('"', "=", ".")
RECORD_TYPES = ("Jobtracker", "Job", "Task", "MapAttempt", "ReduceAttempt", "Meta")

_PAIR_RE = re.compile(r'(\w+)="((?:\\.|[^"\\])*)"')
_COUNTER_ESCAPES = ("{", "}", "[", "]", "(", ")")


_ESCAPE_TABLE = {ord(c): ESCAPE_CHAR + c for c in (ESCAPE_CHAR,) + CHARS_TO_ESCAPE}
_UNESCAPE_RE = re.compile(r"\\(.)", re.DOTALL)


def escape_string(s: str, chars: tuple[str, ...] = CHARS_TO_ESCAPE) -> str:
    """StringUtils.escapeString parity: backslash-escape the escape char
    itself and every char in ``chars`` (one C-level translate pass for
    the default char set — this runs per record in the write seam)."""
    if chars is CHARS_TO_ESCAPE:
        return s.translate(_ESCAPE_TABLE)
    table = {ord(c): ESCAPE_CHAR + c for c in (ESCAPE_CHAR,) + chars}
    return s.translate(table)


def unescape_string(s: str, chars: tuple[str, ...] = CHARS_TO_ESCAPE) -> str:
    """Inverse: drop each backslash, keep the escaped char (chars is
    accepted for signature parity — any escaped char unescapes)."""
    if ESCAPE_CHAR not in s:
        return s
    return _UNESCAPE_RE.sub(r"\1", s)


def format_record(rec_type: str, kv: dict[str, str]) -> str:
    """JobHistory.log parity: ``RecType K="escaped" ... .`` (one logical
    line; the trailing space-dot is the record terminator)."""
    body = " ".join(f'{k}="{escape_string(str(v))}"' for k, v in kv.items())
    return f"{rec_type} {body} {LINE_DELIM}"


def parse_records(
    text: str, version: int = 1
) -> list[tuple[str, dict[str, str]]]:
    """Parse history text into (rec_type, {key: value}) records,
    reassembling logical lines that span physical lines.

    ``version`` selects the logical-line terminator dialect, Rumen's
    ``-v1`` switch (HadoopLogsAnalyzer.java:178,428 sets it, :685 picks
    the marker): version 1 — the 0.20+/1.x JobHistory format this engine
    writes — ends a record with `` .`` (a physical line not ending in an
    unescaped dot continues onto the next); version 0 — the pre-0.20
    JobTracker log dialect — ends a record with a bare trailing space.
    The KEY="escaped value" grammar is identical in both dialects
    (ParsedLine.java:47 uses one regex for either version). In the
    version-0 dialect ONLY, a form feed marks a concatenated-log segment
    boundary and force-terminates the record in progress
    (HadoopLogsAnalyzer.readBalancedLine's '\\f' handling); the 1.x
    reader has no such rule and its values may contain literal '\\f'."""
    records: list[tuple[str, dict[str, str]]] = []
    buf: list[str] = []

    def flush() -> None:
        if not buf:
            return
        logical = "\n".join(buf)
        buf.clear()
        idx = logical.find(" ")
        if idx <= 0:
            return
        rec_type = logical[:idx]
        kv = {
            m.group(1): unescape_string(m.group(2))
            for m in _PAIR_RE.finditer(logical[idx + 1 :])
        }
        records.append((rec_type, kv))

    # split on \r\n | \r | \n ONLY (Java LineReader's boundaries) — NOT
    # str.splitlines(), which also breaks on \x0b/\x1c-\x1e/ /...
    # and would corrupt values containing those control characters
    for line in re.split(r"\r\n|\r|\n", text):
        if version == 0 and "\f" in line:
            # segment boundaries exist only in the legacy analyzer's
            # concatenated-JT-log input; the 1.x JobHistory reader has no
            # '\f' handling and its values may legitimately contain one.
            # The reference discards the WHOLE line: readBalancedLine
            # (HadoopLogsAnalyzer.java:651) truncates text before the
            # first '\f', then the segment-marker branch (:682) recurses
            # past the marker text itself — neither half becomes a record
            flush()
            continue
        buf.append(line)
        if version == 0:
            if line.endswith(" "):
                flush()
        else:
            t = line.rstrip()
            if t.endswith(LINE_DELIM) and not t.endswith(ESCAPE_CHAR + LINE_DELIM):
                flush()
    return records


def _get_block(s: str, open_c: str, close_c: str, pos: int) -> tuple[str | None, int]:
    """Counters.getBlock: next unescaped open..close slice after pos."""
    i = pos
    while i < len(s):
        if s[i] == ESCAPE_CHAR:
            i += 2
            continue
        if s[i] == open_c:
            j = i + 1
            while j < len(s):
                if s[j] == ESCAPE_CHAR:
                    j += 2
                    continue
                if s[j] == close_c:
                    return s[i + 1 : j], j + 1
                j += 1
            return None, len(s)
        i += 1
    return None, len(s)


def parse_counters(compact: str) -> list[tuple[str, str, int]]:
    """Counters.fromEscapedCompactString parity: [(group, counter, value)]
    (display names parsed and dropped — the analyzer keys on real names)."""
    out: list[tuple[str, str, int]] = []
    pos = 0
    while True:
        group, pos = _get_block(compact, "{", "}", pos)
        if group is None:
            return out
        gpos = 0
        gname, gpos = _get_block(group, "(", ")", gpos)
        _gdisp, gpos = _get_block(group, "(", ")", gpos)
        while True:
            counter, gpos = _get_block(group, "[", "]", gpos)
            if counter is None:
                break
            cpos = 0
            cname, cpos = _get_block(counter, "(", ")", cpos)
            _cdisp, cpos = _get_block(counter, "(", ")", cpos)
            cval, cpos = _get_block(counter, "(", ")", cpos)
            out.append(
                (
                    unescape_string(gname, _COUNTER_ESCAPES),
                    unescape_string(cname, _COUNTER_ESCAPES),
                    int(cval),
                )
            )


def make_counters_compact(groups: list[tuple[str, str, int]]) -> str:
    """Counter.makeEscapedCompactString parity (writer for fixtures):
    one group per (group, counter, value) triple grouped by group name."""
    by_group: dict[str, list[tuple[str, int]]] = {}
    for g, c, v in groups:
        by_group.setdefault(g, []).append((c, v))
    esc = lambda s: escape_string(s, _COUNTER_ESCAPES)  # noqa: E731
    parts = []
    for g, counters in by_group.items():
        body = "".join(
            f"[({esc(c)})({esc(c)})({v})]" for c, v in counters
        )
        parts.append(f"{{({esc(g)})({esc(g)}){body}}}")
    return "".join(parts)


def history_df(spark, path: str):
    """Parse JobHistory files into a (rec_type, kv) DataFrame: whole-file
    read (records span lines, so the file is the parse unit — history
    files are per-job and bounded) + Arrow-batched parse seam; filtering,
    joins, and CDFs stay declarative on the typed output."""
    import pandas as pd

    files = spark.read.text(path, wholetext=True)

    def parse(batches):
        for pdf in batches:
            types, kvs = [], []
            for text in pdf["value"]:
                for rec_type, kv in parse_records(text):
                    types.append(rec_type)
                    kvs.append(kv)
            yield pd.DataFrame({"rec_type": types, "kv": kvs})

    return files.mapInPandas(parse, schema="rec_type string, kv map<string,string>")
