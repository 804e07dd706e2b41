"""typedbytes codec round-trips (SURVEY §1.2c) — including through a real
external process, hypothesis-randomized."""

from __future__ import annotations

import subprocess
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_1_spark.operators import typedbytes as tb

scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
    st.binary(max_size=20),
)
values = st.recursive(
    scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.tuples(inner, inner),
        st.dictionaries(st.text(max_size=5), inner, max_size=4),
    ),
    max_leaves=10,
)


@given(values)
@settings(max_examples=200, deadline=None)
def test_roundtrip(v):
    assert tb.decode(tb.encode(v)) == v


def test_decode_all_stream():
    payload = b"".join(tb.encode(v) for v in [1, "two", [3.5, b"x"], {"k": (1, 2)}])
    assert tb.decode_all(payload) == [1, "two", [3.5, b"x"], {"k": (1, 2)}]


def test_wire_format_is_stable():
    """Exact bytes per the reference wire format (type code + BE payload)."""
    assert tb.encode(1) == b"\x03\x00\x00\x00\x01"
    assert tb.encode(True) == b"\x02\x01"
    assert tb.encode("hi") == b"\x07\x00\x00\x00\x02hi"
    assert tb.encode(2**40) == b"\x04" + (2**40).to_bytes(8, "big")


def test_roundtrip_through_external_process():
    """The streaming use: typedbytes through a subprocess (cat) unscathed —
    the -io typedbytes contract."""
    recs = [("key1", 1), ("key2", [1.5, "x"]), ("key3", {"a": b"\x00\xff"})]
    payload = b"".join(tb.encode(r) for r in recs)
    out = subprocess.run(["cat"], input=payload, stdout=subprocess.PIPE, check=True).stdout
    assert tb.decode_all(out) == recs
