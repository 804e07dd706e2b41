"""HAR archive read-compat (fs/HarFileSystem.java layout parity)."""

from __future__ import annotations

import os

import pytest

from hadoop_1_spark.sources import har

FILES = {
    "/docs/a.txt": b"alpha content",
    "/docs/b b.txt": b"",                 # space in name -> URL encoding
    "/docs/sub/c.bin": bytes(range(256)),
    "/top.txt": b"top-level",
}


@pytest.fixture()
def archive(tmp_path):
    out = str(tmp_path / "fixture.har")
    har.write_har(FILES, out, store_size=2, mtime=1_700_000_000_000)
    return out


def test_java_string_hash_parity():
    """Known Java String.hashCode values (computable by hand: h=31h+ch)."""
    assert har.java_string_hash("") == 0
    assert har.java_string_hash("a") == 97
    assert har.java_string_hash("ab") == 97 * 31 + 98
    assert har.java_string_hash("/top.txt") == java_hash_ref("/top.txt")
    # overflow wraps to signed 32-bit like Java
    assert har.java_string_hash("aaaaaaaaaaaaaaaa") == java_hash_ref("a" * 16)


def java_hash_ref(s: str) -> int:
    h = 0
    for c in s:
        h = (31 * h + ord(c)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def test_read_archived_file(archive):
    for name, data in FILES.items():
        assert har.read_archived_file(archive, name) == data


def test_status_uses_masterindex_ranges(archive):
    """store_size=2 forces multiple masterindex stores; every lookup must
    still resolve through its hash-range store (the reference read path),
    and a missing name raises like HarFileSystem."""
    a = har.HarArchive(archive)
    assert len(a.stores) >= 3  # 4 files + dirs at 2 entries/store
    for name in FILES:
        e = a.status(name)
        assert e.length == len(FILES[name]) and not e.is_dir
    with pytest.raises(FileNotFoundError):
        a.status("/nope.txt")


def test_dir_entries_and_children(archive):
    a = har.HarArchive(archive)
    root = a.status("/")
    assert root.is_dir and sorted(root.children) == ["docs", "top.txt"]
    docs = a.status("/docs")
    assert docs.is_dir and sorted(docs.children) == ["a.txt", "b b.txt", "sub"]
    assert docs.mtime == 1_700_000_000_000


def test_index_line_format_is_reference_shaped(archive):
    """Byte-level grammar: URL-encoded name, dir|file tag, part name,
    offsets, encoded props — split(' ') parses like HarStatus."""
    with open(os.path.join(archive, "_index"), encoding="utf-8") as fh:
        lines = fh.read().splitlines()
    by_name = {}
    for ln in lines:
        splits = ln.split(" ")
        assert splits[1] in ("dir", "file")
        by_name[splits[0]] = splits
    ent = by_name["%2Fdocs%2Fb+b.txt"]  # URLEncoder-style '+' for space
    assert ent[1] == "file" and ent[2] == "part-0" and ent[4] == "0"
    with open(os.path.join(archive, "_masterindex"), encoding="utf-8") as fh:
        master = fh.read().splitlines()
    assert master[0].split(" ")[0] == "3"
    for row in master[1:]:
        sh, eh, b, e = (int(x) for x in row.split(" ")[:4])
        assert 0 <= sh <= eh and 0 <= b < e


def test_har_to_df(spark, archive):
    df = har.har_to_df(spark, archive)
    rows = {r["name"]: r for r in df.collect()}
    assert rows["/docs/sub/c.bin"]["length"] == 256
    assert rows["/docs"]["is_dir"] is True
    files = df.where("NOT is_dir").count()
    assert files == len(FILES)
