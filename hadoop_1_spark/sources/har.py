"""Hadoop Archive (.har) read compatibility (SURVEY.md §2 sources; round-5
verdict #3/#7).

Layout (fs/HarFileSystem.java:40-52): an archive directory holds
``_masterindex``, ``_index`` and one or more ``part-*`` files with the
concatenated payloads. ``_index`` has one URL-encoded line per entry
(HarFileSystem.HarStatus, HarFileSystem.java:515-533)::

    name dir|file partName startIndex length [props | children...]

where version-3 file entries carry an encoded ``modtime perm owner group``
properties string as the 6th field and dir entries carry it in the
partName slot with their children listed after (directories own no bytes).
``_masterindex`` starts with the version line, then ``startHash endHash
begin end`` rows mapping Java-hashCode ranges of entry paths to byte
ranges of ``_index`` (HarFileSystem.parseMetaData:1010-1040) — the lookup
indirection this reader honours: ``status()`` hashes the path
(HarFileSystem.getHarHash:419-421 — Java ``String.hashCode`` masked
positive) and parses only the store slice covering it.

The reader is driver-side and O(archived files) for listing — the same
bound as the engine's own ``_manifest`` compaction (sources/io.py
compact_small_files); payload reads slice the part file. ``har_to_df``
exposes the catalog as a DataFrame so archive contents join/filter like
any other relation. A structurally faithful ``write_har`` exists so tests
can build real fixtures (and for export interop); it is not a port of the
archiver tool.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from urllib.parse import quote_plus, unquote_plus

VERSION = 3


def java_string_hash(s: str) -> int:
    """Java String.hashCode: h = 31*h + ch over UTF-16 code units,
    wrapped to signed 32-bit."""
    h = 0
    for ch in s:
        o = ord(ch)
        if o >= 0x10000:  # surrogate pair, as Java iterates chars
            o -= 0x10000
            for unit in (0xD800 + (o >> 10), 0xDC00 + (o & 0x3FF)):
                h = (31 * h + unit) & 0xFFFFFFFF
            continue
        h = (31 * h + o) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


def har_hash(name: str) -> int:
    """getHarHash: hashCode masked to non-negative (HarFileSystem.java:419)."""
    return java_string_hash(name) & 0x7FFFFFFF


@dataclass
class HarEntry:
    name: str
    is_dir: bool
    part: str
    start: int
    length: int
    mtime: int = 0
    children: list[str] = field(default_factory=list)

    @classmethod
    def parse(cls, line: str, version: int = VERSION) -> "HarEntry":
        splits = line.split(" ")
        name = unquote_plus(splits[0])
        is_dir = splits[1] == "dir"
        part = splits[2]
        start, length = int(splits[3]), int(splits[4])
        mtime, children = 0, []
        if is_dir:
            if version == 3:
                props = unquote_plus(part).split(" ")
                if len(props) >= 4:
                    mtime = int(props[0])
            children = [unquote_plus(c) for c in splits[5:]]
        elif version == 3 and len(splits) > 5:
            props = unquote_plus(splits[5]).split(" ")
            if len(props) >= 4:
                mtime = int(props[0])
        return cls(name, is_dir, part, start, length, mtime, children)

    def unparse(self) -> str:
        props = quote_plus(f"{self.mtime} 420 user group")
        if self.is_dir:
            kids = " ".join(quote_plus(c) for c in self.children)
            body = f"{quote_plus(self.name)} dir {props} 0 0"
            return f"{body} {kids}" if kids else body
        return (
            f"{quote_plus(self.name)} file {self.part} "
            f"{self.start} {self.length} {props}"
        )


class HarArchive:
    """Open an existing ``.har`` directory for reading."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "_masterindex"), encoding="utf-8") as fh:
            master = fh.read()
        lines = master.splitlines(keepends=True)
        self.version = int(lines[0].split(" ")[0])
        if self.version > VERSION:
            raise ValueError(
                f"Invalid version {self.version} expected {VERSION}"
            )
        # (startHash, endHash, begin, end) byte ranges into _index
        self.stores: list[tuple[int, int, int, int]] = []
        for ln in lines[1:]:
            if not ln.strip():
                continue
            a = ln.split(" ")
            self.stores.append((int(a[0]), int(a[1]), int(a[2]), int(a[3])))
        with open(os.path.join(path, "_index"), "rb") as fh:
            self._index = fh.read()

    def _entries_in(self, begin: int, end: int) -> list[HarEntry]:
        chunk = self._index[begin:end].decode("utf-8")
        return [
            HarEntry.parse(ln, self.version)
            for ln in chunk.splitlines()
            if ln.strip()
        ]

    def list(self) -> list[HarEntry]:
        return self._entries_in(0, len(self._index))

    def status(self, name: str) -> HarEntry:
        """Masterindex-guided lookup: only the store whose hash range
        covers getHarHash(name) is parsed — the reference's read path."""
        h = har_hash(name)
        for sh, eh, begin, end in self.stores:
            if sh <= h <= eh:
                for e in self._entries_in(begin, end):
                    if e.name == name:
                        return e
        raise FileNotFoundError(f"{name} not found in archive {self.path}")

    def read_file(self, name: str) -> bytes:
        e = self.status(name)
        if e.is_dir:
            raise IsADirectoryError(name)
        with open(os.path.join(self.path, e.part), "rb") as fh:
            fh.seek(e.start)
            return fh.read(e.length)


def read_archived_file(har_dir: str, name: str) -> bytes:
    return HarArchive(har_dir).read_file(name)


def har_to_df(spark, har_dir: str):
    """Archive catalog as a DataFrame (name, is_dir, part, start, length,
    mtime) — joins/filters like any relation; payloads stay on disk."""
    rows = [
        (e.name, e.is_dir, e.part, e.start, e.length, e.mtime)
        for e in HarArchive(har_dir).list()
    ]
    return spark.createDataFrame(
        rows,
        "name string, is_dir boolean, part string, start bigint, "
        "length bigint, mtime bigint",
    )


def write_har(
    files: dict[str, bytes],
    out_dir: str,
    store_size: int = 1000,
    mtime: int = 0,
) -> None:
    """Create an archive in the reference layout: one part-0 payload,
    ``_index`` lines sorted by getHarHash (the invariant parseMetaData
    relies on), ``_masterindex`` hash-range stores of ``store_size``
    entries. Names must be absolute archive paths ('/a/b.txt')."""
    os.makedirs(out_dir, exist_ok=True)
    entries: list[HarEntry] = []
    # payload: concatenate in name order for determinism
    offset = 0
    payload = bytearray()
    dirs: dict[str, set[str]] = {"/": set()}
    for name in sorted(files):
        data = files[name]
        entries.append(
            HarEntry(name, False, "part-0", offset, len(data), mtime)
        )
        payload.extend(data)
        offset += len(data)
        # register parent chain
        cur = name
        while cur != "/":
            parent = os.path.dirname(cur) or "/"
            dirs.setdefault(parent, set()).add(os.path.basename(cur))
            cur = parent
    for d, kids in dirs.items():
        entries.append(
            HarEntry(d, True, "none", 0, 0, mtime, sorted(kids))
        )
    entries.sort(key=lambda e: har_hash(e.name))
    with open(os.path.join(out_dir, "part-0"), "wb") as fh:
        fh.write(bytes(payload))
    index_lines = [(e.unparse() + "\n").encode("utf-8") for e in entries]
    with open(os.path.join(out_dir, "_index"), "wb") as fh:
        for b in index_lines:
            fh.write(b)
    stores = []
    pos = 0
    for i in range(0, len(entries), store_size):
        batch = entries[i : i + store_size]
        blen = sum(len(index_lines[i + j]) for j in range(len(batch)))
        stores.append(
            (har_hash(batch[0].name), har_hash(batch[-1].name), pos, pos + blen)
        )
        pos += blen
    with open(os.path.join(out_dir, "_masterindex"), "w", encoding="utf-8") as fh:
        fh.write(f"{VERSION} \n")
        for sh, eh, b, e in stores:
            fh.write(f"{sh} {eh} {b} {e} \n")
