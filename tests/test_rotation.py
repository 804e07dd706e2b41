"""Verification-rotation digest precision (round-4 verdict #1).

The driver re-checks a bounded prefix of ``__spark_entry__.queries()`` per
round. These tests lock the property that made the r4 backlog possible to
drain: an engine-core edit (registry.py / session.py / package __init__s)
must NOT change any per-query digest — core changes are tracked by a
separate core digest with their own drain rank in the rotation.
"""

from __future__ import annotations

import os
import sys

import pytest

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, BASE)

import __spark_entry__ as entry  # noqa: E402


def _tree_read(rel: str) -> bytes:
    with open(os.path.join(BASE, rel), "rb") as fh:
        return fh.read()


def test_core_files_are_the_shared_closure():
    core = entry._core_files()
    assert "hadoop_1_spark/registry.py" in core
    assert "hadoop_1_spark/session.py" in core
    # No query/operator implementation modules belong to the core set.
    assert not any(f.startswith("hadoop_1_spark/queries/q_") for f in core)
    assert not any(
        f.startswith("hadoop_1_spark/operators/") and not f.endswith("__init__.py")
        for f in core
    )


def test_query_digest_never_reads_core_files():
    core = set(entry._core_files())
    for name in ("grep", "dedup_minhash_lsh", "join_3way", "corpus_clean"):
        seen: list[str] = []

        def read(rel: str) -> bytes:
            seen.append(rel)
            return _tree_read(rel)

        entry.query_digest(name, read=read)
        assert seen, name  # the closure is non-empty
        assert not (set(seen) & core), (name, set(seen) & core)


def test_core_edit_changes_core_digest_not_query_digest():
    def edited(rel: str) -> bytes:
        data = _tree_read(rel)
        if rel == "hadoop_1_spark/session.py":
            data += b"\n# simulated core edit\n"
        return data

    assert entry.core_digest(read=edited) != entry.core_digest(read=_tree_read)
    for name in ("grep", "dedup_minhash_lsh", "join_3way"):
        assert entry.query_digest(name, read=edited) == entry.query_digest(
            name, read=_tree_read
        ), name


def test_operator_edit_changes_only_its_queries():
    def edited(rel: str) -> bytes:
        data = _tree_read(rel)
        if rel == "hadoop_1_spark/operators/dedup.py":
            data += b"\n# simulated operator edit\n"
        return data

    # dedup-backed query digests move...
    assert entry.query_digest("dedup_minhash_lsh", read=edited) != entry.query_digest(
        "dedup_minhash_lsh", read=_tree_read
    )
    # ...a dedup-independent query's and the core digest do not.
    assert entry.query_digest("fieldsel", read=edited) == entry.query_digest(
        "fieldsel", read=_tree_read
    )
    assert entry.core_digest(read=edited) == entry.core_digest(read=_tree_read)


def test_rotation_rank_order():
    """failed < own-dirty < core-dirty < clean; within own-dirty, earlier
    registration epochs first (new queries never displace backlog); LRU
    within each rank."""
    order = list(entry.queries())
    last, failed = entry._correctness_history()
    dirty, core_dirty = entry._dirty_queries()
    epochs = entry._registration_epochs()
    new_epoch = max(epochs.values(), default=0) + 1

    def rank(n: str) -> tuple:
        return (
            0 if failed.get(n) else 1,
            0 if n in dirty else (1 if n in core_dirty else 2),
            epochs.get(n, new_epoch) if n in dirty else 0,
            last.get(n, 0),
            0 if n in entry._PRIORITY else 1,
            n,
        )

    assert order == sorted(order, key=rank)


def test_new_registration_queues_behind_backlog(monkeypatch, tmp_path):
    """A name registered this round (epoch > backlog's) sorts after every
    recorded never-verified name, even though both are dirty with no
    CORRECTNESS history."""
    import json

    epochs = entry._registration_epochs()
    assert epochs, "REGISTERED.json must exist and be non-empty"
    backlog_epoch = min(epochs.values())

    last, failed = entry._correctness_history()
    dirty, _ = entry._dirty_queries()
    never = [n for n in dirty if n not in last and n in epochs]
    if not never:
        pytest.skip("no never-verified backlog to compare against")

    # Simulate a brand-new registration: present in the registry order
    # input but absent from REGISTERED.json -> it gets the sentinel epoch.
    sample = never[0]
    new_epoch = max(epochs.values()) + 1
    assert (epochs.get(sample, new_epoch) if sample in dirty else 0) <= backlog_epoch or (
        epochs[sample] <= new_epoch
    )
    # The rank tuple of a recorded backlog name beats an unrecorded one.
    rank_backlog = (1, 0, epochs[sample], 0, 1, sample)
    rank_new = (1, 0, new_epoch, 0, 1, "aaa_brand_new")
    assert rank_backlog < rank_new


def test_verified_manifest_matches_current_scheme():
    """Entries re-pinned at the latest round must carry the core digest; a
    drained manifest (all entries current-scheme, sources unchanged) shows
    no dirty queries."""
    import json

    with open(os.path.join(BASE, "VERIFIED.json"), encoding="utf-8") as fh:
        manifest = json.load(fh)
    latest = max(rec.get("round", 0) for rec in manifest.values())
    with_core = [n for n, rec in manifest.items() if rec.get("round") == latest]
    assert with_core
    for n in with_core:
        assert "core" in manifest[n], n


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
