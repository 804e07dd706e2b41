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
    # dedup.py is core: registry's dispatch wrapper calls
    # caching.release_caches around EVERY query (round-11 shrink: the
    # cache registry moved out of dedup.py so dedup edits dirty only
    # dedup-backed closures).
    assert "hadoop_1_spark/operators/caching.py" in core
    assert "hadoop_1_spark/operators/dedup.py" not in core
    # No query modules or OTHER operator modules belong to the core set.
    assert not any(f.startswith("hadoop_1_spark/queries/q_") for f in core)
    assert not any(
        f.startswith("hadoop_1_spark/operators/")
        and not f.endswith(("__init__.py", "caching.py"))
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
        if rel == "hadoop_1_spark/operators/similarity.py":
            data += b"\n# simulated operator edit\n"
        return data

    # similarity-backed query digests move...
    assert entry.query_digest("sim_cosine_topk", read=edited) != entry.query_digest(
        "sim_cosine_topk", read=_tree_read
    )
    # ...a similarity-independent query's and the core digest do not.
    assert entry.query_digest("fieldsel", read=edited) == entry.query_digest(
        "fieldsel", read=_tree_read
    )
    assert entry.core_digest(read=edited) == entry.core_digest(read=_tree_read)


def test_caching_edit_is_core_dirty_not_query_dirty():
    """caching.py sits on registry's dispatch path (release_caches wraps
    every query), so an edit there must move the CORE digest — reaching
    all queries via the core-dirty rank — and must NOT move any
    per-query closure digest (core files are excluded from closures)."""

    def edited(rel: str) -> bytes:
        data = _tree_read(rel)
        if rel == "hadoop_1_spark/operators/caching.py":
            data += b"\n# simulated operator edit\n"
        return data

    assert entry.core_digest(read=edited) != entry.core_digest(read=_tree_read)
    for name in ("dedup_minhash_lsh", "fieldsel"):
        assert entry.query_digest(name, read=edited) == entry.query_digest(
            name, read=_tree_read
        )


def test_dedup_edit_dirties_only_dedup_queries():
    """Round-11 rotation-core shrink: dedup.py is no longer core — an
    edit there moves dedup-backed closures only, not the core digest and
    not unrelated queries."""

    def edited(rel: str) -> bytes:
        data = _tree_read(rel)
        if rel == "hadoop_1_spark/operators/dedup.py":
            data += b"\n# simulated operator edit\n"
        return data

    assert entry.core_digest(read=edited) == entry.core_digest(read=_tree_read)
    assert entry.query_digest("dedup_minhash_lsh", read=edited) != entry.query_digest(
        "dedup_minhash_lsh", read=_tree_read
    )
    assert entry.query_digest("fieldsel", read=edited) == entry.query_digest(
        "fieldsel", read=_tree_read
    )


def test_from_import_submodules_join_the_closure():
    """``from hadoop_1_spark.operators import graph`` must pull graph.py
    into the importing query's closure (round-7 fix: the prefix-only scan
    resolved only operators/__init__.py, so graph.py edits never dirtied
    graph_pagerank)."""
    files = entry._module_files("hadoop_1_spark.queries.q_graph")
    assert "hadoop_1_spark/operators/graph.py" in files

    def edited(rel: str) -> bytes:
        data = _tree_read(rel)
        if rel == "hadoop_1_spark/operators/graph.py":
            data += b"\n# simulated operator edit\n"
        return data

    assert entry.query_digest("graph_pagerank", read=edited) != entry.query_digest(
        "graph_pagerank", read=_tree_read
    )


def test_rotation_rank_order():
    """failed < never-verified (by epoch) < own-dirty (LRU) < core-dirty <
    clean; LRU then name within each rank."""
    order = list(entry.queries())
    last, failed = entry._correctness_history()
    dirty, core_dirty = entry._dirty_queries()
    epochs = entry._registration_epochs()
    new_epoch = max(epochs.values(), default=0) + 1

    def rank(n: str) -> tuple:
        return (
            0 if failed.get(n) else 1,
            (0 if n not in last else 1) if n in dirty else (2 if n in core_dirty else 3),
            epochs.get(n, new_epoch) if (n in dirty and n not in last) else 0,
            last.get(n, 0),
            n,
        )

    assert order == sorted(order, key=rank)


def test_new_registration_queues_behind_backlog(monkeypatch):
    """A name registered this round (absent from REGISTERED.json -> sentinel
    epoch) sorts after every recorded never-verified name in the REAL
    ``entry.queries()`` output, and an edited-but-previously-verified query
    sorts after both (round-7 order: a past green driver row outranks none)."""
    epochs = entry._registration_epochs()
    assert epochs, "REGISTERED.json must exist and be non-empty"
    last, _ = entry._correctness_history()
    dirty, _ = entry._dirty_queries()
    never = sorted(n for n in dirty if n not in last and n in epochs)
    if not never:
        pytest.skip("no never-verified backlog to compare against")
    backlog_name = never[0]
    verified_name = next(iter(last))

    fake_new = "aaa_brand_new_query"
    fake_qs = dict(entry.registry.QUERIES)
    fake_qs[fake_new] = fake_qs[backlog_name]
    monkeypatch.setattr(entry.registry, "QUERIES", fake_qs)
    # Force a previously-verified query dirty without touching its source.
    real_dirty = entry._dirty_queries

    def patched_dirty():
        d, cd = real_dirty()
        return d | {fake_new, verified_name}, cd - {verified_name}

    monkeypatch.setattr(entry, "_dirty_queries", patched_dirty)

    order = list(entry.queries())
    assert order.index(backlog_name) < order.index(fake_new), (
        "new registration must queue behind the recorded backlog"
    )
    assert order.index(fake_new) < order.index(verified_name), (
        "never-verified names (even new ones) outrank edited-verified ones"
    )


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
