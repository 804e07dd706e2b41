"""J1 CompositeInputFormat's shuffle-free join, as a first-class relation.

The reference's map-side join (mapred/join/CompositeInputFormat.java:48)
merges inputs that are ALREADY equal-partitioned and key-sorted, so the
join itself moves no data.  Spark's equivalent contract is bucketed tables:
``bucketBy(k, key).sortBy(key)`` persists the partitioning in the catalog,
and a sort-merge join between two tables bucketed the same way needs no
Exchange at all — the plan-level property tests/test_planlint.py and
tests/test_bucketed.py pin, and the ``bucketed_join_customer_orders`` query
registers as data.

At 100 TB this is the difference between shuffling both fact tables per
join and shuffling each ONCE at ingest: the bucket layout is written when
the data lands and every subsequent co-keyed join or aggregation rides it
for free (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def park_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 8,
    fingerprint: str | None = None,
) -> DataFrame:
    """Write ``df`` as a bucketed+sorted catalog table (the one-time ingest
    cost) and return the catalog-backed relation.  A ``fingerprint`` (e.g.
    source file size+mtime) skips the rewrite when the parked table is
    already current — the pq_park train/scan pattern for layouts.

    Ownership contract: a ``<table>.park_marker`` file is written next to
    every location this helper creates, and ONLY marker-bearing locations
    are ever cleared or overwritten on re-park — a pre-existing directory
    OR catalog table without the marker was not parked by us and raises
    instead of being dropped (mode('overwrite') would otherwise silently
    replace someone else's table).  The marker is claimed with an
    in-progress sentinel BEFORE saveAsTable and refreshed with the
    fingerprint after it succeeds, so a crash mid-write leaves a
    marker-bearing (reclaimable) location, never a marker-less wedge this
    helper then refuses to clear; the sentinel never matches a
    fingerprint, so a half-written park can't satisfy the fast-path.
    Cross-session note: the default session catalog is in-memory, so the
    fingerprint fast-path (which needs ``tableExists``) only fires within
    one session; cross-session layout reuse requires a persistent
    metastore (``enableHiveSupport`` / a shared Derby metastore_db), at
    which point the same marker+fingerprint check applies unchanged."""
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse"
    ).removeprefix("file:")
    location = os.path.join(warehouse, table)
    marker = os.path.join(warehouse, f"{table}.park_marker")
    legacy = os.path.join(warehouse, f"{table}.fingerprint")
    owned = os.path.exists(marker) or os.path.exists(legacy)
    if (
        fingerprint is not None
        and spark.catalog.tableExists(table)
        and os.path.exists(marker)
        and open(marker).read() == fingerprint
    ):
        return spark.table(table)
    if spark.catalog.tableExists(table) and not owned:
        # someone else's catalog table: mode('overwrite') would drop and
        # rewrite it and we would then stamp a marker claiming ownership
        raise ValueError(
            f"park_bucketed: table {table!r} exists in the catalog but "
            f"has no {os.path.basename(marker)} — refusing to overwrite "
            "a table this helper did not park; drop it manually or "
            "choose another table name"
        )
    if not spark.catalog.tableExists(table) and os.path.exists(location):
        # the session catalog is in-memory: a previous session's parked
        # files outlive their table entry, and saveAsTable refuses to
        # reuse the orphaned location.  Clear it ONLY if our marker proves
        # this helper created it; anything else is not ours to delete.
        if not owned:
            raise ValueError(
                f"park_bucketed: {location} exists but has no "
                f"{os.path.basename(marker)} — refusing to delete a "
                "directory this helper did not park; remove it manually "
                "or choose another table name"
            )
        shutil.rmtree(location)
        for m in (marker, legacy):
            if os.path.exists(m):
                os.remove(m)
    # claim ownership BEFORE the write: a crash inside saveAsTable must
    # leave a marker-bearing location (reclaimed on the next park), not a
    # marker-less wedge; the sentinel never equals a real fingerprint.
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as fh:
        fh.write("__park_in_progress__")
    (
        df.write.bucketBy(num_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    )
    with open(marker, "w") as fh:
        fh.write(fingerprint if fingerprint is not None else "parked")
    return spark.table(table)


def bucketed_merge_join(
    left: DataFrame, right: DataFrame, key: str, how: str = "inner"
) -> DataFrame:
    """Sort-merge join over two relations bucketed on ``key``: with equal
    bucket counts both sides' outputPartitioning already satisfies the
    join's distribution, so the plan contains NO Exchange (the
    CompositeInputFormat property at the plan level)."""
    return left.hint("merge").join(right, key, how)
