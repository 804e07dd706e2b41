"""File-level data skipping: min/max stats manifests over range-sorted
parquet layouts (the Iceberg/Delta manifest-pruning idea, built from
plain parquet + a stats relation).

Reference anchor: MapFileOutputFormat's sorted-write + getEntry lookup
(mapred/MapFileOutputFormat.java:79 — write sorted, then seek only the
part that can hold the key). File-level min/max pruning is the same
contract lifted to a column-stats manifest: a range-sorted write gives
each file a disjoint key envelope, and a range predicate then names the
few files it can touch before any scan starts.

Scale notes (100 TB design intent):
- the manifest is O(files), not O(rows) — the metadata plane. At 100 TB
  with 128 MB files that is ~800k rows: still a driver-trivial relation,
  exactly what Iceberg keeps in manifest files.
- pruning happens at PLANNING time: the pruned read lists the selected
  files and hands ONLY those paths to the scan, so unselected files are
  never opened (parquet row-group skipping would still open every
  footer; file pruning skips the open).
- the residual predicate stays on the scan (pushed to parquet), so
  correctness never depends on the manifest being fresh-enough — a stale
  manifest can only over-select files, never wrong rows, as long as it
  covers every live file (enforced by building it from the same listing
  the read uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_range_sorted(
    df: DataFrame, path: str, col: str, n_files: int
) -> None:
    """Range-sorted parquet layout: repartitionByRange on ``col`` (sampled
    range partitioner — disjoint per-file envelopes) + in-file sort (so
    parquet row-group stats are tight too), one file per partition."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(spark: SparkSession, path: str, col: str) -> DataFrame:
    """Build the min/max manifest for one stats column: (file, min_v,
    max_v, n_rows). One scan of ONLY the stats column (column pruning
    keeps the read narrow); a production pipeline builds this at write
    time and appends — the relation is O(files) either way."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(col).alias("min_v"),
            F.max(col).alias("max_v"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


def pruned_read(
    spark: SparkSession,
    stats: DataFrame,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int]:
    """Plan a range read [lo, hi] against the manifest: select the files
    whose [min_v, max_v] envelope overlaps the predicate, scan only
    those, and keep the exact residual filter on the scan. Returns
    (DataFrame, files_selected).

    The manifest collect() is the PLANNER's metadata step over the
    O(files) relation — the same driver-side role Iceberg's manifest
    evaluation plays — never a data read."""
    picked = [
        r["file"]
        for r in stats.where(
            (F.col("max_v") >= F.lit(lo)) & (F.col("min_v") <= F.lit(hi))
        ).collect()
    ]
    n = len(picked)
    if n == 0:
        any_file = stats.select("file").first()
        if any_file is None:
            raise ValueError("pruned_read: empty manifest — nothing was written")
        schema = spark.read.parquet(any_file["file"]).schema
        return spark.createDataFrame([], schema), 0
    df = spark.read.parquet(*picked).where(F.col(col).between(lo, hi))
    return df, n
