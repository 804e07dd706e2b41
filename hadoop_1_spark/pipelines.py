"""Domain pipelines shipped with the reference, re-expressed Spark-first
(SURVEY.md §2.11).

- inverted_index : contrib/index shape (IndexUpdater.java:40,
  IntermediateForm.java:46) — map: doc -> analyzed terms; combine/reduce:
  merge per-term postings; shard policy = partitioned write. Here the
  whole build is one explode -> groupBy(term) aggregation; Catalyst's
  partial aggregation replaces IntermediateForm combining.
- logalyzer      : tools/Logalyzer.java:53-64,69,97-144 — grep
  (-grep <pattern>) + multi-column sort (-sort col1,col2 -separator) over
  archived logs, as filter(rlike) + orderBy.
- rumen_parse    : tools/rumen (TraceBuilder/JobBuilder, LoggedJob) —
  parse semi-structured job logs into typed records + statistical CDFs
  (percentiles) for simulation input.
- distcp_plan    : tools/DistCp.java:78,96-134 — manifest diff between a
  source and destination file tree: copy what's missing, update what
  differs (-update = size/checksum diff), optionally delete dst-only
  paths (-delete).

Scale notes (100 TB design intent):
- inverted index: one shuffle on term; postings stored sorted; ultra-hot
  terms are the skew risk — AQE skew handling plus an optional df cap
  (dedup.py pattern) if needed. Sharded output = write.partitionBy.
- distcp: the *diff* is a distributed join over file manifests (millions
  of rows, trivially shuffled); the copy itself would be foreachPartition
  against the filesystem — deliberately not executed in queries.
- rumen: JSON parse with an explicit schema (no schema inference scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_1_spark.operators.textops import ws_tokens


def inverted_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted index: per term -> document frequency, total term
    frequency, and a doc_id-sorted postings string "doc:tf,doc:tf,...".

    The postings list is built with sort_array(collect_list(struct(...)))
    so ordering is deterministic; at scale, write.partitionBy(shard) on
    pmod(hash(term), n) reproduces the reference's hashing shard policy
    (contrib/index example/HashingDistributionPolicy.java)."""
    tf = (
        docs.select(F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col(id_col), F.col("tf")))),
                    lambda s: F.concat_ws(":", s[id_col].cast("string"), s["tf"].cast("string")),
                ),
                ",",
            ).alias("postings"),
        )
    )


def apply_index_ops(
    base: DataFrame,
    ops: DataFrame,
    id_col: str = "doc_id",
    op_col: str = "op",
    text_col: str = "text",
    seq_col: str = "seq",
) -> DataFrame:
    """D1: incremental index maintenance — the contrib/index DocumentAndOp
    stream (DocumentAndOp.java:31-38: INSERT carries a new document, DELETE
    a delete term, UPDATE both) applied to a base corpus.

    Latest-wins per document: the base corpus enters as seq=-1 INSERTs, ops
    carry their own sequence, one row_number window over (doc, seq desc)
    keeps each document's newest state, DELETE rows then drop out. ONE
    shuffle on doc_id; compose the result with ``inverted_index`` for the
    updated shards (the reference's IndexUpdater rewrites the affected
    Lucene shard the same way — delete term + re-add)."""
    from pyspark.sql.window import Window

    base_tagged = base.select(
        F.col(id_col),
        F.lit("INSERT").alias(op_col),
        F.col(text_col),
        F.lit(-1).cast("long").alias(seq_col),
    )
    ops_tagged = ops.select(
        F.col(id_col),
        F.col(op_col),
        F.col(text_col),
        F.col(seq_col).cast("long"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col(seq_col).desc())
    return (
        base_tagged.unionByName(ops_tagged)
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(op_col) != "DELETE"))
        .select(id_col, text_col)
    )


def logalyzer(
    logs: DataFrame,
    grep_pattern: str,
    sort_cols: list[str],
    ascending: list[bool] | None = None,
) -> DataFrame:
    """Logalyzer: filter lines matching -grep, order by -sort columns.
    The reference's <separator>-split columns are already real columns
    here; the sort compiles to orderBy exprs (a total-order sort, O1)."""
    if ascending is None:
        ascending = [True] * len(sort_cols)
    order = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in zip(sort_cols, ascending)
    ]
    matched = logs.where(
        F.concat_ws("\t", *[F.col(c).cast("string") for c in logs.columns]).rlike(grep_pattern)
    )
    return matched.orderBy(*order)


PROPS_SCHEMA = "struct<k: bigint>"


def rumen_parse(events: DataFrame) -> DataFrame:
    """Rumen-style trace statistics: parse the JSON props payload with an
    explicit schema, then per event_type emit count + exact percentile CDF
    points of the numeric payload (the reference computes CDFs of task
    runtimes for simulation; percentile() is the Spark-native form)."""
    typed = events.select(
        "event_type", F.from_json(F.col("props"), PROPS_SCHEMA).getField("k").alias("k")
    )
    pct = lambda p: F.round(F.percentile(F.col("k"), F.lit(p)), 6)  # noqa: E731
    return typed.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        pct(0.25).alias("p25"),
        pct(0.5).alias("p50"),
        pct(0.75).alias("p75"),
        pct(0.95).alias("p95"),
    )


def distcp_plan(src: DataFrame, dst: DataFrame, delete: bool = True) -> DataFrame:
    """DistCp -update [-delete] manifest diff. Inputs: (path, size)
    manifests. Output: (path, action) with copy/update/skip/delete.

    Full outer join on path — the only shuffle; at 100 TB of *files* the
    manifests are still small rows and AQE handles the skewless join."""
    s = src.select(F.col("path"), F.col("size").alias("src_size"))
    d = dst.select(F.col("path"), F.col("size").alias("dst_size"))
    joined = s.join(d, "path", "full_outer")
    action = (
        F.when(F.col("dst_size").isNull(), F.lit("copy"))
        .when(F.col("src_size").isNull(), F.lit("delete") if delete else F.lit("ignore"))
        .when(F.col("src_size") != F.col("dst_size"), F.lit("update"))
        .otherwise(F.lit("skip"))
    )
    out = joined.select("path", action.alias("action"))
    return out if delete else out.where(F.col("action") != "ignore")


def distch_plan(manifest: DataFrame) -> DataFrame:
    """DistCh parity (tools/DistCh.java:56): parallel chmod/chown plan.
    Input: (path, owner, perm, target_owner, target_perm) manifest; output
    the rows needing a change with the ops to apply. Same distributed
    manifest pattern as distcp — the mutation itself would run in
    foreachPartition against the filesystem."""
    need_chown = F.col("owner") != F.col("target_owner")
    need_chmod = F.col("perm") != F.col("target_perm")
    return (
        manifest.where(need_chown | need_chmod)
        .select(
            "path",
            F.concat_ws(
                ",",
                F.when(need_chown, F.lit("chown")),
                F.when(need_chmod, F.lit("chmod")),
            ).alias("ops"),
            "target_owner",
            "target_perm",
        )
    )


def xml_records(lines: DataFrame, begin: str, end: str, col: str = "line") -> DataFrame:
    """StreamXmlRecordReader parity (contrib/streaming
    StreamXmlRecordReader.java:46,52-61): extract records delimited by
    begin/end patterns from text. Implemented per-line with
    regexp_extract_all (records spanning lines need a whole-file read —
    `spark.read.text(wholetext)` — then the same extract)."""
    # Bind the pattern as a literal column — never interpolated into SQL
    # text, so quotes/backslashes in the begin/end patterns are safe.
    pat = F.lit(f"{begin}(.*?){end}")
    return lines.select(
        F.explode(F.regexp_extract_all(F.col(col), pat, F.lit(1))).alias("record")
    )


class VaidyaRule:
    """One declarative diagnostic rule: a boolean test over counter columns
    plus an impact expression in [0,1] — the DataFrame form of Vaidya's
    DiagnosticTest (contrib/vaidya/.../PostExPerformanceDiagnoser.java:43,
    rules declared in XML with evaluate()/getImpactLevel())."""

    def __init__(self, name: str, test, impact):
        self.name = name
        self.test = test
        self.impact = impact


def vaidya_diagnose(counters: DataFrame, rules: list[VaidyaRule], *id_cols: str) -> DataFrame:
    """Rule-based post-mortem diagnosis: evaluate every rule against every
    job's counter row, emit (job, rule, impact) for the rules that fire.

    One narrow pass (explode of a constant-width rule array) — no shuffle;
    at 100 TB of job histories this is a scan-shaped analytics query."""
    reports = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                r.test.alias("fired"),
                F.round(r.impact, 6).alias("impact"),
            )
            for r in rules
        ]
    )
    return (
        counters.select(*id_cols, F.explode(reports).alias("r"))
        .where(F.col("r.fired"))
        .select(*id_cols, F.col("r.rule").alias("rule"), F.col("r.impact").alias("impact"))
    )


def history_task_summary(attempts: DataFrame) -> DataFrame:
    """D6: HistoryViewer.printTaskSummary (HistoryViewer.java:276-330) —
    per (job, task type): attempt count, failed/killed counts, and the
    type's timeline envelope (earliest start, latest finish). One hash
    aggregation; at 100 TB of job history this is a scan-shaped rollup."""
    return (
        attempts.groupBy("job_id", "task_type")
        .agg(
            F.count("*").cast("long").alias("total"),
            F.sum((F.col("status") == "FAILED").cast("long")).cast("long").alias("failed"),
            F.sum((F.col("status") == "KILLED").cast("long")).cast("long").alias("killed"),
            F.min("start_ms").cast("long").alias("started"),
            F.max("finish_ms").cast("long").alias("finished"),
        )
    )


def history_job_analysis(attempts: DataFrame, worst_k: int = 10) -> DataFrame:
    """D6: HistoryViewer.printJobAnalysis/printAnalysis
    (HistoryViewer.java:440-560): over each task's first SUCCESS attempt,
    per (job, type) — average duration (Java long division), best task
    time, and the worst-``worst_k`` list "task:ms" sorted slowest-first
    (ties by task_id asc). MAP duration = finish-start; REDUCE rows also
    report the shuffle (shuffle_finished-start) and reduce
    (finish-shuffle_finished) phase averages.

    Two exchanges: the first-success row_number window on task_id and the
    (job, type) aggregation; the worst-k list is a bounded sort_array slice
    (same working set as the reference's in-memory Arrays.sort)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("job_id", "task_id").orderBy("attempt_id")
    first_ok = (
        attempts.where(F.col("status") == "SUCCESS")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    dur = F.col("finish_ms") - F.col("start_ms")
    shuffle_ms = F.col("shuffle_finish_ms") - F.col("start_ms")
    reduce_ms = F.col("finish_ms") - F.col("shuffle_finish_ms")
    per_task = first_ok.select(
        "job_id",
        "task_type",
        "task_id",
        dur.alias("dur"),
        F.when(F.col("task_type") == "REDUCE", shuffle_ms).alias("shf"),
        F.when(F.col("task_type") == "REDUCE", reduce_ms).alias("red"),
    )
    worst = F.slice(
        F.sort_array(
            F.collect_list(F.struct((-F.col("dur")).alias("nd"), F.col("task_id").alias("t")))
        ),
        1,
        worst_k,
    )
    return (
        per_task.groupBy("job_id", "task_type")
        .agg(
            F.count("*").cast("long").alias("n_success"),
            # Java: avg += dur; avg /= n  (integer division)
            F.floor(F.sum("dur") / F.count("*")).cast("long").alias("avg_ms"),
            F.min("dur").cast("long").alias("best_ms"),
            F.floor(F.sum("shf") / F.count("shf")).cast("long").alias("avg_shuffle_ms"),
            F.floor(F.sum("red") / F.count("red")).cast("long").alias("avg_reduce_ms"),
            F.array_join(
                F.transform(
                    worst,
                    lambda s: F.concat_ws(":", s["t"].cast("string"), (-s["nd"]).cast("string")),
                ),
                ",",
            ).alias("worst_tasks"),
        )
    )
