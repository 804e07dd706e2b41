"""Domain-pipeline queries (SURVEY.md §2.11): inverted index build,
Logalyzer grep+sort, Rumen-style CDF statistics, DistCp manifest diff.

The distcp query diffs two deterministic synthetic manifests derived from
documents (src tree vs a dst tree with every 7th file missing, every 5th
size-drifted, plus a few dst-only strays) — the same manifest-join the
real tool would run over `input_file_name()` listings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark import pipelines
from hadoop_1_spark.registry import _load, register

_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"


@register(
    "index_build",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       string_agg(doc_id::VARCHAR || ':' || tf::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY term
""",
)
def index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed inverted-index build over documents (contrib/index)."""
    return pipelines.inverted_index(_load(spark, sf_dir, "documents"))


@register(
    "logalyzer_grep_sort",
    oracle="""
SELECT event_type, user_id, value
FROM events
WHERE regexp_matches(event_type, 'error|purchase')
""",
)
def logalyzer_grep_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logalyzer: grep 'error|purchase' + sort by (value desc, user_id).
    The grep runs over the whole tab-joined record (the reference greps
    raw lines); on this schema only event_type can match."""
    logs = _load(spark, sf_dir, "events").select("event_type", "user_id", "value")
    return pipelines.logalyzer(
        logs, "error|purchase", ["value", "user_id"], ascending=[False, True]
    )


@register(
    "rumen_cdf",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(k, 0.25), 6) AS p25,
       round(quantile_cont(k, 0.5), 6) AS p50,
       round(quantile_cont(k, 0.75), 6) AS p75,
       round(quantile_cont(k, 0.95), 6) AS p95
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
""",
)
def rumen_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rumen-style typed JSON parse + percentile CDF per event type."""
    return pipelines.rumen_parse(_load(spark, sf_dir, "events"))


_SRC_SQL = "SELECT source || '/' || doc_id || '.txt' AS path, n_chars AS size FROM documents"
_DST_SQL = """
SELECT source || '/' || doc_id || '.txt' AS path,
       n_chars + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS size
FROM documents WHERE doc_id % 7 <> 0
UNION ALL
SELECT 'stray/' || doc_id || '.tmp' AS path, doc_id AS size
FROM documents WHERE doc_id % 97 = 3
"""


def _manifests(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = _load(spark, sf_dir, "documents")
    src = docs.select(
        F.concat_ws("/", F.col("source"), F.concat(F.col("doc_id").cast("string"), F.lit(".txt"))).alias("path"),
        F.col("n_chars").alias("size"),
    )
    dst = (
        docs.where(F.col("doc_id") % 7 != 0)
        .select(
            F.concat_ws(
                "/", F.col("source"), F.concat(F.col("doc_id").cast("string"), F.lit(".txt"))
            ).alias("path"),
            (F.col("n_chars") + F.when(F.col("doc_id") % 5 == 0, 1).otherwise(0)).alias("size"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 97 == 3).select(
                F.concat(F.lit("stray/"), F.col("doc_id").cast("string"), F.lit(".tmp")).alias("path"),
                F.col("doc_id").alias("size"),
            )
        )
    )
    return src, dst


@register(
    "distcp_manifest_diff",
    oracle=f"""
WITH src AS ({_SRC_SQL}), dst AS ({_DST_SQL})
SELECT coalesce(src.path, dst.path) AS path,
       CASE WHEN dst.path IS NULL THEN 'copy'
            WHEN src.path IS NULL THEN 'delete'
            WHEN src.size <> dst.size THEN 'update'
            ELSE 'skip' END AS action
FROM src FULL OUTER JOIN dst ON src.path = dst.path
""",
)
def distcp_manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DistCp -update -delete plan from a src/dst manifest full-outer
    diff (tools/DistCp.java:96-134)."""
    src, dst = _manifests(spark, sf_dir)
    return pipelines.distcp_plan(src, dst, delete=True)


@register(
    "distch_plan",
    oracle="""
WITH m AS (
  SELECT source || '/' || doc_id || '.txt' AS path,
         'u' || (doc_id % 3) AS owner,
         CASE WHEN doc_id % 2 = 0 THEN '644' ELSE '755' END AS perm,
         'u0' AS target_owner,
         '644' AS target_perm
  FROM documents
)
SELECT path,
       concat_ws(',',
         CASE WHEN owner <> target_owner THEN 'chown' END,
         CASE WHEN perm <> target_perm THEN 'chmod' END) AS ops,
       target_owner, target_perm
FROM m
WHERE owner <> target_owner OR perm <> target_perm
""",
)
def distch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DistCh chmod/chown plan over a synthetic permission manifest
    (tools/DistCh.java:56)."""
    docs = _load(spark, sf_dir, "documents")
    manifest = docs.select(
        F.concat_ws(
            "/", F.col("source"), F.concat(F.col("doc_id").cast("string"), F.lit(".txt"))
        ).alias("path"),
        F.concat(F.lit("u"), (F.col("doc_id") % 3).cast("string")).alias("owner"),
        F.when(F.col("doc_id") % 2 == 0, "644").otherwise("755").alias("perm"),
        F.lit("u0").alias("target_owner"),
        F.lit("644").alias("target_perm"),
    )
    return pipelines.distch_plan(manifest)


@register(
    "xml_records",
    oracle="""
SELECT unnest(regexp_extract_all(
         '<r>' || lang || '</r><r>' || source || '</r>', '<r>(.*?)</r>', 1)) AS record
FROM documents
""",
)
def xml_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StreamXmlRecordReader: begin/end-pattern record extraction over a
    synthesized XML column."""
    docs = _load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("<r>"), F.col("lang"), F.lit("</r><r>"), F.col("source"), F.lit("</r>")
        ).alias("line")
    )
    return pipelines.xml_records(docs, "<r>", "</r>")


@register(
    "wordcount_salted",
    oracle="""
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
""",
)
def wordcount_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe wordcount: two-stage salted aggregation (hot tokens spread
    over 16 salt shards, then recombined). Result is identical to the
    direct groupBy — the oracle is plain wordcount."""
    from hadoop_1_spark.operators.skew import salted_aggregate
    from hadoop_1_spark.operators.textops import ws_tokens

    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id"), F.explode(ws_tokens(F.col("text"))).alias("token")
    )
    out = salted_aggregate(
        toks,
        key="token",
        salt_n=16,
        salt_src=F.col("doc_id"),
        partials=[("cnt", lambda c: F.count("*"), lambda c: F.sum(c))],
    )
    return out.select("token", F.col("cnt").cast("long").alias("cnt"))


@register(
    "vaidya_diagnosis",
    oracle="""
WITH counters AS (
  SELECT user_id,
         count(*) AS n,
         count(*) FILTER (WHERE event_type = 'error') AS n_error,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
         max(value) AS max_value
  FROM events GROUP BY user_id
)
SELECT user_id, 'HighErrorRatio' AS rule,
       round(n_error * 1.0 / n, 6) AS impact
FROM counters WHERE n_error * 1.0 / n > 0.25
UNION ALL
SELECT user_id, 'ValueSkew' AS rule,
       round(least(1.0, max_value / (4.0 * (total_value / n))), 6) AS impact
FROM counters WHERE max_value > 4.0 * (total_value / n)
""",
)
def vaidya_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vaidya-style rule-based post-mortem (contrib/vaidya
    PostExPerformanceDiagnoser.java:43): per 'job' (user_id) counters ->
    declarative rules -> fired diagnoses with impact levels. Counters come
    from one grouped pass; rule evaluation is a narrow explode."""
    ev = _load(spark, sf_dir, "events")
    counters = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        F.max("value").alias("max_value"),
    )
    err_ratio = F.col("n_error") * 1.0 / F.col("n")
    avg_value = F.col("total_value") / F.col("n")
    rules = [
        pipelines.VaidyaRule("HighErrorRatio", err_ratio > 0.25, err_ratio),
        pipelines.VaidyaRule(
            "ValueSkew",
            F.col("max_value") > 4.0 * avg_value,
            F.least(F.lit(1.0), F.col("max_value") / (4.0 * avg_value)),
        ),
    ]
    return pipelines.vaidya_diagnose(counters, rules, "user_id")


_EFF_TOKS = _TOKS  # same whitespace tokenizer, applied to the effective corpus


@register(
    "index_update",
    oracle=f"""
WITH eff AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 NOT IN (0, 1)
  UNION ALL
  SELECT doc_id, text || ' refreshed' FROM documents WHERE doc_id % 10 = 1
  UNION ALL
  SELECT doc_id + 1000000, 'new version of doc ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 10 = 2
),
tok AS (SELECT doc_id, unnest({_EFF_TOKS}) AS term FROM eff),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       string_agg(doc_id::VARCHAR || ':' || tf::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY term
""",
)
def index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 incremental index maintenance (contrib/index DocumentAndOp.java:
    31-38): apply a deterministic op stream — every 10th doc DELETEd, every
    (10k+1)th UPDATEd with ' refreshed' appended, a new INSERT per (10k+2)th
    doc — then rebuild the inverted index over the effective corpus.
    Latest-wins window + the index build's two aggregations."""
    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    m = F.col("doc_id") % 10
    dels = docs.where(m == 0).select(
        "doc_id",
        F.lit("DELETE").alias("op"),
        F.lit(None).cast("string").alias("text"),
        F.lit(1).alias("seq"),
    )
    upds = docs.where(m == 1).select(
        "doc_id",
        F.lit("UPDATE").alias("op"),
        F.concat(F.col("text"), F.lit(" refreshed")).alias("text"),
        F.lit(1).alias("seq"),
    )
    ins = docs.where(m == 2).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit("INSERT").alias("op"),
        F.concat(F.lit("new version of doc "), F.col("doc_id").cast("string")).alias("text"),
        F.lit(1).alias("seq"),
    )
    ops = dels.unionByName(upds).unionByName(ins)
    eff = pipelines.apply_index_ops(docs, ops)
    return pipelines.inverted_index(eff)


# --- D6: HistoryViewer task-timeline analytics --------------------------
# Deterministic synthetic attempt log derived from events (the same
# synthesize-from-driver-tables pattern as distcp/distch): job = user
# bucket, task type/status from stable hashes, timeline from ts/value.

_ATT_SQL = """
att AS (
  SELECT (user_id % 4) AS job_id,
         event_id AS task_id,
         0 AS attempt_id,
         CASE WHEN event_id % 10 <= 5 THEN 'MAP'
              WHEN event_id % 10 <= 8 THEN 'REDUCE'
              ELSE 'SETUP' END AS task_type,
         CASE (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 20)
              WHEN 0 THEN 'FAILED' WHEN 1 THEN 'KILLED'
              ELSE 'SUCCESS' END AS status,
         epoch_ms(ts) AS start_ms,
         epoch_ms(ts) + 1000 + CAST(floor(value * 100) AS BIGINT) AS finish_ms,
         epoch_ms(ts) + CAST(floor((1000 + floor(value * 100)) * 3 / 10) AS BIGINT)
           AS shuffle_finish_ms
  FROM events
)
"""


def _attempt_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_1_spark.operators.sampling import md5_mod

    ev = _load(spark, sf_dir, "events")
    start_ms = F.floor(F.unix_micros(F.col("ts")) / 1000).cast("long")
    dur = (F.lit(1000) + F.floor(F.col("value") * 100)).cast("long")
    m10 = F.col("event_id") % 10
    return ev.select(
        F.pmod(F.col("user_id"), F.lit(4)).cast("long").alias("job_id"),
        F.col("event_id").alias("task_id"),
        F.lit(0).alias("attempt_id"),
        F.when(m10 <= 5, "MAP").when(m10 <= 8, "REDUCE").otherwise("SETUP").alias("task_type"),
        F.when(md5_mod(F.col("event_id"), 20) == 0, "FAILED")
        .when(md5_mod(F.col("event_id"), 20) == 1, "KILLED")
        .otherwise("SUCCESS")
        .alias("status"),
        start_ms.alias("start_ms"),
        (start_ms + dur).alias("finish_ms"),
        (start_ms + F.floor(dur * 3 / 10).cast("long")).alias("shuffle_finish_ms"),
    )


@register(
    "history_task_summary",
    oracle=f"""
WITH {_ATT_SQL}
SELECT job_id, task_type,
       CAST(count(*) AS BIGINT) AS total,
       CAST(sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
       CAST(sum(CASE WHEN status = 'KILLED' THEN 1 ELSE 0 END) AS BIGINT) AS killed,
       min(start_ms) AS started,
       max(finish_ms) AS finished
FROM att GROUP BY 1, 2
""",
)
def history_task_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: HistoryViewer.printTaskSummary (HistoryViewer.java:276-330) over
    the synthetic attempt log: per (job, type) attempt/failed/killed counts
    + timeline envelope."""
    return pipelines.history_task_summary(_attempt_log(spark, sf_dir))


@register(
    "history_job_analysis",
    oracle=f"""
WITH {_ATT_SQL},
ok AS (
  SELECT *, finish_ms - start_ms AS dur,
         CASE WHEN task_type = 'REDUCE' THEN shuffle_finish_ms - start_ms END AS shf,
         CASE WHEN task_type = 'REDUCE' THEN finish_ms - shuffle_finish_ms END AS red,
         row_number() OVER (PARTITION BY job_id, task_id ORDER BY attempt_id) AS rn
  FROM att WHERE status = 'SUCCESS'
),
t AS (SELECT * FROM ok WHERE rn = 1),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY job_id, task_type
                               ORDER BY dur DESC, task_id ASC) AS wr
  FROM t
)
SELECT job_id, task_type,
       CAST(count(*) AS BIGINT) AS n_success,
       CAST(floor(sum(dur) / count(*)) AS BIGINT) AS avg_ms,
       CAST(min(dur) AS BIGINT) AS best_ms,
       CAST(floor(sum(shf) / count(shf)) AS BIGINT) AS avg_shuffle_ms,
       CAST(floor(sum(red) / count(red)) AS BIGINT) AS avg_reduce_ms,
       string_agg(CASE WHEN wr <= 10 THEN CAST(task_id AS VARCHAR) || ':' || CAST(dur AS VARCHAR) END,
                  ',' ORDER BY dur DESC, task_id ASC) AS worst_tasks
FROM ranked GROUP BY 1, 2
""",
)
def history_job_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: HistoryViewer.printJobAnalysis/printAnalysis
    (HistoryViewer.java:440-560): per (job, type) over first-SUCCESS
    attempts — avg (Java long division) / best durations, REDUCE
    shuffle/reduce phase averages, and the worst-10 "task:ms" list."""
    return pipelines.history_job_analysis(_attempt_log(spark, sf_dir))


@register(
    "skew_key_report",
    oracle="""
WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
top AS (SELECT * FROM c ORDER BY cnt DESC, event_type LIMIT 10),
r AS (SELECT *, CAST(row_number() OVER (ORDER BY cnt DESC, event_type) AS INT) AS rank FROM top)
SELECT rank, event_type, cnt,
       CAST((cnt * 1000000) // total AS BIGINT) AS share_q6,
       CAST((cnt + 4999) // 5000 AS INT) AS salt_factor
FROM r, t
""",
)
def skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle skew diagnosis over the event stream: the heaviest
    event types with exact q6 table shares and the integer salt factor
    (5k-row target tasks) salted_aggregate/salted_join would need — the
    planning report that decides between a plain, salted, or
    AQE-skew-hinted shuffle before it runs. See skew.skew_key_report."""
    from hadoop_1_spark.operators import skew

    ev = _load(spark, sf_dir, "events")
    return skew.skew_key_report(ev, "event_type", top_n=10, target_rows_per_task=5000)


@register(
    "history_parse_roundtrip",
    oracle="""
SELECT CASE WHEN event_id % 2 = 0 THEN 'MAP' ELSE 'REDUCE' END AS task_type,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(k, 0.5), 6) AS p50_runtime,
       CAST(sum(user_id) AS BIGINT) AS counter_sum,
       TRUE AS all_state_ok
FROM (SELECT event_id, user_id, event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
WHERE k IS NOT NULL
GROUP BY 1
""",
)
def history_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JobHistory grammar end-to-end (mapred/JobHistory.java line format
    + mapred/Counters.java compact counters): every events row is written
    as a Task record — TASKID, TASK_TYPE, START/FINISH_TIME, a
    STATE_STRING packed with every escaped character class ('"', '=',
    '.', backslash), and a COUNTERS compact string carrying user_id —
    then parsed back with the real parser inside the same Arrow batch.
    Aggregates (runtime CDF point, counter sums) come from the PARSED
    records; all_state_ok asserts the nasty string survived. The oracle
    recomputes from the table directly, so any grammar asymmetry
    hash-mismatches. See operators/jobhistory.py."""
    import pandas as pd

    from hadoop_1_spark.operators import jobhistory as jh

    ev = (
        _load(spark, sf_dir, "events")
        .select(
            "event_id", "user_id", "event_type",
            F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k"),
            F.unix_millis(F.col("ts")).alias("start_ms"),
        )
        .where(F.col("k").isNotNull())
    )
    # the Python grammar seam is the cost here, not the exchange: spread
    # it across every core (events at one sf arrives as a single parquet
    # split, which would otherwise serialize the whole codec pass)
    ev = ev.repartition(spark.sparkContext.defaultParallelism)

    def roundtrip(batches):
        for pdf in batches:
            expect = []
            recs = []
            for eid, uid, etype, k, start in zip(
                pdf["event_id"], pdf["user_id"], pdf["event_type"],
                pdf["k"], pdf["start_ms"],
            ):
                eid, uid, k, start = int(eid), int(uid), int(k), int(start)
                state = f'{etype} q="v" a=b c.d\\e.'
                expect.append((state, uid))
                recs.append(jh.format_record("Task", {
                    "TASKID": f"task_{eid}",
                    "TASK_TYPE": "MAP" if eid % 2 == 0 else "REDUCE",
                    "START_TIME": str(start),
                    "FINISH_TIME": str(start + k),
                    "STATE_STRING": state,
                    "COUNTERS": jh.make_counters_compact(
                        [("org.example.G{r}[a]", "USERS(x)", uid)]
                    ),
                }))
            # ONE parse pass over the whole batch's history text (the
            # file-shaped input parse_records is built for) instead of a
            # Python call stack per record — same grammar, ~3x less
            # per-row interpreter overhead in the seam
            parsed = jh.parse_records("\n".join(recs) + "\n")
            assert len(parsed) == len(recs)
            types, runtimes, csums, oks = [], [], [], []
            for (state, uid), (rec_type, kv) in zip(expect, parsed):
                counters = jh.parse_counters(kv["COUNTERS"])
                types.append(kv["TASK_TYPE"])
                runtimes.append(int(kv["FINISH_TIME"]) - int(kv["START_TIME"]))
                csums.append(sum(v for _, _, v in counters))
                oks.append(
                    rec_type == "Task"
                    and kv["STATE_STRING"] == state
                    and counters == [("org.example.G{r}[a]", "USERS(x)", uid)]
                )
            yield pd.DataFrame({
                "task_type": types, "runtime": runtimes,
                "cval": csums, "ok": oks,
            })

    parsed = ev.mapInPandas(
        roundtrip,
        schema="task_type string, runtime bigint, cval bigint, ok boolean",
    )
    return parsed.groupBy("task_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.percentile(F.col("runtime"), F.lit(0.5)), 6).alias("p50_runtime"),
        F.sum("cval").cast("long").alias("counter_sum"),
        F.bool_and("ok").alias("all_state_ok"),
    )
