"""Temporal join operators: as-of join and range (interval) join.

Neither exists in the reference (SURVEY §2.4 'not present: range/as-of/
interval joins') nor as a single Spark DataFrame primitive — they are the
canonical 'custom operator as a composition of existing ops' case
(BASELINE.json north-star: training pipelines constantly align events to
the most recent dimension snapshot, or bucket points into intervals).

Both are built so the expensive part is ONE key shuffle — never a
broadcast-nested-loop or an O(points x intervals) blowup:

- asof_join: union both sides, ONE window over (key, ts) carrying the last
  right-side row forward — the distributed merge-asof. Cost: one shuffle
  on key + a linear in-partition scan. (A join-then-rank formulation
  would materialize every (left, right-earlier) pair first — quadratic in
  rows-per-key.)
- range_join: bin both sides on a fixed width; an interval explodes to
  the bins it covers, a point lands in exactly one bin, so the equi-join
  on bin plus a residual predicate finds every containment exactly once
  (no dedup pass). Bin width trades replication (wide intervals -> more
  bins) against per-bin fan-in; at 100 TB pick ~ the median interval
  width.

Scale notes: the asof window partitions by join key — a pathologically hot
key serializes within its partition (windows cannot be salted without
breaking carry-forward); mitigate upstream by splitting the key's time
range. The range join's shuffle carries (bin, row) pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    direction: str = "backward",
    right_prefix: str = "asof_",
    tolerance: float | None = None,
) -> DataFrame:
    """For every left row, attach the single right row with the largest
    ``ts_col`` <= left's (direction='backward'; 'forward' = smallest >=).
    Inclusive on equality, matching DuckDB's ``ASOF JOIN ... ON l.ts >=
    r.ts``. Left rows with no match keep nulls (left-join semantics).

    Right columns (except the key and ts) come back prefixed with
    ``right_prefix``; right's ts becomes ``{prefix}{ts_col}``.

    ``tolerance`` (pandas merge_asof parity): a match further than this
    from the left row is nulled out — in microseconds for timestamp
    ts_col, in the column's own units for numeric ts_col. The as-of pick
    itself is unchanged (the NEAREST eligible row either matches or the
    left row gets nulls; a further-back row never substitutes).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    rcols = [c for c in right.columns if c not in (on, ts_col)]
    payload = F.struct(
        F.col(ts_col).alias(ts_col), *[F.col(c).alias(c) for c in rcols]
    )
    # A right row with NULL ts can match nothing (ts <= / >= NULL is never
    # true), but under nulls-first ordering its payload would be carried
    # forward into real matches — drop such rows up front.
    right = right.where(F.col(ts_col).isNotNull())
    r = right.select(
        F.col(on),
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_src"),
        payload.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on,)],
    )
    l = left.select(
        F.col(on),
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(c) for c in left.columns if c not in (on,)],
    )
    u = r.unionByName(l)
    # Backward: scan time ascending, right rows (src=0) sort before left
    # rows at equal ts so 'inclusive' sees them; carry the last right
    # payload forward. Forward: the mirrored descending scan. Left rows
    # with NULL ts sort FIRST either way (explicit nulls-first on the
    # desc side) so they precede every right row and match nothing —
    # ts >= NULL is never true, left-join null padding applies. The final
    # payload order key makes ties at equal (ts) deterministic: among
    # right rows sharing a timestamp, the greatest payload struct (field
    # order: ts, then value columns) wins.
    if direction == "backward":
        order = [F.col("_t").asc_nulls_first(), F.col("_src").asc(), F.col("_p").asc()]
    else:
        order = [F.col("_t").desc_nulls_first(), F.col("_src").asc(), F.col("_p").asc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_p", ignorenulls=True).over(w)
    if tolerance is not None:
        from pyspark.sql.types import TimestampNTZType, TimestampType

        is_ts = isinstance(
            left.schema[ts_col].dataType, (TimestampType, TimestampNTZType)
        )
        if is_ts:
            # cast covers NTZ too (unix_micros alone rejects TIMESTAMP_NTZ);
            # the session-tz offset the cast applies cancels in the gap
            to_num = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        else:
            # double, not long: a long cast would floor fractional numeric
            # timestamps and mis-round the gap against the tolerance
            to_num = lambda c: c.cast("double")  # noqa: E731
        gap = F.abs(to_num(F.col("_t")) - to_num(carried.getField(ts_col)))
        carried = F.when(gap <= F.lit(tolerance), carried)
    out = (
        u.withColumn("_match", carried)
        .where(F.col("_src") == 1)
        .select(
            F.col(on),
            *[F.col(c) for c in left.columns if c != on],
            F.col("_match").getField(ts_col).alias(f"{right_prefix}{ts_col}"),
            *[F.col("_match").getField(c).alias(f"{right_prefix}{c}") for c in rcols],
        )
    )
    return out


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Batch sessionization: assign each row a per-key session sequence
    number, where a NEW session starts when the gap to the previous event
    STRICTLY exceeds ``gap_seconds`` (events exactly gap apart share a
    session — the same closed-gap rule as Spark's streaming
    session_window). Adds ``session_seq`` (1-based within key).

    The classic batch formulation: lag(ts) over (key, ts) marks session
    starts, a running sum of the marks numbers them — exactly the gap
    rule Structured Streaming's session_window applies to live data
    (streaming/__init__.py), so batch backfill and the streaming path
    agree on boundaries.

    Determinism: equal timestamps order by ``tie_cols`` (required if key
    + ts can tie); rows with NULL ts are dropped (no position on the
    timeline — same rule as asof_join's null filter).

    Scale shape: ONE shuffle on key_col; both windows share the same
    (key, ts) sort, so Catalyst plans a single Window node over one
    exchange. Linear in-partition scan; hot keys serialize within their
    partition (the asof_join caveat) — split the key's time range
    upstream if a single key's history exceeds a partition.
    """
    tie = tie_cols or []
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tie]]
    w = Window.partitionBy(key_col).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    new_mark = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("session_seq", F.sum(new_mark).over(wrun))
    )


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: for each key, stage i is reached at the
    EARLIEST ``stages[i]`` event at-or-after the stage i-1 time (>=, so a
    same-timestamp follow-up counts), and — when ``max_gap_seconds`` is
    set — no later than that conversion window after it. Returns one row
    per stage: (stage, event_type, n_users) with n_users monotonically
    non-increasing — the classic conversion funnel.

    Shape: ONE data shuffle (the per-key collect; the only other
    exchange is the O(1)-row single-partition final aggregate). Each
    key's qualifying events collect once into a sorted array (the
    reducer-iterator shape, secondary-sort discipline); stage times are
    per-key array filters built from Column lambdas — no SQL string
    interpolation, so stage names may contain any characters — and ALL
    stage counts come from that single final aggregate whose k rows
    explode into the output: never a per-stage join chain or per-stage
    agg branches (k re-shuffles of the data). Per-key event history must
    fit a collect_list — the same bound every sessionization/funnel
    reducer has; split the key's time range upstream for pathological
    keys. NULL-ts events are dropped (no position on the timeline, as in
    sessionize/asof)."""
    if not stages:
        raise ValueError("funnel_stages needs at least one stage")
    ev = (
        events.where(F.col(ts_col).isNotNull())
        .where(F.col(type_col).isin(stages))
        .select(
            F.col(key_col),
            F.struct(
                F.col(ts_col).alias("ts"), F.col(type_col).alias("et")
            ).alias("_e"),
        )
    )
    cur = ev.groupBy(key_col).agg(
        F.array_sort(F.collect_list("_e")).alias("_evs")
    )
    gap = (
        None
        if max_gap_seconds is None
        else F.expr(f"INTERVAL {int(max_gap_seconds)} SECONDS")
    )
    def stage_pred(s, prev_t):
        # single-arg closure (F.filter inspects the lambda's arity, so
        # the stage/prev bindings must not appear as parameters)
        def pred(e):
            c = e["et"] == F.lit(s)
            if prev_t is not None:
                # NULL prev_t (stage i-1 unreached) makes the comparison
                # NULL -> filter drops everything -> stage i unreached
                c = c & (e["ts"] >= prev_t)
                if gap is not None:
                    c = c & (e["ts"] <= prev_t + gap)
            return c

        return pred

    for i, s in enumerate(stages):
        prev_t = F.col(f"_t{i - 1}") if i else None
        cur = cur.withColumn(
            f"_t{i}",
            F.try_element_at(
                F.filter(F.col("_evs"), stage_pred(s, prev_t)), F.lit(1)
            ).getField("ts"),
        )
    counts = cur.agg(
        *[
            F.count(F.col(f"_t{i}")).cast("long").alias(f"_c{i}")
            for i in range(len(stages))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage"),
                F.lit(s).alias("event_type"),
                F.col(f"_c{i}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return counts.select(F.explode(rows).alias("_r")).select(
        "_r.stage", "_r.event_type", "_r.n_users"
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner join of points to the intervals containing them
    (lo <= point < hi, half-open so adjacent intervals never double-match)
    via fixed-width binning: an equi-join on bin + residual predicate,
    instead of the BroadcastNestedLoopJoin Spark would otherwise plan for
    a pure inequality join. Each containment is found exactly once (a
    point has one bin; the covering interval spans it)."""
    bin_of = lambda c: F.floor(c / F.lit(float(bin_width))).cast("long")  # noqa: E731
    binned_iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(bin_of(F.col(lo_col)), bin_of(F.col(hi_col)))),
    )
    binned_pt = points.withColumn("_bin", bin_of(F.col(point_col)))
    return (
        binned_pt.join(binned_iv, "_bin")
        .where((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_bin")
    )


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change stream:
    per key, each change row becomes a versioned interval
    [valid_from_us, valid_to_us) with the successor's timestamp as the
    exclusive upper bound (NULL + is_current for the latest) — the
    warehouse history-table build (Kimball SCD2, public practice; the
    reference's nearest primitive is the secondary-sort grouped
    iteration, mapred O3).

    Determinism: the version order is (ts, tiebreak) — a total order per
    key, so simultaneous changes version identically everywhere.
    Timestamps surface as tz-free epoch micros (the repo's exactness
    convention for temporal outputs).

    Scale: ONE shuffle (partition by key, in-partition sort); lead() is
    a bounded per-key window — at 100 TB keys spread across reducers
    exactly like any secondary-sort job."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    nxt = F.lead(F.unix_micros(F.col(ts_col))).over(w)
    return changes.select(
        F.col(key_col),
        *payload_cols,
        F.unix_micros(F.col(ts_col)).alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w).cast("int").alias("version"),
    )


def interval_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    tie_cols: list[str],
) -> DataFrame:
    """Sweep-line concurrency over CLOSED intervals [start, end]: emits
    every boundary event (+1 at start, -1 past end) tagged with the
    exact number of intervals open after it — the "max concurrent
    sessions / peak load" primitive.

    Classic sweep: boundaries sort by (t, delta DESC, tie_cols) — the
    delta-descending tie puts starts before ends at equal t, which is
    precisely the closed-interval overlap rule (a session ending at t
    and one starting at t ARE concurrent) — and a running sum of deltas
    over that total order is the concurrency. The running sum is
    sort.global_prefix_sum, i.e. a RANGE-SHUFFLED distributed scan: no
    single-partition window anywhere, so the timeline can be 100 TB of
    boundaries and still scan in parallel (the two-pass offset scheme
    carries one row per partition).

    ``tie_cols`` must make (t, delta, *tie_cols) a total order — the
    scan's determinism contract. Integral microsecond timestamps in,
    exact bigint concurrency out."""
    from hadoop_1_spark.operators import sort as sortops

    starts = intervals.select(
        F.col(start_col).alias("t_us"), F.lit(1).cast("long").alias("delta"),
        *[F.col(c) for c in tie_cols],
    )
    ends = intervals.select(
        F.col(end_col).alias("t_us"), F.lit(-1).cast("long").alias("delta"),
        *[F.col(c) for c in tie_cols],
    )
    bounds = starts.unionByName(ends)
    order = [F.col("t_us").asc(), F.col("delta").desc()] + [
        F.col(c).asc() for c in tie_cols
    ]
    return sortops.global_prefix_sum(
        bounds, *order, value_col="delta", out_col="concurrency"
    )


def journey_attribution(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    channel_col: str,
    is_conversion: Column,
) -> DataFrame:
    """First-touch / last-touch conversion attribution over journeys.

    A journey is the run of events between conversions for one key: each
    row's journey id is the EXCLUSIVE running count of prior conversions
    in (ts, tie) order, so every conversion closes journey j = (number of
    conversions before it) and the non-conversion rows of journey j are
    exactly its touchpoints. Credit is a COUNT — whole-conversion credit
    to the journey's first and to its last touchpoint (the two exact
    attribution models; fractional multi-touch splits are deliberately
    out: 1/n credits cannot be summed exactly across engines).
    Conversions with an empty journey credit the '(direct)' channel.

    One shuffle on the key: the journey window, the touch-rank windows,
    and the per-journey rollup all share the (key, ts, tie) sort. The
    per-channel rollup is a channel-bounded aggregation; nothing global.

    Returns (channel, first_touch, last_touch) with zero-filled counts."""
    w = Window.partitionBy("_k").orderBy(F.col("_ts").asc(), F.col("_tie").asc())
    wprior = w.rowsBetween(Window.unboundedPreceding, -1)
    conv = F.when(is_conversion, F.lit(1)).otherwise(F.lit(0))
    rows = df.select(
        F.col(key_col).alias("_k"), F.col(ts_col).alias("_ts"),
        F.col(tie_col).alias("_tie"), F.col(channel_col).alias("_ch"),
        conv.alias("_conv"),
    ).withColumn("_journey", F.coalesce(F.sum("_conv").over(wprior), F.lit(0)))
    from hadoop_1_spark.operators.caching import persist_tracked

    rows = persist_tracked(rows)
    conversions = rows.where(F.col("_conv") == 1).select("_k", "_journey")
    touches = rows.where(F.col("_conv") == 0)
    wj = Window.partitionBy("_k", "_journey").orderBy(
        F.col("_ts").asc(), F.col("_tie").asc()
    )
    wjd = Window.partitionBy("_k", "_journey").orderBy(
        F.col("_ts").desc(), F.col("_tie").desc()
    )
    ranked = touches.select(
        "_k", "_journey", "_ch",
        F.row_number().over(wj).alias("_rn"),
        F.row_number().over(wjd).alias("_rnd"),
    )
    firsts = ranked.where(F.col("_rn") == 1).select(
        "_k", "_journey", F.col("_ch").alias("_first_ch")
    )
    lasts = ranked.where(F.col("_rnd") == 1).select(
        "_k", "_journey", F.col("_ch").alias("_last_ch")
    )
    attributed = (
        conversions.join(firsts, ["_k", "_journey"], "left")
        .join(lasts, ["_k", "_journey"], "left")
        .select(
            F.coalesce(F.col("_first_ch"), F.lit("(direct)")).alias("_fc"),
            F.coalesce(F.col("_last_ch"), F.lit("(direct)")).alias("_lc"),
        )
    )
    f = attributed.groupBy(F.col("_fc").alias("channel")).agg(
        F.count(F.lit(1)).cast("bigint").alias("first_touch")
    )
    l = attributed.groupBy(F.col("_lc").alias("channel")).agg(
        F.count(F.lit(1)).cast("bigint").alias("last_touch")
    )
    return (
        f.join(l, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("first_touch", F.lit(0)).cast("bigint").alias("first_touch"),
            F.coalesce("last_touch", F.lit(0)).cast("bigint").alias("last_touch"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
) -> DataFrame:
    """Interval x interval overlap join (closed intervals: overlap iff
    l_start <= r_end AND r_start <= l_end) as a BINNED EQUI-JOIN — the
    interval-relation sibling of range_join's point-in-interval band
    join, and the declarative replacement for the O(n*m) theta join a
    naive formulation would BNLJ.

    Each interval explodes to the fixed-width bins it touches; the join
    key is the bin, the overlap predicate remains as a residual, and
    each qualifying pair is kept exactly once WITHOUT a distinct: the
    pair is owned by bin = max(first_bin_l, first_bin_r), the first bin
    the two intervals share — a closed-form dedup (the standard spatial
    grid-join ownership trick), so no post-join shuffle.

    Scale: one shuffle on the bin key; replication factor is
    interval_length / bin_width (tune bin_width to the typical interval
    — the range_join bin economics). Long stragglers replicate more;
    cap or split pathological intervals upstream."""
    # integral div, not double division + cast: endpoints at or beyond
    # 2^53 (e.g. nanosecond epochs) would round in the double and can
    # disagree with the ownership formula, silently dropping pairs
    bw = int(bin_width)
    lb = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{l_start} div {bw}"), F.expr(f"{l_end} div {bw}")
            )
        ),
    )
    rb = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{r_start} div {bw}"), F.expr(f"{r_end} div {bw}")
            )
        ),
    )
    own = F.greatest(
        F.expr(f"{l_start} div {bw}"), F.expr(f"{r_start} div {bw}")
    )
    return (
        lb.join(rb, "_bin")
        .where(F.col(l_start) <= F.col(r_end))
        .where(F.col(r_start) <= F.col(l_end))
        .where(F.col("_bin") == own)
        .drop("_bin")
    )


def cdc_merge(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_cols: list[str],
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Apply a CDC change batch to a snapshot — MERGE semantics (the
    Delta/Iceberg MERGE INTO shape) as one union + one keyed window:

    - ``changes`` rows carry op 'U' (upsert, FULL row image — the
      standard CDC contract) or 'D' (delete), ordered per key by
      ``seq_cols`` (latest wins; ties must be broken by the caller's
      seq columns — a total order per key is the determinism contract);
    - snapshot rows participate as base images that every change
      outranks (they sort before all changes);
    - the survivor per key is the highest-seq row; 'D' survivors drop
      the key entirely (delete beats the base row it shadows).

    ONE shuffle on the key for both the union ranking and the output —
    the latest-wins idiom shared with apply_index_ops' DocumentAndOp
    (pipelines.py) and dedup_incremental's batch rule. At 100 TB the
    change batch is delta-sized: the cost is snapshot-scan + key
    shuffle, never snapshot x changes."""
    base = snapshot.select(
        F.col(key_col),
        *[F.col(c) for c in payload_cols],
        F.lit("U").alias("_op"),
        F.lit(0).alias("_chg"),
        *[F.lit(None).cast(changes.schema[s].dataType).alias(f"_s_{s}") for s in seq_cols],
    )
    chg = changes.select(
        F.col(key_col),
        *[F.col(c) for c in payload_cols],
        F.col(op_col).alias("_op"),
        F.lit(1).alias("_chg"),
        *[F.col(s).alias(f"_s_{s}") for s in seq_cols],
    )
    u = base.unionByName(chg)
    w = Window.partitionBy(key_col).orderBy(
        F.asc("_chg"), *[F.asc(f"_s_{s}") for s in seq_cols]
    )
    latest = (
        u.withColumn("_rn", F.row_number().over(w))
        .withColumn("_mx", F.max("_rn").over(Window.partitionBy(key_col)))
        .where(F.col("_rn") == F.col("_mx"))
    )
    return latest.where(F.col("_op") != "D").select(key_col, *payload_cols)
