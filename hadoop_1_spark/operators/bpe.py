"""Distributed BPE (byte-pair-encoding) merge learning over a corpus.

The canonical subword-vocabulary trainer for LLM data pipelines
(Sennrich et al. 2016): starting from characters, repeatedly merge the
most frequent adjacent symbol pair. The reference engine has nothing
like it — its text surface stops at token counting
(mapred/lib/TokenCountMapper.java:35) — but a training-data engine needs
the trainer itself, and its distributed shape is a showcase of the
classic BPE scale trick:

- the CORPUS is scanned exactly once, to build the word-frequency vocab
  (a wordcount — one map-side-combined shuffle);
- every merge round then runs over the VOCAB relation only (distinct
  words × their char sequences), so iteration cost is vocab-sized, not
  corpus-sized. At 100 TB the vocab is millions of rows where the corpus
  is trillions of tokens — the rounds are effectively free next to the
  scan.

Per round: adjacent symbol pairs are counted weighted by word frequency
(one vocab-sized aggregation), the argmax pair is taken with a
deterministic tie-break (count desc, left asc, right asc), and every
word's symbol sequence applies the merge via a single literal string
replace. The argmax is ONE 1-row driver read per round — the same
bounded-driver-action discipline as cluster_kmeans' centroid fold and
connected_components' fixpoint scalar.

Cross-engine determinism: symbol sequences are delimiter-framed strings
("\\x01a\\x01\\x01b\\x01" for symbols [a, b]) so a pair replace is an
unambiguous literal substring replace — both Spark's ``replace`` and
DuckDB's ``replace`` scan left-to-right non-overlapping over the
ORIGINAL string, so engines agree bit-for-bit (including the edge where
three identical symbols in a row merge only the first pair in a round).
All counts are exact integers. The delimiter is chr(1), which cannot
appear in whitespace-tokenized text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_1_spark.operators.caching import persist_tracked
from hadoop_1_spark.operators.textops import ws_tokens

D = "\x01"  # symbol delimiter; every symbol s is framed as D+s+D


def _char_seq(word: Column) -> Column:
    """Initial symbol sequence: each character framed in delimiters."""
    return F.regexp_replace(word, "(.)", f"{D}$1{D}")


def _symbols(seq: Column) -> Column:
    """Symbol array from a framed sequence: strip the outer frame chars,
    split on the double delimiter."""
    inner = seq.substr(F.lit(2), F.length(seq) - 2)
    return F.split(inner, D + D)


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, seq): the one corpus-sized step — a wordcount — plus
    the initial char-level symbol framing."""
    toks = df.select(F.explode(ws_tokens(F.col(text_col))).alias("word"))
    return (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select("word", "freq", _char_seq(F.col("word")).alias("_seq"))
    )


def bpe_merges(df: DataFrame, rounds: int = 8, text_col: str = "text") -> DataFrame:
    """Learn ``rounds`` BPE merges; returns (rank, lhs, rhs, merged, cnt).

    Plan shape: one corpus scan (persisted vocab), then per round one
    vocab-sized pair aggregation whose 1-row argmax is read to the driver
    (the bounded per-round driver action this repo's k-means / connected-
    components operators use) and folded back into the next round's plan
    as string LITERALS — so every round's sequence column is a pure
    narrow projection chain over the cached vocab, lineage stays linear,
    and no DataFrame branch is ever recomputed. (The first cut carried
    the argmax as a 1-row crossJoin instead; with each round's plan
    referenced by both the next round AND the final union, lineage
    branched 2-ways per round — ~2^rounds stage re-executions. The
    driver-literal fold is what keeps iteration linear, exactly as in
    cluster_kmeans.)"""
    vocab = persist_tracked(word_vocab(df, text_col))
    cur = vocab
    spark = df.sparkSession
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        syms = cur.select("freq", _symbols(F.col("_seq")).alias("_toks"))
        n = F.size("_toks")
        pairs = syms.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("_toks", 1, F.greatest(n - 1, F.lit(0))),
                    F.slice("_toks", 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                )
            ).alias("_p"),
        )
        counts = pairs.groupBy("_p.lhs", "_p.rhs").agg(
            F.sum("freq").cast("bigint").alias("cnt")
        )
        top = counts.orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs")).limit(1).collect()
        if not top:
            break  # no adjacent pairs left anywhere (degenerate corpus)
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        merges.append((r, lhs, rhs, cnt))
        cur = cur.select(
            "word",
            "freq",
            F.replace(
                F.col("_seq"),
                F.lit(f"{D}{lhs}{D}{D}{rhs}{D}"),
                F.lit(f"{D}{lhs}{rhs}{D}"),
            ).alias("_seq"),
        )
    out = spark.createDataFrame(
        [(r, lhs, rhs, lhs + rhs, cnt) for r, lhs, rhs, cnt in merges],
        "rank int, lhs string, rhs string, merged string, cnt bigint",
    )
    return out


def segment(df: DataFrame, merges: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Apply learned merges to segment documents: (id, symbols array).

    The merge list is small (vocab-budget-sized) and is applied as a
    chain of literal replaces via one ordered collect of the merge table
    — bounded driver state, like a tokenizer file shipped to executors."""
    rows = sorted(merges.collect(), key=lambda r: r["rank"])
    toks = df.select(F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("word"))
    seq = _char_seq(F.col("word"))
    for r in rows:
        seq = F.replace(
            seq,
            F.lit(f"{D}{r['lhs']}{D}{D}{r['rhs']}{D}"),
            F.lit(f"{D}{r['lhs']}{r['rhs']}{D}"),
        )
    return toks.withColumn("_s", seq).select(
        F.col(id_col),
        F.col("word"),
        F.split(F.expr("substring(_s, 2, length(_s) - 2)"), D + D).alias("symbols"),
    )


def bpe_oracle_sql(toks_expr: str, rounds: int = 8) -> str:
    """DuckDB replay: same vocab, same per-round argmax + literal replace.
    Generated as ``rounds`` chained CTE blocks."""
    d = "chr(1)"
    parts = [
        f"""WITH v0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         regexp_replace(word, '(.)', {d} || '\\1' || {d}, 'g') AS seq
  FROM (SELECT unnest({toks_expr}) AS word FROM documents)
  GROUP BY word
)"""
    ]
    for r in range(1, rounds + 1):
        prev = f"v{r - 1}"
        parts.append(
            f"""p{r} AS (
  SELECT toks[j] AS lhs, toks[j + 1] AS rhs, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (
    SELECT freq, toks, unnest(range(1, len(toks))) AS j
    FROM (SELECT freq,
                 string_split(substr(seq, 2, length(seq) - 2), {d} || {d}) AS toks
          FROM {prev})
  )
  GROUP BY 1, 2
),
t{r} AS (SELECT * FROM p{r} ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
v{r} AS (
  SELECT word, freq,
         replace(seq, {d} || lhs || {d} || {d} || rhs || {d},
                 {d} || lhs || rhs || {d}) AS seq
  FROM {prev}, t{r}
)"""
        )
        # empty-symbol words can't occur (ws_tokens drops empties)
    selects = [
        f"SELECT CAST({r} AS INT) AS rank, lhs, rhs, lhs || rhs AS merged, cnt FROM t{r}"
        for r in range(1, rounds + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def bpe_segment_oracle_sql(toks_expr: str, rounds: int = 8) -> str:
    """DuckDB replay of bpe_merges + segment: learn the merges with the
    same CTE chain, then apply them to every token occurrence as nested
    literal replaces (scalar subqueries pull each round's pair; a
    chr(2) sentinel no-ops a round that produced no merge, mirroring the
    Spark side's shorter merge list)."""
    d = "chr(1)"
    head = bpe_oracle_sql(toks_expr, rounds)
    # reuse the WITH chain of bpe_oracle_sql, drop its final UNION ALL of
    # per-round SELECTs (the chain ends before the FIRST of them)
    with_chain = head[: head.index("\nSELECT CAST(1 AS INT) AS rank")]
    rep = f"regexp_replace(word, '(.)', {d} || '\\1' || {d}, 'g')"
    for r in range(1, rounds + 1):
        search = (
            f"coalesce((SELECT {d} || lhs || {d} || {d} || rhs || {d} FROM t{r}), chr(2))"
        )
        repl = f"coalesce((SELECT {d} || lhs || rhs || {d} FROM t{r}), chr(2))"
        rep = f"replace({rep}, {search}, {repl})"
    return f"""{with_chain},
toksrc AS (SELECT doc_id, unnest({toks_expr}) AS word FROM documents),
applied AS (SELECT doc_id, word, {rep} AS s FROM toksrc)
SELECT doc_id, word,
       replace(substr(s, 2, length(s) - 2), {d} || {d}, ' ') AS seg
FROM applied
"""


def vocab_table(df: DataFrame, rounds: int = 8, text_col: str = "text") -> DataFrame:
    """The tokenizer's vocabulary artifact: every base character symbol
    (ordered ascending, ids 1..C) followed by the learned merges in rank
    order (ids C+1..C+rounds). (symbol, token_id, kind, cnt): base rows
    carry their corpus character frequency, merge rows the pair count at
    merge time — the (vocab.json, merges.txt) pair of a BPE tokenizer as
    one relation."""
    merges = bpe_merges(df, rounds=rounds, text_col=text_col)
    chars = (
        df.select(F.explode(ws_tokens(F.col(text_col))).alias("word"))
        .select(F.explode(F.split(F.regexp_replace("word", "(.)", "$1\n"), "\n")).alias("symbol"))
        .where(F.col("symbol") != "")
        .groupBy("symbol")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("symbol")
    base = chars.select(
        "symbol",
        F.row_number().over(w).cast("int").alias("token_id"),
        F.lit("char").alias("kind"),
        "cnt",
    )
    n_chars = chars.agg(F.count(F.lit(1)).alias("_c"))
    merged = merges.crossJoin(F.broadcast(n_chars)).select(
        F.col("merged").alias("symbol"),
        (F.col("rank") + F.col("_c")).cast("int").alias("token_id"),
        F.lit("merge").alias("kind"),
        "cnt",
    )
    return base.unionByName(merged)


def vocab_oracle_sql(toks_expr: str, rounds: int = 8) -> str:
    """DuckDB replay of vocab_table (reuses the merge-training chain)."""
    head = bpe_oracle_sql(toks_expr, rounds)
    with_chain = head[: head.index("\nSELECT CAST(1 AS INT) AS rank")]
    merge_union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS rank, lhs, rhs, lhs || rhs AS merged, cnt FROM t{r}"
        for r in range(1, rounds + 1)
    )
    return f"""{with_chain},
chars AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(string_split_regex(regexp_replace(word, '(.)', '\\1' || chr(10), 'g'), chr(10))) AS symbol
    FROM (SELECT unnest({toks_expr}) AS word FROM documents)
  )
  WHERE symbol <> ''
  GROUP BY symbol
),
base AS (
  SELECT symbol, CAST(row_number() OVER (ORDER BY symbol) AS INT) AS token_id,
         'char' AS kind, cnt
  FROM chars
),
nc AS (SELECT count(*) AS c FROM chars),
mg AS ({merge_union})
SELECT symbol, token_id, kind, cnt FROM base
UNION ALL
SELECT mg.merged AS symbol, CAST(mg.rank + nc.c AS INT) AS token_id,
       'merge' AS kind, mg.cnt
FROM mg, nc
"""
