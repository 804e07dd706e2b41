"""Text-analysis queries over the documents table (north-star extensions:
token counting, quality scoring, language ID, document fingerprinting).

Reference parity anchors: tokenize (mapred/lib/TokenCountMapper.java:35),
regex ops (mapred/lib/RegexMapper.java:42), md5 keys (io/MD5Hash.java:30).
Every oracle reproduces the exact same tokenization + md5-hash contract in
DuckDB SQL so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.operators import bpe, sketches, textops
from hadoop_1_spark.registry import _load, register

_SQL_PUNCT = textops.PUNCT_RE.replace("'", "''")
_SQL_BPE = textops.BPE_RE

# Shared oracle fragment: the whitespace-token array (empties dropped).
_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"
_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in textops.STOPWORDS) + "]"


@register(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '{_SQL_BPE}')) AS BIGINT) AS n_tokens_bpe,
       CAST(length(text) AS BIGINT) AS n_chars,
       round(CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE)
             / greatest(len({_TOKS}), 1), 6) AS mean_token_len
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) per document."""
    return textops.token_stats(_load(spark, sf_dir, "documents"))


@register(
    "text_quality",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS toks,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents
), r AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST}, lower(x)))) AS DOUBLE)
           / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS stop_ratio,
         CAST(len(regexp_extract_all(text, '[{_SQL_PUNCT[1:-1]}]')) AS DOUBLE)
           / greatest(n_chars, 1.0) AS punct_ratio,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
           / greatest(n_chars, 1.0) AS digit_ratio
  FROM t
)
SELECT doc_id,
       round(least(greatest(
         0.4 * least(n_tok / 64.0, 1.0)
         + 0.4 * least(stop_ratio * 4, 1.0)
         + 0.2 * (1.0 - least(punct_ratio * 10 + digit_ratio * 5, 1.0)),
         0.0), 1.0), 6) AS quality,
       round(stop_ratio, 6) AS stop_ratio,
       round(punct_ratio, 6) AS punct_ratio
FROM r
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring per document."""
    return textops.quality_score(_load(spark, sf_dir, "documents"))


def _profile_values() -> str:
    rows = [
        f"('{lang}', '{tok}', {float(w)})"
        for lang, prof in sorted(textops.LANG_PROFILES.items())
        for tok, w in sorted(prof.items())
    ]
    return ", ".join(rows)


@register(
    "text_lang_id",
    oracle=f"""
WITH prof(lang, token, weight) AS (VALUES {_profile_values()}),
toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')) AS token
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
         CAST(sum(CAST(weight AS DECIMAL(18,4))) AS DOUBLE) AS score
  FROM toks JOIN prof USING (token)
  GROUP BY doc_id, lang
),
best AS (
  SELECT doc_id, lang AS lang_pred, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM scored
)
SELECT d.doc_id,
       coalesce(b.lang_pred, 'und') AS lang_pred,
       coalesce(b.score, 0.0) AS score
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via broadcast-joined function-word profiles + argmax."""
    return textops.lang_id(_load(spark, sf_dir, "documents"), spark)


@register(
    "text_fingerprint",
    oracle="""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3 + 2)) AS i FROM t WHERE len(toks) >= 3)
), h AS (
  SELECT doc_id, substr(md5('0:' || shingle), 1, 15) AS h
  FROM sh
), bottom AS (
  SELECT doc_id, list_sort(list(h))[1:4] AS bottom FROM h GROUP BY doc_id
)
SELECT doc_id,
       md5(array_to_string(bottom, ',')) AS fingerprint
FROM bottom
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-4 minhash-sketch fingerprint over 3-token shingles."""
    return textops.fingerprint(_load(spark, sf_dir, "documents"), k=3, s=4)


@register(
    "text_bigrams",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bg AS (
  SELECT array_to_string(toks[i:i+1], ' ') AS bigram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2)
)
SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
FROM bg GROUP BY bigram
""",
)
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency profile (n-gram statistics over the shingle
    primitive with k=2, duplicates kept — the language-model counting
    twin of the dedup shingles)."""
    docs = _load(spark, sf_dir, "documents")
    toks = textops.ws_tokens(F.col("text"))
    bg = (
        docs.select(toks.alias("toks"), F.size(toks).alias("n"))
        .where(F.col("n") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, n - 1), i -> concat_ws(' ', slice(toks, i, 2)))")
            ).alias("bigram")
        )
    )
    return bg.groupBy("bigram").agg(F.count("*").cast("long").alias("cnt"))


PMI_MIN_COUNT = 3


@register(
    "text_pmi_collocations",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uni),
bg AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2)
),
pc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_cnt
  FROM bg GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_COUNT}
)
SELECT pc.w1, pc.w2, pc.pair_cnt, u1.c AS c1, u2.c AS c2, tot.n_tokens,
       CAST(CAST(pc.pair_cnt AS HUGEINT) * tot.n_tokens * 1000000
            // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT) AS pmi_q6
FROM pc
JOIN uni u1 ON pc.w1 = u1.w
JOIN uni u2 ON pc.w2 = u2.w
CROSS JOIN tot
""",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining over adjacent whitespace-token pairs: exact
    integer counts plus the monotone PMI ratio as micro-scaled floor
    division — bit-identical ranking in both engines, no float log."""
    docs = _load(spark, sf_dir, "documents")
    return textops.pmi_collocations(docs, min_count=PMI_MIN_COUNT)


@register(
    "text_repetition",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2)
),
c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
s AS (
  SELECT doc_id, sum(c) AS total, max(c) AS top, count(*) AS n_distinct
  FROM c GROUP BY doc_id
)
SELECT doc_id,
       CAST(total AS BIGINT) AS n_grams,
       round(1 - n_distinct / CAST(total AS DOUBLE), 9) AS dup_gram_frac,
       round(top / CAST(total AS DOUBLE), 9) AS top_gram_frac
FROM s
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (duplicate-bigram fraction and
    top-bigram fraction — the Gopher-style repetition quality filters,
    public pretraining-pipeline practice). Wordcount-shaped: one
    map-side-combined (doc, gram) count shuffle, then a per-doc reduce."""
    return textops.repetition_stats(_load(spark, sf_dir, "documents"), n=2)


# Deterministic PII-bearing lines synthesized from events (the real corpus
# is a clean synthetic vocabulary, so positives are constructed in-query;
# the construction is mirrored in the oracle and varies per row: ~2/3 have
# an email, 1/2 a phone, 1/5 an IP).
_PII_TEXT_SQL = """concat_ws(' ', 'entry',
  CASE WHEN event_id % 3 <> 0
       THEN 'mail u' || CAST(user_id AS VARCHAR) || '@' || event_type || '.net' END,
  CASE WHEN event_id % 2 = 0
       THEN 'call 555-' || lpad(CAST(user_id % 1000 AS VARCHAR), 3, '0')
            || '-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') END,
  CASE WHEN event_id % 5 = 0
       THEN 'from 10.' || CAST(user_id % 256 AS VARCHAR)
            || '.0.' || CAST(event_id % 256 AS VARCHAR) END)"""


@register(
    "corpus_pii_scrub",
    oracle=f"""
WITH d AS (SELECT event_id, {_PII_TEXT_SQL} AS text FROM events),
e AS (
  SELECT event_id,
         CAST(len(regexp_extract_all(text, '{textops.PII_EMAIL_RE}')) AS INT) AS n_emails,
         regexp_replace(text, '{textops.PII_EMAIL_RE}', '[EMAIL]', 'g') AS t1
  FROM d
),
p AS (
  SELECT event_id, n_emails,
         CAST(len(regexp_extract_all(t1, '{textops.PII_PHONE_RE}')) AS INT) AS n_phones,
         regexp_replace(t1, '{textops.PII_PHONE_RE}', '[PHONE]', 'g') AS t2
  FROM e
)
SELECT event_id, n_emails, n_phones,
       CAST(len(regexp_extract_all(t2, '{textops.PII_IP_RE}')) AS INT) AS n_ips,
       regexp_replace(t2, '{textops.PII_IP_RE}', '[IP]', 'g') AS clean_text
FROM p
""",
)
def corpus_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails -> phones -> IPs, counted and redacted) over
    deterministic contact-bearing lines built from events. The operator is
    a single codegen'd projection — the corpus-cleanup stage that sweeps
    the full corpus at scan speed with no shuffle."""
    ev = _load(spark, sf_dir, "events")
    text = F.concat_ws(
        " ",
        F.lit("entry"),
        F.when(
            F.col("event_id") % 3 != 0,
            F.concat(
                F.lit("mail u"), F.col("user_id").cast("string"),
                F.lit("@"), F.col("event_type"), F.lit(".net"),
            ),
        ),
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat(
                F.lit("call 555-"),
                F.lpad((F.col("user_id") % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((F.col("event_id") % 10000).cast("string"), 4, "0"),
            ),
        ),
        F.when(
            F.col("event_id") % 5 == 0,
            F.concat(
                F.lit("from 10."), (F.col("user_id") % 256).cast("string"),
                F.lit(".0."), (F.col("event_id") % 256).cast("string"),
            ),
        ),
    )
    d = ev.select("event_id", text.alias("text"))
    return textops.pii_scrub(d, id_col="event_id")


@register(
    "text_vocab_top",
    oracle=f"""
WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT sum(cnt) AS total FROM c),
top AS (
  SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank
  FROM c ORDER BY cnt DESC, token LIMIT 20
)
SELECT token, CAST(cnt AS BIGINT) AS cnt, CAST(rank AS INT) AS rank,
       round(CAST(sum(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / (SELECT total FROM tot), 9) AS cum_coverage
FROM top
""",
)
def text_vocab_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus vocabulary with cumulative coverage fractions — the
    vocab/token-budget planning step of a pretraining pipeline."""
    return textops.vocab_top(_load(spark, sf_dir, "documents"), k=20)


@register(
    "text_tfidf_topk",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
s AS (
  SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
         CAST(df.df AS BIGINT) AS df,
         CAST((tf.tf * 1000000) // df.df AS BIGINT) AS score_q6
  FROM tf JOIN df USING (token)
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score_q6 DESC, token) AS INT) AS rank
  FROM s
)
SELECT doc_id, token, tf, df, score_q6, rank FROM r WHERE rank <= 3
""",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by integer-quantized
    tf-idf (raw 1/df idf) — keyword extraction for corpus curation. Both
    engines rank identical bigints; see textops.tfidf_topk."""
    return textops.tfidf_topk(_load(spark, sf_dir, "documents"), k=3)


WIN_K = 3
WIN_W = 4


@register(
    "text_winnow_fingerprints",
    oracle=textops.winnow_oracle_sql(_TOKS, k=WIN_K, w=WIN_W),
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints over documents: 3-token grams, window
    4, min hash per window with rightmost tie-break — the guaranteed-
    coverage local fingerprint set (any shared >=6-token substring shares
    a fingerprint). See textops.winnow_fingerprints."""
    return textops.winnow_fingerprints(
        _load(spark, sf_dir, "documents"), k=WIN_K, w=WIN_W
    )


HH_K = 30
_HH_ITEMS = f"SELECT unnest({_TOKS}) AS item FROM documents"


@register(
    "text_heavy_hitters",
    oracle=sketches.heavy_hitters_oracle_sql(_HH_ITEMS, k=HH_K, out_col="token"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (tokens with count > n/(k+1), k=30) via
    the JVM two-pass candidate scheme — one tail-sized shuffle, then
    candidate-sized work only. See sketches.heavy_hitters."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(textops.ws_tokens(F.col("text"))).alias("token"))
    return sketches.heavy_hitters(toks, "token", k=HH_K)


@register(
    "text_heavy_hitters_mg",
    oracle=sketches.heavy_hitters_oracle_sql(_HH_ITEMS, k=HH_K, out_col="token"),
)
def text_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact heavy-hitter answer via the bounded-memory Misra–Gries
    sketch (≤k candidate rows per partition cross the shuffle regardless
    of vocabulary size) — the unique-heavy-key-space scale twin. See
    sketches.heavy_hitters_mg."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(textops.ws_tokens(F.col("text"))).alias("token"))
    return sketches.heavy_hitters_mg(toks, "token", k=HH_K)


BPE_ROUNDS = 8


@register(
    "text_bpe_merges",
    oracle=bpe.bpe_oracle_sql(_TOKS, rounds=BPE_ROUNDS),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 8 BPE merges over the corpus: one corpus scan builds the
    word-frequency vocab, then every merge round is vocab-sized (pair
    count + broadcast argmax + literal replace). See bpe.bpe_merges."""
    return bpe.bpe_merges(_load(spark, sf_dir, "documents"), rounds=BPE_ROUNDS)


_CMS_PROBES = f"SELECT DISTINCT unnest({_TOKS}) AS item FROM documents"


@register(
    "sketch_cms_counts",
    oracle=sketches.cms_oracle_sql(_HH_ITEMS, _CMS_PROBES, out_col="token"),
)
def sketch_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch estimates for every vocabulary token: the grid is
    one bounded aggregation (≤ depth*width rows regardless of stream
    size) and estimates are the min of each token's depth counters —
    md5-hashed, so deterministic and oracle-replayable. Estimates are
    biased high (est_cnt ≥ true count, property-tested). See
    sketches.cms_build / cms_estimate."""
    from hadoop_1_spark.operators.caching import persist_tracked

    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(textops.ws_tokens(F.col("text"))).alias("token"))
    # ONE corpus pass: the wordcount relation feeds both the weighted
    # grid build (depth-way explode over vocab rows, not occurrences)
    # and the probe set — the raw stream is never replayed
    counts = persist_tracked(
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("w"))
    )
    grid = sketches.cms_build(counts, "token", weight_col="w")
    return sketches.cms_estimate(grid, counts.select("token"), "token")


@register(
    "text_bpe_segment",
    oracle=bpe.bpe_segment_oracle_sql(_TOKS, rounds=BPE_ROUNDS),
)
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainer + tokenizer end-to-end: learn the 8 corpus merges, then
    segment every token occurrence, emitting the subword split as a
    space-joined string. One corpus scan to train (vocab-sized rounds),
    one to segment. See bpe.segment."""
    docs = _load(spark, sf_dir, "documents")
    merges = bpe.bpe_merges(docs, rounds=BPE_ROUNDS)
    seg = bpe.segment(docs, merges)
    return seg.select(
        "doc_id", "word", F.concat_ws(" ", F.col("symbols")).alias("seg")
    )


CMS_JC_WIDTH = 16384  # sized for ~15k distinct keys per side at sf0.01+


def _jc_grid_sql(table: str, key: str) -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, {sketches.cms_bucket_sql(key, d, CMS_JC_WIDTH)} AS bucket FROM {table}"
        for d in range(sketches.CMS_DEPTH)
    )
    return f"SELECT d, bucket, CAST(count(*) AS BIGINT) AS c FROM ({rows}) GROUP BY 1, 2"


@register(
    "sketch_join_cardinality",
    oracle=f"""
WITH ga AS ({_jc_grid_sql("lineitem", "l_orderkey")}),
gb AS ({_jc_grid_sql("orders", "o_orderkey")}),
ip AS (SELECT ga.d, sum(ga.c * gb.c) AS ip FROM ga JOIN gb ON ga.d = gb.d AND ga.bucket = gb.bucket GROUP BY 1)
SELECT CAST(min(ip) AS BIGINT) AS est_cardinality FROM ip
""",
)
def sketch_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation without touching the join: CMS grids of
    lineitem.l_orderkey and orders.o_orderkey, inner-product estimator
    (min over depths). The estimate upper-bounds the true lineitem⋈orders
    cardinality and is exact integer arithmetic over two bounded grids.
    See sketches.cms_join_cardinality.

    Single-pass shape: both sides union into ONE tagged key-count
    aggregation (the md5 family then hashes each DISTINCT key once via
    the weight_col path, not every raw row — a 2.5x hash-work cut on
    lineitem's 4-rows-per-order profile), and both grids come out of one
    grouped aggregation whose persisted, bounded result feeds the
    inner-product join — one corpus-scan job instead of two."""
    from hadoop_1_spark.operators.caching import persist_tracked

    li = _load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.lit(0).alias("side")
    )
    od = _load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.lit(1).alias("side")
    )
    keys = (
        li.unionByName(od)
        .groupBy("side", "k")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    grid = persist_tracked(
        sketches.cms_build(
            keys, "k", width=CMS_JC_WIDTH, weight_col="w", group_cols=("side",)
        )
    )
    return sketches.cms_join_cardinality(
        grid.where(F.col("side") == 0).drop("side"),
        grid.where(F.col("side") == 1).drop("side"),
    )


@register(
    "text_bpe_vocab",
    oracle=bpe.vocab_oracle_sql(_TOKS, rounds=BPE_ROUNDS),
)
def text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE tokenizer's vocabulary artifact: base characters (ids by
    symbol order, with corpus character frequencies) followed by the 8
    learned merges in rank order — vocab.json + merges.txt as one
    relation. See bpe.vocab_table."""
    return bpe.vocab_table(_load(spark, sf_dir, "documents"), rounds=BPE_ROUNDS)


# Lowercased variant of the shared token contract (the LM trains and
# scores case-folded).
_TOKS_L = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')"


@register(
    "text_lm_score",
    oracle=f"""
WITH model AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest({_TOKS_L}) AS token FROM documents WHERE source = 'src0')
  GROUP BY 1
),
tot AS (
  SELECT CAST(coalesce(sum(c), 0) + count(*) + 1 AS BIGINT) AS d,
         CAST(length(bin(CAST(coalesce(sum(c), 0) + count(*) + 1 AS BIGINT))) AS BIGINT) AS dbits
  FROM model
),
tok AS (SELECT doc_id, unnest({_TOKS_L}) AS token FROM documents),
per AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum((tot.d * 1000000) // (coalesce(m.c, 0) + 1)) AS BIGINT) AS s_inv,
         CAST(sum(length(bin(coalesce(m.c, 0) + 1))) AS BIGINT) AS s_cb
  FROM tok t LEFT JOIN model m USING (token) CROSS JOIN tot
  GROUP BY 1
)
SELECT dd.doc_id,
       CAST(coalesce(per.n, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(per.n, 0) * tot.dbits - coalesce(per.s_cb, 0) AS BIGINT)
         AS surprisal_bits,
       CAST(coalesce(per.s_inv, 0) // greatest(coalesce(per.n, 0), 1) AS BIGINT)
         AS mean_invp_q6,
       (coalesce(per.s_inv, 0) // greatest(coalesce(per.n, 0), 1)) <= 40000000
         AS keep
FROM (SELECT doc_id FROM documents) dd
LEFT JOIN per ON dd.doc_id = per.doc_id
CROSS JOIN tot
""",
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter (Wenzek et al. 2019): train a
    unigram model on the curated src0 slice, score EVERY document's
    tokens against it in exact bigint arithmetic (floor-log2 surprisal
    bits + q6 mean inverse probability), keep the low-"perplexity" head
    (mean 1/p under an effective-vocabulary cap of 40). See
    textops.unigram_lm / textops.lm_score for the scale notes."""
    docs = _load(spark, sf_dir, "documents")
    model = textops.unigram_lm(docs.where(F.col("source") == "src0"))
    return textops.lm_score(docs, model)


@register(
    "text_lm_score_bigram",
    oracle=f"""
WITH tr AS (
  SELECT {_TOKS_L} AS toks FROM documents WHERE source = 'src0'
),
tp AS (
  SELECT CASE WHEN i = 1 THEN chr(2) ELSE toks[i - 1] END AS prev, toks[i] AS tok
  FROM (SELECT toks, unnest(range(1, len(toks) + 1)) AS i FROM tr)
),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM tp GROUP BY 1),
tot AS (
  SELECT CAST(coalesce(sum(cu), 0) + count(*) + 1 AS BIGINT) AS du,
         CAST(count(*) + 1 AS BIGINT) AS v1
  FROM uni
),
big AS (SELECT prev, tok, CAST(count(*) AS BIGINT) AS cb FROM tp GROUP BY 1, 2),
ctx AS (SELECT prev, CAST(count(*) AS BIGINT) AS cc FROM tp GROUP BY 1),
dp AS (
  SELECT doc_id,
         CASE WHEN i = 1 THEN chr(2) ELSE toks[i - 1] END AS prev, toks[i] AS tok
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
        FROM (SELECT doc_id, {_TOKS_L} AS toks FROM documents))
),
per AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(
           (10 * (coalesce(ctx.cc, 0) + tot.v1) * tot.du * 1000000) //
           (7 * (coalesce(big.cb, 0) + 1) * tot.du
            + 3 * (coalesce(uni.cu, 0) + 1) * (coalesce(ctx.cc, 0) + tot.v1))
         ) AS BIGINT) AS s
  FROM dp d CROSS JOIN tot
  LEFT JOIN big ON d.prev = big.prev AND d.tok = big.tok
  LEFT JOIN ctx ON d.prev = ctx.prev
  LEFT JOIN uni ON d.tok = uni.tok
  GROUP BY 1
)
SELECT dd.doc_id,
       CAST(coalesce(per.n, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(per.s, 0) // greatest(coalesce(per.n, 0), 1) AS BIGINT)
         AS mean_invp_q6,
       (coalesce(per.s, 0) // greatest(coalesce(per.n, 0), 1)) <= 40000000
         AS keep
FROM (SELECT doc_id FROM documents) dd
LEFT JOIN per ON dd.doc_id = per.doc_id
""",
)
def text_lm_score_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM quality scoring (λ = 0.7 bigram / 0.3
    unigram, BOS context at position 1) — the closer-to-CCNet twin of
    text_lm_score, with the λ-mixture computed as an exact integer
    rational so the DuckDB oracle replays the estimates bit-for-bit.
    Same curated src0 training slice and effective-vocab keep cap. See
    textops.lm_score_bigram for the overflow bound and the scale notes."""
    docs = _load(spark, sf_dir, "documents")
    return textops.lm_score_bigram(docs, docs.where(F.col("source") == "src0"))


@register(
    "text_bpe_fertility",
    oracle=f"""
WITH seg AS ({bpe.bpe_segment_oracle_sql(_TOKS, rounds=BPE_ROUNDS)}),
j AS (
  SELECT d.lang, len(string_split(seg.seg, ' ')) AS pieces
  FROM seg JOIN documents d USING (doc_id)
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(pieces) AS BIGINT) AS n_pieces,
       CAST((sum(pieces) * 1000000) // count(*) AS BIGINT) AS fertility_q6
FROM j GROUP BY 1
""",
)
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-health report: BPE fertility (subword pieces per word,
    exact q6) per language under the corpus-trained 8-merge tokenizer —
    the standard multilingual tokenizer-equity metric (a language with
    high fertility pays more sequence length per word). Composes the
    verified trainer + segmenter; one doc_id join attaches languages."""
    docs = _load(spark, sf_dir, "documents")
    merges = bpe.bpe_merges(docs, rounds=BPE_ROUNDS)
    seg = bpe.segment(docs, merges)
    j = seg.join(docs.select("doc_id", "lang"), "doc_id")
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.size("symbols")).cast("bigint").alias("n_pieces"),
        F.expr("(sum(size(symbols)) * 1000000) div count(1)")
        .cast("bigint")
        .alias("fertility_q6"),
    )


def _kappa_oracle() -> str:
    from hadoop_1_spark import registry

    pred = registry.ORACLE["text_lang_id"].strip()
    return f"""
WITH pred AS (SELECT * FROM ({pred})),
cm AS (
  SELECT d.lang AS truth, p.lang_pred AS pred,
         CAST(count(*) AS BIGINT) AS cnt
  FROM documents d JOIN pred p USING (doc_id)
  GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(cnt) AS HUGEINT) AS n FROM cm),
diag AS (SELECT CAST(coalesce(sum(cnt), 0) AS HUGEINT) AS agree
         FROM cm WHERE truth = pred),
marg AS (
  SELECT CAST(sum(r.rc * c.cc) AS HUGEINT) AS chance
  FROM (SELECT truth AS k, sum(cnt) AS rc FROM cm GROUP BY 1) r
  JOIN (SELECT pred AS k, sum(cnt) AS cc FROM cm GROUP BY 1) c USING (k)
)
SELECT cm.truth, cm.pred, cm.cnt,
       CAST(tot.n AS BIGINT) AS n,
       CAST(CASE WHEN tot.n * tot.n = marg.chance THEN NULL
            ELSE (1000000 * (tot.n * diag.agree - marg.chance))
                 // (tot.n * tot.n - marg.chance) END AS BIGINT) AS kappa_q6
FROM cm, tot, diag, marg
"""


@register("label_agreement_kappa", oracle=_kappa_oracle())
def label_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-QA agreement harness: the confusion matrix between the
    corpus's lang annotation and the engine's lang-id prediction, with
    Cohen's kappa as an exact truncated rational ((n*agree - chance) /
    (n^2 - chance), q6) stamped on every cell — chance-corrected
    agreement, the metric label-pipeline audits report. All counts are
    exact; the only division is the final integer one (HUGEINT // in
    the oracle matches Spark's decimal div truncation; degenerate
    chance == n^2 yields NULL). Matrix and kappa hash-check together."""
    docs = _load(spark, sf_dir, "documents")
    pred = textops.lang_id(docs, spark)
    cm = (
        docs.select("doc_id", F.col("lang").alias("truth"))
        .join(pred.select("doc_id", F.col("lang_pred").alias("pred")), "doc_id")
        .groupBy("truth", "pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    from hadoop_1_spark.operators.caching import persist_tracked

    cm = persist_tracked(cm)
    d38 = "decimal(38,0)"
    tot = cm.agg(F.sum("cnt").cast(d38).alias("_n"))
    diag = cm.where(F.col("truth") == F.col("pred")).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast(d38).alias("_agree")
    )
    r = cm.groupBy(F.col("truth").alias("_k")).agg(F.sum("cnt").alias("_rc"))
    c = cm.groupBy(F.col("pred").alias("_k")).agg(F.sum("cnt").alias("_cc"))
    marg = (
        r.join(c, "_k")
        .agg(F.sum(F.col("_rc").cast(d38) * F.col("_cc").cast(d38)).cast(d38).alias("_chance"))
    )
    kappa = (
        F.when(
            F.col("_n") * F.col("_n") == F.col("_chance"),
            F.lit(None).cast("bigint"),
        ).otherwise(
            F.expr(
                "(cast(1000000 as decimal(38,0)) * (_n * _agree - _chance))"
                " div (_n * _n - _chance)"
            ).cast("bigint")
        )
    )
    return (
        cm.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(diag))
        .crossJoin(F.broadcast(marg))
        .select(
            "truth", "pred", "cnt",
            F.col("_n").cast("bigint").alias("n"),
            kappa.alias("kappa_q6"),
        )
    )


PR_CURATED = ("src0", "src1", "src2", "src3", "src4")


def _pr_curve_oracle() -> str:
    from hadoop_1_spark import registry

    # reuse text_quality's verified scoring SQL as the score source
    curated = ", ".join(f"'{s}'" for s in PR_CURATED)
    return f"""
WITH q AS (SELECT * FROM ({registry.ORACLE["text_quality"].strip()})),
lab AS (
  SELECT q.doc_id,
         CAST(floor(q.quality * 1000000) AS BIGINT) AS qq,
         CASE WHEN d.source IN ({curated}) THEN 1 ELSE 0 END AS y
  FROM q JOIN documents d USING (doc_id)
),
agg AS (SELECT qq, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos FROM lab GROUP BY 1),
tot AS (SELECT sum(n) AS n_all, sum(pos) AS p_all FROM agg),
grid AS (SELECT unnest(range(0, 21)) * 50000 AS thr),
pr AS (
  SELECT g.thr,
         CAST(coalesce(sum(a.n), 0) AS BIGINT) AS pred_pos,
         CAST(coalesce(sum(a.pos), 0) AS BIGINT) AS tp
  FROM grid g LEFT JOIN agg a ON a.qq >= g.thr
  GROUP BY 1
)
SELECT CAST(pr.thr AS BIGINT) AS thr_q6, pred_pos, tp,
       CAST(tot.p_all AS BIGINT) AS n_pos,
       CAST(CASE WHEN pred_pos = 0 THEN NULL
            ELSE (tp * 1000000) // pred_pos END AS BIGINT) AS precision_q6,
       CAST(CASE WHEN tot.p_all = 0 THEN NULL
            ELSE (tp * 1000000) // tot.p_all END AS BIGINT) AS recall_q6
FROM pr, tot
"""


@register("quality_pr_curve", oracle=_pr_curve_oracle())
def quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation harness: precision/recall of the heuristic
    quality score against a curated-source label, swept over a 21-point
    threshold grid — exact integer counts and q6 truncated ratios, so
    the whole curve hash-checks. Scale shape: per-doc scores first
    COLLAPSE to per-distinct-score counts (bounded by the q6 score
    domain, not the corpus), and the threshold sweep joins the GRID
    against that bounded relation — the corpus is never replicated
    per threshold."""
    docs = _load(spark, sf_dir, "documents")
    q = textops.quality_score(docs)
    lab = (
        q.select("doc_id", F.floor(F.col("quality") * 1000000).cast("bigint").alias("qq"))
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "qq",
            F.when(F.col("source").isin(*PR_CURATED), F.lit(1)).otherwise(F.lit(0)).alias("y"),
        )
    )
    agg = lab.groupBy("qq").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    from hadoop_1_spark.operators.caching import persist_tracked

    agg = persist_tracked(agg)
    tot = agg.agg(
        F.sum("n").cast("bigint").alias("_na"),
        F.sum("pos").cast("bigint").alias("_pa"),
    )
    grid = spark.sql(
        "SELECT CAST(i * 50000 AS BIGINT) AS thr"
        " FROM (SELECT explode(sequence(0, 20)) AS i)"
    )
    pr = (
        grid.join(F.broadcast(agg), F.col("qq") >= F.col("thr"), "left")
        .groupBy("thr")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("pred_pos"),
            F.coalesce(F.sum("pos"), F.lit(0)).cast("bigint").alias("tp"),
        )
    )
    return (
        pr.crossJoin(F.broadcast(tot))
        .select(
            F.col("thr").cast("bigint").alias("thr_q6"),
            "pred_pos", "tp",
            F.col("_pa").cast("bigint").alias("n_pos"),
            F.when(F.col("pred_pos") == 0, F.lit(None).cast("bigint"))
            .otherwise(F.expr("(tp * 1000000) div pred_pos")).alias("precision_q6"),
            F.when(F.col("_pa") == 0, F.lit(None).cast("bigint"))
            .otherwise(F.expr("(tp * 1000000) div _pa")).alias("recall_q6"),
        )
    )


def _auc_oracle() -> str:
    from hadoop_1_spark import registry

    curated = ", ".join(f"'{s}'" for s in PR_CURATED)
    return f"""
WITH q AS (SELECT * FROM ({registry.ORACLE["text_quality"].strip()})),
lab AS (
  SELECT CAST(floor(q.quality * 1000000) AS BIGINT) AS qq,
         CASE WHEN d.source IN ({curated}) THEN 1 ELSE 0 END AS y
  FROM q JOIN documents d USING (doc_id)
),
agg AS (SELECT qq, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS pos FROM lab GROUP BY 1),
c AS (SELECT qq, pos, n - pos AS neg,
             sum(n - pos) OVER (ORDER BY qq) AS cum_neg FROM agg),
t AS (SELECT CAST(sum(pos) AS HUGEINT) AS p, CAST(sum(neg) AS HUGEINT) AS nn,
             CAST(sum(CAST(pos AS HUGEINT) * (2 * cum_neg - neg)) AS HUGEINT) AS num2
      FROM c)
SELECT CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       CAST(num2 AS VARCHAR) AS auc_num2,
       CASE WHEN p = 0 OR nn = 0 THEN NULL
            ELSE CAST((num2 * 1000000) // (2 * p * nn) AS BIGINT) END AS auc_q6
FROM t
"""


@register("quality_auc", oracle=_auc_oracle())
def quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free ranking quality of the heuristic quality score
    against the curated-source label: exact Mann-Whitney AUC (ties get
    half credit) over the same collapsed score relation the PR curve
    uses, with the cumulative-negative walk as ONE distributed prefix
    scan. Completes the eval triad: kappa / PR curve / AUC."""
    from hadoop_1_spark.operators import aggregate as ops_agg

    docs = _load(spark, sf_dir, "documents")
    q = textops.quality_score(docs)
    lab = (
        q.select("doc_id", F.floor(F.col("quality") * 1000000).cast("bigint").alias("qq"))
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "qq",
            F.when(F.col("source").isin(*PR_CURATED), F.lit(1)).otherwise(F.lit(0)).alias("y"),
        )
    )
    return ops_agg.mann_whitney_auc(lab, score_col="qq", label_col="y")


BM25_TERMS = ["spark", "join", "window"]
BM25_K = 10

# Lowercased token array — bm25 matches terms case-insensitively.
_LTOKS = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')"


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH t AS (SELECT doc_id, {_LTOKS} AS toks FROM documents),
d AS (SELECT doc_id, CAST(coalesce(len(toks), 0) AS BIGINT) AS dl FROM t),
tot AS (SELECT CAST(count(*) AS HUGEINT) AS nd,
               CAST(coalesce(sum(dl), 0) AS HUGEINT) AS tt FROM d),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS w FROM t)
  WHERE w IN ({terms}) GROUP BY 1, 2
),
dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         CAST(sum(((2 * tot.nd - 2 * df + 1) * 22 * tf.tf * tot.tt * 1000000)
                  // ((2 * df + 1)
                      * (10 * tf.tf * tot.tt + 3 * tot.tt + 9 * d.dl * tot.nd)))
              AS BIGINT) AS score_q6
  FROM tf JOIN dfreq USING (w) JOIN d USING (doc_id) CROSS JOIN tot
  GROUP BY 1
)
SELECT doc_id, score_q6,
       CAST(row_number() OVER (ORDER BY score_q6 DESC, doc_id ASC) AS INT) AS rank
FROM sc
QUALIFY rank <= {BM25_K}
"""


@register("text_bm25_topk", oracle=_bm25_oracle())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (top-10 for a fixed 3-term query) in exact
    integer arithmetic — the log-free rational-idf variant whose trade
    (and k1 = 1.2 / b = 0.75 clearing into one bigint rational) is
    documented in textops.bm25_topk. The oracle replays tokenization,
    df/dl/avgdl statistics, and the per-term q6 floor division."""
    docs = _load(spark, sf_dir, "documents")
    return textops.bm25_topk(docs, BM25_TERMS, k=BM25_K)
