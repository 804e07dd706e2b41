"""Property-based tests (SURVEY.md §5 style 4: randomized self-validating
round-trips, the TestMapRed.java / SortValidator.java model) using
hypothesis. Spark evaluations are batched per example set via a single
DataFrame to keep runtime bounded."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadoop_1_spark.operators import fieldsel
from hadoop_1_spark.operators.textops import ws_tokens

# ---------------------------------------------------------------------------
# FieldSelection spec parser vs a direct reference implementation


def _reference_select(fields: list[str], field_list, all_from, sep: str) -> str:
    """Literal transcription of FieldSelectionHelper.selectFields semantics
    (as compiled by select_fields_expr): each enumerated field (empty when
    out of range) + sep; then the open-range tail joined by sep + sep when
    non-empty; finally exactly one trailing char stripped."""
    s = "".join((fields[i] if i < len(fields) else "") + sep for i in field_list)
    if all_from is not None:
        tail = fields[all_from:]
        if tail:
            s += sep.join(tail) + sep
    return s[:-1] if s else ""


@given(
    st.lists(
        st.text(alphabet="abc123", min_size=0, max_size=4), min_size=1, max_size=8
    ),
    st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=5),
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
)
@settings(max_examples=30, deadline=None)
def test_field_spec_parser_roundtrip(fields, enum_fields, all_from):
    """parse_field_spec(spec string built from parts) == the parts."""
    spec_items = [str(i) for i in enum_fields]
    if all_from is not None:
        spec_items.append(f"{all_from}-")
    spec = ",".join(spec_items)
    got_fields, got_all_from = fieldsel.parse_field_spec(spec)
    assert got_fields == enum_fields
    assert got_all_from == all_from


@given(
    st.lists(
        st.lists(st.text(alphabet="abcxyz01", min_size=0, max_size=5), min_size=1, max_size=6),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=10, deadline=None)
def test_field_selection_matches_reference(spark, lines):
    """Spark field_selection == the reference-transcribed Python on random
    lines, for a fixed representative spec ("1,3,0-" style)."""
    sep = "\t"
    field_list, all_from = fieldsel.parse_field_spec("1,0,2-")
    raw = [sep.join(parts) for parts in lines]
    df = spark.createDataFrame([(ln,) for ln in raw], "line string")
    out = df.select(
        fieldsel.select_fields_expr(
            F.split(F.col("line"), sep), field_list, all_from, sep
        ).alias("sel")
    ).collect()
    expected = [
        _reference_select(ln.split(sep), field_list, all_from, sep) for ln in raw
    ]
    assert [r["sel"] for r in out] == expected


def test_select_fields_expr_null_array_parity(spark):
    """A NULL fields array — reachable only by direct select_fields_expr
    callers, never via field_selection (split of a non-null line) — behaves
    like an empty record on BOTH compile paths (r13 ADVICE: the single-char
    fast path used to propagate NULL through slice -> concat -> array_join
    where the legacy append/strip path produced a non-null string)."""
    df = spark.createDataFrame([(None,)], "arr array<string>")
    for sep in ("\t", "::"):  # single-char fast path + multi-char legacy
        for spec in ("2-", "1,0,2-", "0-"):
            fl, af = fieldsel.parse_field_spec(spec)
            got = df.select(
                fieldsel.select_fields_expr(F.col("arr"), fl, af, sep).alias("s")
            ).collect()[0]["s"]
            assert got == _reference_select([], fl, af, sep), (sep, spec)


# ---------------------------------------------------------------------------
# Sort validator invariance (SortValidator.java model): the (records, bytes,
# xor-of-record-hashes) statistics triple is identical before and after any
# repartition/sort, and orderedness holds after orderBy.


@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=200))
@settings(max_examples=10, deadline=None)
def test_sort_preserves_stats_triple(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v long")
    shuffled = df.repartition(7)
    sorted_df = shuffled.orderBy("v")

    def stats(d):
        row = d.select(
            F.count("*").alias("n"),
            F.sum(F.length(F.col("v").cast("string"))).alias("bytes"),
            # xor aggregate of per-record hashes — order-insensitive
            F.expr("cast(aggregate(collect_list(xxhash64(v)), 0L, (a, x) -> a ^ x) as long)").alias("x"),
        ).collect()[0]
        return (row["n"], row["bytes"], row["x"])

    assert stats(shuffled) == stats(sorted_df)
    out = [r["v"] for r in sorted_df.collect()]
    assert out == sorted(values)


# ---------------------------------------------------------------------------
# Tokenizer totals: token counting is partition-invariant


@given(st.lists(st.text(alphabet="ab c\t", min_size=0, max_size=30), min_size=1, max_size=50))
@settings(max_examples=10, deadline=None)
def test_token_count_partition_invariant(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    n1 = df.select(F.explode(ws_tokens(F.col("text")))).count()
    n2 = df.repartition(5).select(F.explode(ws_tokens(F.col("text")))).count()
    expected = sum(len(t.split()) for t in texts)
    assert n1 == n2 == expected


# ---------------------------------------------------------------------------
# Key-field sort spec compiler (O4, SURVEY hard-part e) vs a Python
# reference implementation of the same -k semantics


def _py_key(fields: list[str], ks, sep: str):
    """Python twin of keyfield.key_expr + numeric/reverse handling."""
    if ks.field_end is None:
        sub = sep.join(fields[ks.field_start - 1 :])
    else:
        sub = sep.join(fields[ks.field_start - 1 : ks.field_end])
        if ks.char_end is not None:
            last = fields[ks.field_end - 1] if ks.field_end <= len(fields) else ""
            keep = len(sub) - len(last) + min(ks.char_end, len(last))
            sub = sub[:keep]
    if ks.char_start > 1:
        sub = sub[ks.char_start - 1 :]
    return sub


def _py_sortkey(line: str, specs, sep: str):
    fields = line.split(sep)
    key = []
    for ks in specs:
        s = _py_key(fields, ks, sep)
        if ks.numeric:
            try:
                v = float(s)
            except ValueError:
                v = None  # Spark cast -> NULL; NULLs first on asc
            key.append((v is not None, v if v is not None else 0.0, "") if not ks.reverse
                       else (v is None, -(v if v is not None else 0.0), ""))
        else:
            key.append(s if not ks.reverse else _Rev(s))
    key.append(line)  # last-resort whole-line tiebreak
    return key


class _Rev:
    def __init__(self, s):
        self.s = s
    def __lt__(self, other):
        return self.s > other.s
    def __eq__(self, other):
        return self.s == other.s


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=99), min_size=3, max_size=3),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from(["-k2,2n", "-k1,1r", "-k3,3nr -k1,1", "-k2", "-k1,2"]),
)
@settings(max_examples=12, deadline=None)
def test_keyfield_sort_matches_python_reference(spark, rows, spec):
    from hadoop_1_spark.operators import keyfield

    sep = "\t"
    lines = [sep.join(str(x) for x in r) for r in rows]
    df = spark.createDataFrame([(ln,) for ln in lines], "line string")
    got = [r["line"] for r in keyfield.key_field_sort(df, spec, sep).collect()]
    specs = keyfield.parse_sort_spec(spec)
    expected = sorted(lines, key=lambda ln: _py_sortkey(ln, specs, sep))
    assert got == expected


# ---------------------------------------------------------------------------
# Corpus-prep invariants (python-side reference replay of the md5 rules)


@given(
    st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=12, deadline=None)
def test_pack_bins_conservation_property(spark, token_sizes, budget, shards):
    """Packing conserves docs + tokens and bins are contiguous from 0 in
    every shard, for arbitrary document sizes/budgets/shard counts."""
    from hadoop_1_spark.operators import corpusprep

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(token_sizes)], "doc_id long, toks long"
    )
    rows = corpusprep.pack_bins(df, "toks", budget=budget, shards=shards).collect()
    assert sum(r["n_docs"] for r in rows) == len(token_sizes)
    assert sum(r["bin_tokens"] for r in rows) == sum(token_sizes)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows_s in by_shard.values():
        bins = sorted(r["bin"] for r in rows_s)
        toks_s = sum(r["bin_tokens"] for r in rows_s)
        # first bin is 0; an over-budget doc may SKIP indices (it consumes
        # several budgets' worth), but never past the token total
        assert bins[0] == 0
        assert len(set(bins)) == len(bins)
        assert bins[-1] <= toks_s // budget


def test_hash_split_weight_variants(spark):
    """2-way and degenerate 100/0 splits behave; bad weights raise."""
    import pytest

    from hadoop_1_spark.operators import corpusprep

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    two = corpusprep.hash_split(df, weights=(("a", 50), ("b", 50)))
    counts = {r["split"]: r["count"] for r in two.groupBy("split").count().collect()}
    assert set(counts) == {"a", "b"} and sum(counts.values()) == 500
    all_in = corpusprep.hash_split(df, weights=(("x", 100),))
    assert all_in.where("split <> 'x'").count() == 0
    with pytest.raises(ValueError):
        corpusprep.hash_split(df, weights=(("a", 60), ("b", 60)))


# ---------------------------------------------------------------------------
# PII scrub vs a direct Python-re reference (round 5)


@given(
    st.lists(
        st.text(
            alphabet="abc 0123456789.-@xyz\t",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=15, deadline=None)
def test_pii_scrub_matches_python_re(spark, texts):
    import re

    from hadoop_1_spark.operators import textops

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in textops.pii_scrub(df).collect()}
    for i, t in enumerate(texts):
        n_em = len(re.findall(textops.PII_EMAIL_RE, t))
        t1 = re.sub(textops.PII_EMAIL_RE, "[EMAIL]", t)
        n_ph = len(re.findall(textops.PII_PHONE_RE, t1))
        t2 = re.sub(textops.PII_PHONE_RE, "[PHONE]", t1)
        n_ip = len(re.findall(textops.PII_IP_RE, t2))
        t3 = re.sub(textops.PII_IP_RE, "[IP]", t2)
        r = got[i]
        assert (r.n_emails, r.n_phones, r.n_ips) == (n_em, n_ph, n_ip), t
        assert r.clean_text == t3, t


# ---------------------------------------------------------------------------
# Repetition stats vs a direct Python reference (round 5)


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=20
        ).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=15, deadline=None)
def test_repetition_stats_matches_python(spark, docs):
    from hadoop_1_spark.operators import textops

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in textops.repetition_stats(df, n=2).collect()}
    for i, t in enumerate(docs):
        toks = t.split()
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            assert i not in got
            continue
        from collections import Counter

        c = Counter(grams)
        r = got[i]
        assert r.n_grams == len(grams)
        assert r.dup_gram_frac == round(1 - len(c) / len(grams), 9)
        assert r.top_gram_frac == round(max(c.values()) / len(grams), 9)


# ---------------------------------------------------------------------------
# Batch sessionization vs a direct Python reference


def _reference_sessions(events, gap_s):
    """events: list[(key, ts_seconds)] -> {(key, i): session_seq} where i
    is the index in the per-key (ts, original-index) sort order. New
    session when the gap STRICTLY exceeds gap_s."""
    from collections import defaultdict

    per_key = defaultdict(list)
    for idx, (k, t) in enumerate(events):
        per_key[k].append((t, idx))
    out = {}
    for k, evs in per_key.items():
        evs.sort()
        seq = 0
        prev = None
        for t, idx in evs:
            if prev is None or t - prev > gap_s:
                seq += 1
            out[(k, idx)] = seq
            prev = t
    return out


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=60),
)
@settings(max_examples=15, deadline=None)
def test_sessionize_matches_python_reference(spark, events, gap_s):
    import datetime as dt

    from hadoop_1_spark.operators import temporal

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(seconds=t), idx)
        for idx, (k, t) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, idx long")
    got = {
        (r.k, r.idx): r.session_seq
        for r in temporal.sessionize(df, "k", "ts", gap_s, tie_cols=["idx"]).collect()
    }
    want = _reference_sessions(events, gap_s)
    # ties at equal (key, ts): both orders by (ts, idx) — identical keys
    assert got == want


# ---------------------------------------------------------------------------
# duplicated_span_stats vs a direct Python reference


def _reference_span_stats(docs, k):
    """docs: {doc_id: text} -> {doc_id: (n_spans, n_dup, frac_q6)}."""
    spans = {}
    for d, text in docs.items():
        toks = text.split()
        spans[d] = [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ] if len(toks) >= k else []
    from collections import Counter, defaultdict

    doc_sets = defaultdict(set)
    for d, ss in spans.items():
        for s in set(ss):
            doc_sets[s].add(d)
    out = {}
    for d, ss in spans.items():
        n = len(ss)
        dup = sum(1 for s in ss if len(doc_sets[s]) >= 2)
        out[d] = (n, dup, (dup * 1_000_000) // n if n else 0)
    return out


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=15, deadline=None)
def test_span_stats_matches_python(spark, docs, k):
    from hadoop_1_spark.operators import dedup

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_frac_q6)
           for r in dedup.duplicated_span_stats(df, k=k).collect()}
    assert got == _reference_span_stats(docs, k)


# ---------------------------------------------------------------------------
# tfidf_topk vs a direct Python reference


def _reference_tfidf(docs, topk):
    from collections import Counter

    tf = {d: Counter(t.split()) for d, t in docs.items()}
    df_counts = Counter(tok for c in tf.values() for tok in c)
    out = {}
    for d, c in tf.items():
        scored = sorted(
            ((-(n * 1_000_000 // df_counts[t]), t) for t, n in c.items())
        )[:topk]
        out[d] = [(t, -s) for s, t in scored]
    return out


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.lists(
            st.sampled_from(["x", "y", "z", "w", "v"]), min_size=1, max_size=10
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
)
@settings(max_examples=15, deadline=None)
def test_tfidf_topk_matches_python(spark, docs):
    from hadoop_1_spark.operators import textops

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = textops.tfidf_topk(df, k=3).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.rank)):
        got.setdefault(r.doc_id, []).append((r.token, r.score_q6))
    assert got == _reference_tfidf(docs, 3)


# ---------------------------------------------------------------------------
# winnow_fingerprints vs a direct Python reference


def _reference_winnow(docs, k, w):
    import hashlib

    out = {}
    for d, text in docs.items():
        toks = text.split()
        m = len(toks) - k + 1
        if len(toks) < k + w - 1:
            out[d] = set()
            continue
        hs = [
            hashlib.md5(("0:" + " ".join(toks[i : i + k])).encode()).hexdigest()[:15]
            for i in range(m)
        ]
        sel = set()
        for j in range(m - w + 1):
            # min hash in window, rightmost position on ties
            best = min(range(j, j + w), key=lambda p: (hs[p], -p))
            sel.add((best + 1, hs[best]))
        out[d] = sel
    return out


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=6),
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14
        ).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=2, max_value=3),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=12, deadline=None)
def test_winnow_matches_python(spark, docs, k, w):
    from hadoop_1_spark.operators import textops

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {}
    for r in textops.winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    want = {d: s for d, s in _reference_winnow(docs, k, w).items() if s}
    assert got == want


# ---------------------------------------------------------------------------
# incremental_dedup exact flags vs a direct Python reference


@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=4)
        .map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=4)
        .map(" ".join),
        min_size=0,
        max_size=5,
    ),
)
@settings(max_examples=12, deadline=None)
def test_incremental_exact_flags_match_python(spark, new_texts, snap_texts):
    from hadoop_1_spark.operators import dedup

    norm = lambda t: " ".join(t.lower().split())  # noqa: E731
    new = spark.createDataFrame(
        list(enumerate(new_texts)), "doc_id long, text string"
    )
    snap = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(snap_texts)] or [(999, "zz")],
        "doc_id long, text string",
    )
    snap_set = {norm(t) for t in (snap_texts or ["zz"])}
    first_seen = {}
    for i, t in enumerate(new_texts):
        first_seen.setdefault(norm(t), i)
    out = {r.doc_id: r for r in dedup.incremental_dedup(new, snap).collect()}
    assert len(out) == len(new_texts)          # one row per new doc
    for i, t in enumerate(new_texts):
        r = out[i]
        assert r.exact_snap == int(norm(t) in snap_set)
        assert r.exact_batch == int(first_seen[norm(t)] != i)
        assert r.keep == int(
            not (r.exact_snap or r.exact_batch or r.near_snap)
        )


# ---------------------------------------------------------------------------
# BPE merge learning: classic invariants on random corpora


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1, max_size=20
    )
)
@settings(max_examples=10, deadline=None)
def test_bpe_counts_nonincreasing_and_roundtrip(spark, words):
    """(a) Merge counts are non-increasing in rank: a merge can only
    create pairs whose count is bounded by the merged pair's count, and
    untouched pairs keep theirs. (b) Concatenating any word's learned
    symbols reproduces the word exactly."""
    from hadoop_1_spark.operators import bpe

    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    merges = bpe.bpe_merges(df, rounds=5)
    rows = sorted(merges.collect(), key=lambda r: r["rank"])
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    seg = bpe.segment(df, merges)
    bad = seg.where(F.concat_ws("", F.col("symbols")) != F.col("word")).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# Z-order key: injectivity over the masked domain


@given(st.integers(min_value=2, max_value=6))
@settings(max_examples=5, deadline=None)
def test_zorder_key_injective_on_grid(spark, bits):
    """Morton interleave is a bijection on [0,2^bits)^2: the full grid
    maps to 4^bits distinct keys covering exactly [0, 4^bits)."""
    from hadoop_1_spark.operators import sort as S

    n = 1 << bits
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), F.expr(f"id div {n}").alias("y")
    )
    keys = df.select(S.zorder_key("x", "y", bits=bits).alias("z"))
    stats = keys.agg(
        F.countDistinct("z").alias("d"), F.min("z").alias("mn"), F.max("z").alias("mx")
    ).collect()[0]
    assert (stats["d"], stats["mn"], stats["mx"]) == (n * n, 0, n * n - 1)


# ---------------------------------------------------------------------------
# LM scoring vs a direct Python replay of the smoothed-score arithmetic


@given(
    st.lists(st.text(alphabet="ab x", min_size=0, max_size=24), min_size=1, max_size=12),
    st.lists(st.text(alphabet="abc x", min_size=0, max_size=24), min_size=1, max_size=12),
)
@settings(max_examples=6, deadline=None)
def test_lm_score_matches_python_replay(spark, train_texts, doc_texts):
    from hadoop_1_spark.operators import textops

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(doc_texts)], "doc_id long, text string"
    )
    model = textops.unigram_lm(train)
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_bits"], r["mean_invp_q6"])
        for r in textops.lm_score(docs, model).collect()
    }

    # pure-Python replay of the add-1-smoothed integer arithmetic
    counts: dict[str, int] = {}
    for t in train_texts:
        for tok in t.lower().split():
            counts[tok] = counts.get(tok, 0) + 1
    D = sum(counts.values()) + len(counts) + 1
    dbits = D.bit_length()
    for i, t in enumerate(doc_texts):
        toks = t.lower().split()
        bits = sum(dbits - (counts.get(tok, 0) + 1).bit_length() for tok in toks)
        sinv = sum((D * 1_000_000) // (counts.get(tok, 0) + 1) for tok in toks)
        mean = sinv // max(len(toks), 1)
        assert got[i] == (len(toks), bits, mean), (i, t, got[i])


# ---------------------------------------------------------------------------
# Round-6 codecs: record I/O, typedbytes, JobHistory escaping, HAR hashing
# (pure-Python wire codecs — no Spark session needed, so examples are cheap)

from pyspark.sql.types import (  # noqa: E402
    ArrayType, BinaryType, BooleanType, ByteType, DoubleType, IntegerType,
    LongType, MapType, StringType, StructField, StructType,
)

from hadoop_1_spark.operators import jobhistory as jh  # noqa: E402
from hadoop_1_spark.operators import typedbytes as tb  # noqa: E402
from hadoop_1_spark.sources import har, recordio  # noqa: E402

_REC_SCHEMA = StructType([
    StructField("b", BooleanType()),
    StructField("y", ByteType()),
    StructField("i", IntegerType()),
    StructField("l", LongType()),
    StructField("d", DoubleType()),
    StructField("s", StringType()),
    StructField("buf", BinaryType()),
    StructField("v", ArrayType(StringType())),
    StructField("m", MapType(StringType(), LongType())),
    StructField("n", StructType([StructField("x", StringType())])),
])

_rec_values = st.tuples(
    st.booleans(),
    st.integers(min_value=-128, max_value=127),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
    st.binary(max_size=16),
    st.lists(st.text(max_size=8), max_size=4),
    st.dictionaries(st.text(max_size=6), st.integers(-(2**40), 2**40), max_size=4),
    st.tuples(st.text(max_size=10)),
)


@given(_rec_values)
@settings(max_examples=120, deadline=None)
def test_recordio_csv_roundtrip_property(val):
    line = recordio.csv_encode(val, _REC_SCHEMA)
    assert "\n" not in line and "\r" not in line  # line framing holds
    assert recordio.csv_decode(line, _REC_SCHEMA) == val


@given(_rec_values)
@settings(max_examples=120, deadline=None)
def test_recordio_binary_roundtrip_property(val):
    buf = recordio.binary_encode(val, _REC_SCHEMA)
    assert recordio.binary_decode(buf, _REC_SCHEMA) == val


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_vlong_roundtrip_property(i):
    out = bytearray()
    recordio.write_vlong(out, i)
    got, pos = recordio.read_vlong(bytes(out), 0)
    assert got == i and pos == len(out)
    # zero-compression invariant: small magnitudes are small encodings
    if -112 <= i <= 127:
        assert len(out) == 1


_tb_value = st.recursive(
    st.one_of(
        st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=12),
        st.binary(max_size=12),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.tuples(children, children),
        st.dictionaries(st.text(max_size=5), children, max_size=3),
    ),
    max_leaves=8,
)


@given(st.lists(_tb_value, max_size=5))
@settings(max_examples=120, deadline=None)
def test_typedbytes_stream_roundtrip_property(vals):
    payload = b"".join(tb.encode(v) for v in vals)
    assert tb.decode_all(payload) == vals


@given(st.text(max_size=40), st.text(alphabet='ab"=.\\\n', max_size=20))
@settings(max_examples=120, deadline=None)
def test_jobhistory_record_roundtrip_property(plain, nasty):
    """Round-trip up to the reference's own lossiness: Java's readLine +
    append('\\n') reassembly normalizes \\r / \\r\\n boundaries inside
    multi-line values to \\n (JobHistory.parseHistoryFromFS) — ours does
    identically; everything else survives byte-exact."""
    kv = {"A": plain, "B": nasty, "C": plain + nasty}
    norm = {k: v.replace("\r\n", "\n").replace("\r", "\n") for k, v in kv.items()}
    recs = jh.parse_records(jh.format_record("Task", kv) + "\n")
    assert recs == [("Task", norm)]


@given(st.lists(st.tuples(st.text(alphabet="ab{}[]()\\g", min_size=1, max_size=8),
                          st.text(alphabet="ab{}[]()c", min_size=1, max_size=8),
                          st.integers(-(2**40), 2**40)),
                min_size=0, max_size=5))
@settings(max_examples=100, deadline=None)
def test_counters_compact_roundtrip_property(triples):
    # group names must be unique per make/parse order contract
    seen, uniq = set(), []
    for g, c, v in triples:
        if g not in seen:
            seen.add(g)
            uniq.append((g, c, v))
    compact = jh.make_counters_compact(uniq)
    assert jh.parse_counters(compact) == uniq


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_har_hash_is_java_hashcode_masked(s):
    h = 0
    for c in s:
        # same UTF-16 unit iteration Java uses
        for unit in ([ord(c)] if ord(c) < 0x10000 else
                     [0xD800 + ((ord(c) - 0x10000) >> 10),
                      0xDC00 + ((ord(c) - 0x10000) & 0x3FF)]):
            h = (31 * h + unit) & 0xFFFFFFFF
    signed = h - (1 << 32) if h >= (1 << 31) else h
    assert har.har_hash(s) == signed & 0x7FFFFFFF


@given(
    total=st.integers(min_value=1, max_value=200),
    selected=st.integers(min_value=-5, max_value=250),
)
@settings(max_examples=200, deadline=None)
def test_gridmix2_select_spread_count_property(total, selected):
    """GridMixRunner.select fires exactly min(selected, total) indices
    when selected > 0 (an even spread), and none otherwise."""
    from hadoop_1_spark.operators.gridmix2 import select

    fired = [i for i in range(total) if select(total, selected, i)]
    if selected <= 0:
        assert fired == []
    else:
        assert len(fired) == min(selected, total)
        # spread: gaps between consecutive fired indices are constant
        if 0 < selected < total:
            gaps = {b - a for a, b in zip(fired, fired[1:])}
            assert len(gaps) <= 1


@given(
    jobs=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=3),
    reds=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=3),
    moc=st.integers(min_value=0, max_value=80),
)
@settings(max_examples=100, deadline=None)
def test_gridmix2_compile_counts_property(jobs, reds, moc):
    """compile_mix expands exactly sum(numOfJobs) specs per configured
    (class, size), reducer counts follow their group, and idx is dense."""
    from hadoop_1_spark.operators.gridmix2 import compile_mix

    if len(jobs) != len(reds):
        reds = (reds * len(jobs))[: len(jobs)]
    conf = {
        "combiner.smallJobs.numOfJobs": ",".join(map(str, jobs)),
        "combiner.smallJobs.numOfReduces": ",".join(map(str, reds)),
        "combiner.smallJobs.numOfMapoutputCompressed": str(moc),
    }
    specs = [s for s in compile_mix(conf) if s["job"] == "combiner" and s["size"] == "small"]
    assert len(specs) == sum(jobs)
    assert [s["idx"] for s in specs] == list(range(sum(jobs)))
    expect_reds = [r for n, r in zip(jobs, reds) for _ in range(n)]
    assert [s["reducers"] for s in specs] == expect_reds
    assert sum(s["mapoutput_compressed"] for s in specs) == (
        min(moc, sum(jobs)) if moc > 0 else 0
    )
    # everything unconfigured defaults to zero jobs
    assert all(
        s["job"] == "combiner" and s["size"] == "small" for s in compile_mix(conf)
    )


@given(
    keys=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x1100F),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
@settings(max_examples=150, deadline=None)
def test_recordio_map_key_order_is_utf16_property(keys):
    """Map keys serialize in UTF-16 code-unit order (Java TreeMap /
    String.compareTo), including supplementary-plane keys."""
    from pyspark.sql.types import MapType, StringType

    from hadoop_1_spark.sources import recordio

    items = recordio._treemap_items(
        {k: "v" for k in keys}, StringType()
    )
    got = [k for k, _ in items]
    assert got == sorted(keys, key=lambda s: s.encode("utf-16-be", "surrogatepass"))


# ---------------------------------------------------------------------------
# Round-8 surfaces: typed splitters and the reference partition folds


@given(
    st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0xD7FF),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=80, deadline=None)
def test_text_splitter_fraction_roundtrip(s):
    """TextSplitter's base-65536 mapping round-trips any BMP string with
    no NUL up to MAX_CHARS=8 chars; longer strings chomp to their 8-char
    prefix (TestTextSplitter.testConvertChomped generalized)."""
    from hadoop_1_spark.sources import io as hio

    out = hio.decimal_to_string(hio.string_to_decimal(s))
    assert out == s[:8]


@given(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.integers(min_value=0, max_value=10**12),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=100, deadline=None)
def test_integer_split_points_tile_the_range(lo, width, n):
    """IntegerSplitter invariants for any range: endpoints pinned, points
    monotone non-decreasing, and consecutive steps never exceed the
    reference's splitSize (so intervals tile [lo, hi] with no gap)."""
    from hadoop_1_spark.sources import io as hio

    hi = lo + width
    pts = hio.integer_split_points(n, lo, hi)
    assert pts[0] == lo and pts[-1] == hi and len(pts) >= 2
    assert all(a <= b for a, b in zip(pts, pts[1:]))
    step = max((hi - lo) // n, 1)
    assert all(b - a <= step for a, b in zip(pts, pts[1:]))


def _java_fold(s: str, seed: int) -> int:
    h = seed
    for ch in s:
        h = (h * 31 + ord(ch)) & 0xFFFFFFFF
    return h - 2**32 if h >= 2**31 else h


@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=0, max_size=20),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=12, deadline=None)
def test_java_hash_fold_matches_python_model(spark, keys):
    """keyfield.java_hash_fold (JVM Column arithmetic) equals the literal
    Java 31-fold for arbitrary printable-ASCII keys, both seeds, and the
    partition id lands in [0, k) — one batched DataFrame per example set."""
    from hadoop_1_spark.operators import keyfield

    df = spark.createDataFrame([(k,) for k in keys], "s string")
    rows = df.select(
        "s",
        keyfield.java_hash_fold(F.col("s"), seed=0).alias("h0"),
        keyfield.java_hash_fold(F.col("s"), seed=1).alias("h1"),
        keyfield.hash_partition_id(F.col("s"), 7).alias("p"),
    ).collect()
    for r in rows:
        assert r["h0"] == _java_fold(r["s"], 0)
        assert r["h1"] == _java_fold(r["s"], 1)
        assert 0 <= r["p"] < 7
