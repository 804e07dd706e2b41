"""Corpus-cleaning pipeline composition vs composed oracle."""

from __future__ import annotations

from tests.conftest import assert_query_matches_oracle


def test_corpus_clean_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "corpus_clean")


def test_corpus_clean_drops_dup_and_offlang(spark):
    from hadoop_1_spark import registry
    from hadoop_1_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").count()
    kept = registry.QUERIES["corpus_clean"](spark, sf)
    rows = kept.collect()
    assert 0 < len(rows) < docs
    assert {r["lang_pred"] for r in rows} <= {"en", "es"}
    assert all(r["quality"] >= 0.5 for r in rows)
