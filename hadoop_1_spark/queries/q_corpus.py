"""End-to-end training-corpus cleaning pipeline (north-star showcase):
quality filter -> language filter -> near-dup removal, composed from the
text-analysis and dedup operator families into one declarative plan.

This is the canonical LLM-data-pipeline shape at 100 TB: every stage is a
narrow transform or a hash-key shuffle; the dedup stage is MinHash+LSH
(scale path), and the "drop the later duplicate" rule is a left-anti join
against the pair list — no driver-side state anywhere.

The oracle literally composes the already-verified oracle SQL of
text_quality, text_lang_id, and dedup_minhash_lsh as CTE subqueries, so
the composition is checked end-to-end, not re-derived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_1_spark.operators import dedup, textops
from hadoop_1_spark.registry import ORACLE, _load, register

MIN_QUALITY = 0.5
KEEP_LANGS = ("en", "es")


def _oracle() -> str:
    quality_sql = ORACLE["text_quality"]
    lang_sql = ORACLE["text_lang_id"]
    dups_sql = ORACLE["dedup_minhash_lsh"]
    return f"""
WITH q AS (SELECT doc_id, quality FROM ({quality_sql})),
lb AS (SELECT doc_id, lang_pred FROM ({lang_sql})),
dups AS ({dups_sql})
SELECT d.doc_id, q.quality, lb.lang_pred
FROM documents d
JOIN q USING (doc_id)
JOIN lb USING (doc_id)
WHERE q.quality >= {MIN_QUALITY}
  AND lb.lang_pred IN {KEEP_LANGS!r}
  AND d.doc_id NOT IN (SELECT d2 FROM dups)
"""


@register("corpus_clean", oracle=_oracle())
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cleaning: keep documents with quality >= 0.5 whose predicted
    language is in {en, es}, dropping the higher-id member of every
    MinHash-LSH near-dup pair (threshold 0.8)."""
    docs = _load(spark, sf_dir, "documents")
    quality = textops.quality_score(docs).select("doc_id", "quality")
    lang = textops.lang_id(docs, spark).select("doc_id", "lang_pred")
    dups = dedup.minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=8, threshold=0.8)
    return (
        docs.select("doc_id")
        .join(quality, "doc_id")
        .join(lang, "doc_id")
        .where(
            (F.col("quality") >= MIN_QUALITY) & F.col("lang_pred").isin(*KEEP_LANGS)
        )
        .join(dups.select(F.col("d2").alias("doc_id")), "doc_id", "left_anti")
        .select("doc_id", "quality", "lang_pred")
    )
