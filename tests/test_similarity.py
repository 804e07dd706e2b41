"""Similarity-search family (similarity.py) vs DuckDB oracle + semantics."""

from __future__ import annotations

import pytest

from hadoop_1_spark.operators import similarity
from tests.conftest import assert_query_matches_oracle


@pytest.mark.parametrize("name", ["sim_cosine_topk", "sim_lsh_topk", "sim_ivf_topk"])
def test_similarity_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)


def test_hyperplane_signs_deterministic():
    a = similarity.hyperplane_signs(4)
    b = similarity.hyperplane_signs(4)
    assert a == b
    assert all(s in (-1, 1) for row in a for s in row)
    assert similarity.hyperplane_signs(4, seed=7) != a


def test_brute_force_topk_self_excluded_and_ranked(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = similarity.cosine_topk(df, df.where("vec_id = 0"), k=2).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in got] == [(1, 1), (2, 2)]
    assert got[0]["cosine"] > got[1]["cosine"]


def test_lsh_recall_vs_brute_force(spark):
    """LSH top-k must be a (per-rank-prefix) subset of the brute-force
    neighbors' scores: every LSH hit's cosine <= brute-force at same rank,
    and rank-1 recall on the driver corpus should be substantial."""
    from hadoop_1_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where("vec_id < 10")
    bf = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in similarity.cosine_topk(emb, q, k=1).collect()}
    lsh = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in similarity.lsh_ann_topk(emb, q, k=1, nbits=4).collect()}
    hits = sum(1 for k in bf if lsh.get(k) == bf[k])
    # Driver embeddings are near-random (cosine max ~0.5), so 4-bit LSH
    # recall is modest; this is a sanity floor, not a quality target.
    assert hits >= 1
