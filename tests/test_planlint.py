"""Global physical-plan lint over EVERY registered query — the
anti-pattern guard the per-query plan tests can't give: a future edit
that sneaks a cartesian product or a row-at-a-time Python UDF into any
query fails here, not in a code review.

Rules (crisp, plan-text-decidable):
- no CartesianProduct anywhere, except the explicitly-labeled O(n^2)
  correctness baseline (dedup_embedding_cosine — its docstring names the
  LSH twin as the scale path);
- no BatchEvalPython (row-at-a-time Python) anywhere: every Python seam
  must be Arrow-batched (ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas).

Plans are built (not executed) at sf0.001; queries that materialize
driver-side state during CONSTRUCTION (iterative trainers) still build
quickly at that scale. Streaming queries execute to a sink and expose
only a sink-read batch plan — skipped like scripts/plan_audit.py does.
"""

from __future__ import annotations

import pytest

SKIP = {
    "stream_tumbling_counts",
    "stream_sliding_avg",
    "stream_session_windows",
    "stream_stateful_user_stats",
}

CARTESIAN_ALLOWED = {"dedup_embedding_cosine"}

SF_DIR = "/root/testdata/sf0.001"


def _all_query_names():
    from hadoop_1_spark import registry
    import hadoop_1_spark.queries  # noqa: F401

    return sorted(n for n in registry.QUERIES if n not in SKIP)


@pytest.mark.parametrize("name", _all_query_names())
def test_plan_lint(spark, name):
    from hadoop_1_spark import registry

    df = registry.QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in CARTESIAN_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
