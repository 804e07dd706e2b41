"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over hadoop_1_spark: the query catalog lives in
``hadoop_1_spark/queries/`` and registers into ``hadoop_1_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_1_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Grep pipeline, SURVEY.md §7 Phase 0) on sf0.001:
    scan documents -> regex extract -> group-count -> global sort desc."""
    return registry.QUERIES["grep"](spark, SMOKE_SF_DIR)


def _last_checked_round() -> dict[str, int]:
    """Map query name -> latest round whose CORRECTNESS_r*.json contains it.

    The driver verifies a bounded prefix of ``queries()`` per round, so we
    rotate: queries never checked (or checked longest ago) sort first,
    guaranteeing every registered query cycles through the verification
    window across rounds.
    """
    import glob
    import json
    import re

    base = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(base, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for name in rows:
                last[name] = max(last.get(name, 0), rnd)
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered least-recently-verified first (see ``_last_checked_round``);
    ties break alphabetically for determinism.
    """
    qs = dict(registry.QUERIES)
    try:
        last = _last_checked_round()
    except Exception:
        return qs
    return {n: qs[n] for n in sorted(qs, key=lambda n: (last.get(n, 0), n))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return dict(registry.ORACLE)
