"""Vaidya parity (contrib/vaidya PostExPerformanceDiagnoser.java:43):
rule-based post-execution diagnosis. The reference runs XML-configured
rules over a finished job's counters/config; here the rules run over this
engine's own artifacts — the PLANS.md plan audit and a bench.py JSON line —
and emit structured diagnoses.

Usage:
    python bench.py > /tmp/bench.json  # or use a driver BENCH_r*.json
    python scripts/vaidya.py /tmp/bench.json

Prints one JSON diagnosis per triggered rule.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Python nodes allowed only at these deliberate Arrow/RDD seams.
PY_SEAM_QUERIES = {
    "mm_features", "pipe_wordcount", "pipe_upper_kv", "udaf_pandas_median",
    "secondary_sort_iterator", "terasort_validate", "pentomino_search",
    "stream_stateful_user_stats",
}
EXCHANGE_BUDGET = 7  # > this many shuffles in one plan -> review


def parse_plans() -> list[dict]:
    rows = []
    path = os.path.join(REPO, "PLANS.md")
    for line in open(path):
        m = re.match(r"\| (\w+) \| (\d+) \| ([^|]*) \| (\d+) \| ([^|]*) \|", line)
        if m:
            rows.append(
                {
                    "query": m.group(1),
                    "exchanges": int(m.group(2)),
                    "joins": m.group(3).strip(),
                    "python": m.group(5).strip(),
                }
            )
    return rows


def diagnose(bench: dict | None) -> list[dict]:
    out = []
    for r in parse_plans():
        if r["exchanges"] > EXCHANGE_BUDGET:
            out.append(
                {
                    "rule": "EXCESSIVE_SHUFFLES",
                    "query": r["query"],
                    "evidence": f"{r['exchanges']} exchanges (budget {EXCHANGE_BUDGET})",
                    "prescription": "fuse aggregations / reuse partitioning / pre-bucket inputs",
                }
            )
        if r["python"] not in ("-", "") and r["query"] not in PY_SEAM_QUERIES:
            out.append(
                {
                    "rule": "PYTHON_IN_HOT_PATH",
                    "query": r["query"],
                    "evidence": f"python nodes: {r['python']}",
                    "prescription": "replace with built-in column exprs or move behind an Arrow seam",
                }
            )
    if bench and bench.get("queries"):
        times = bench["queries"]
        med = statistics.median(times.values())
        for q, t in times.items():
            if t > 4 * med and t > 1.0:
                out.append(
                    {
                        "rule": "LATENCY_OUTLIER",
                        "query": q,
                        "evidence": f"{t:.2f}s vs median {med:.2f}s",
                        "prescription": "profile stages; check skew, Python seams, and plan reuse",
                    }
                )
    return out


def main() -> None:
    bench = None
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            bench = json.loads(f.read().strip().splitlines()[-1])
    findings = diagnose(bench)
    for d in findings:
        print(json.dumps(d))
    print(json.dumps({"rule": "SUMMARY", "findings": len(findings)}))


if __name__ == "__main__":
    main()
