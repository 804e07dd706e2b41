"""Reliability & observability parity: SkipBadRecords, Counters, JobControl.

- skip_bad_records : mapred/SkipBadRecords.java:51,64,114 + SortedRanges —
  the reference's skip-mode binary-searches and skips poison records on
  repeated task failure. Spark-first: a try/except per-record guard inside
  an Arrow batch, good rows flow on, poison rows divert to a side output
  with the error — no task retries burned, no binary search needed
  (failure is caught at the record, not the task).
- counters        : mapred/Counters.java:52 (incrCounter:469) — distributed
  monotonic counters aggregated at the master. Spark-first: df.observe()
  metrics collected by a listener-free accessor (Observation), computed
  inside the existing job — no extra pass.
- JobControl      : mapred/jobcontrol/JobControl.java:40,129-156 — jobs
  with dependingJobs run when deps complete. Spark's lazy DAG subsumes the
  data dependencies; this helper keeps the *action orchestration* shape
  (named jobs, dependency-ordered execution) for multi-sink pipelines.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from graphlib import TopologicalSorter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skip_bad_records(
    df: DataFrame,
    fn: Callable[[str], str],
    in_col: str,
    out_col: str = "out",
    out_type: str = "string",
) -> DataFrame:
    """Apply a per-record Python function, diverting failures to a side
    channel instead of failing the task: output schema is
    (<in_col>, <out_col>, _error) where exactly one of out/_error is set.

    Good rows:  filter("_error is null")
    Skipped:    filter("_error is not null")  (the reference's skipped-
                records output directory, as a column)."""
    schema = f"{in_col} string, {out_col} {out_type}, _error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, errs = [], []
            for v in pdf[in_col]:
                try:
                    outs.append(fn(v))
                    errs.append(None)
                except Exception as ex:  # poison record — record, don't die
                    outs.append(None)
                    errs.append(f"{type(ex).__name__}: {ex}")
            yield pd.DataFrame({in_col: pdf[in_col], out_col: outs, "_error": errs})

    return df.select(F.col(in_col).cast("string").alias(in_col)).mapInPandas(
        run, schema=schema
    )


def with_counters(df: DataFrame, **counters: Column):
    """Counters parity: attach named aggregate metrics computed during the
    job (no extra scan). Returns (df, observation); read
    observation.get after an action. Example:
    with_counters(df, bad=F.sum(F.expr("if(_error is not null, 1, 0)")))."""
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, *[c.alias(n) for n, c in counters.items()]), obs


class JobControl:
    """Dependency-ordered action runner (JobControl parity). Jobs are
    thunks (usually DataFrame writes); edges name prerequisite jobs."""

    def __init__(self) -> None:
        self._jobs: dict[str, Callable[[], object]] = {}
        self._deps: dict[str, set[str]] = {}
        self.results: dict[str, object] = {}

    def add_job(self, name: str, thunk: Callable[[], object], depends_on: tuple[str, ...] = ()) -> None:
        self._jobs[name] = thunk
        self._deps[name] = set(depends_on)

    def run(self) -> dict[str, object]:
        """Run all jobs respecting dependencies (WAITING -> READY ->
        RUNNING -> SUCCESS in the reference's state machine)."""
        for name in TopologicalSorter(self._deps).static_order():
            self.results[name] = self._jobs[name]()
        return self.results
