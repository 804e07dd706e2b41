"""Drift-guard baseline semantics (round-13 verdict #2a).

The variance guard used to compare each row against only the immediately
prior committed table, which let a row ratchet: double every round while
staying under the 2x fresh-JVM trigger (sim_pq_topk went 4.77 -> 8.70 ->
16.74 s across three tables with the guard never firing). The baseline is
now the MIN across the last three committed tables, so a ratcheting row
must eventually face the fresh-JVM re-measure.
"""

import json

import bench


def _write_table(tmp_path, rnd: int, rows: dict) -> None:
    with open(tmp_path / f"BENCH_LOCAL_r{rnd:02d}.json", "w") as fh:
        json.dump({"sf": 0.1, "rows": rows}, fh)


def test_prior_rows_take_min_over_last_three(tmp_path):
    # the ratchet scenario: a row doubling each round
    _write_table(tmp_path, 11, {"q": {"spark_s": 4.77, "duck_s": 4.0}})
    _write_table(tmp_path, 12, {"q": {"spark_s": 8.70, "duck_s": 3.0}})
    _write_table(tmp_path, 13, {"q": {"spark_s": 16.74, "duck_s": 5.0}})
    prior = bench._prior_committed_rows(base=str(tmp_path))
    # min across all three tables, per engine side independently
    assert prior["q"]["spark_s"] == 4.77
    assert prior["q"]["duck_s"] == 3.0
    # 16.74 > 2 * 4.77: the fresh-JVM trigger now fires where the
    # prior-table-only compare (16.74 < 2 * 8.70) never did


def test_prior_rows_window_is_three_tables(tmp_path):
    # a 4-rounds-ago fast reading must NOT pin the baseline forever:
    # genuine (confirmed) slowdowns age out of the window
    _write_table(tmp_path, 10, {"q": {"spark_s": 1.0}})
    _write_table(tmp_path, 11, {"q": {"spark_s": 6.0}})
    _write_table(tmp_path, 12, {"q": {"spark_s": 6.2}})
    _write_table(tmp_path, 13, {"q": {"spark_s": 6.1}})
    prior = bench._prior_committed_rows(base=str(tmp_path))
    assert prior["q"]["spark_s"] == 6.0


def test_prior_rows_handles_missing_and_new_queries(tmp_path):
    _write_table(tmp_path, 12, {"old": {"spark_s": 2.0, "duck_s": None}})
    _write_table(tmp_path, 13, {"new": {"spark_s": 1.5}})
    prior = bench._prior_committed_rows(base=str(tmp_path))
    assert prior["old"]["spark_s"] == 2.0
    assert prior["old"].get("duck_s") is None
    assert prior["new"]["spark_s"] == 1.5


def test_prior_rows_empty_dir(tmp_path):
    assert bench._prior_committed_rows(base=str(tmp_path)) == {}


def test_prior_rows_skip_suffixed_filenames(tmp_path):
    # BENCH_LOCAL_r14_c8.json-style names (the driver's 8-core runs use
    # the analogous BENCH_r14_c8.json) must be skipped, not crash the
    # sort key (round-14 ADVICE)
    _write_table(tmp_path, 13, {"q": {"spark_s": 2.0}})
    with open(tmp_path / "BENCH_LOCAL_r14_c8.json", "w") as fh:
        json.dump({"sf": 0.1, "rows": {"q": {"spark_s": 0.1}}}, fh)
    prior = bench._prior_committed_rows(base=str(tmp_path))
    assert prior["q"]["spark_s"] == 2.0


def test_contract_line_is_compact():
    """The final stdout line must stay far below the driver's tail-capture
    window (round-14 verdict #1: the embedded per-row table pushed the
    r13 line past it and PERF_r14 compared zero queries). Simulate a
    full-size run: 200 queries through main()'s print path."""
    import json as _json

    # reconstruct exactly what main() prints, from its source: the print
    # must not contain a "rows" key and must parse as one line
    src = open(bench.__file__, encoding="utf-8").read()
    tail_print = src[src.rindex("print(") :]
    assert '"rows": rows' not in tail_print, (
        "the contract line must not embed the verbose per-row table"
    )
    # and a realistic payload fits comfortably in an 8 KiB tail window
    times = {f"query_name_{i:03d}": 12.345 for i in range(200)}
    line = _json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "queries": times,
            "oracle_total": 123.456,
            "sf": 0.1,
        }
    )
    assert "\n" not in line and len(line) < 8192
