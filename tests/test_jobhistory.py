"""JobHistory log grammar (mapred/JobHistory.java parity) + Rumen-input
parsing tests."""

from __future__ import annotations

from hadoop_1_spark.operators import jobhistory as jh


def test_escape_roundtrip():
    nasty = 'a"b=c.d\\e normal'
    esc = jh.escape_string(nasty)
    assert esc == 'a\\"b\\=c\\.d\\\\e normal'
    assert jh.unescape_string(esc) == nasty


def test_format_and_parse_single_record():
    rec = jh.format_record(
        "Job", {"JOBID": "job_1", "JOBNAME": 'we"ird=name.', "USER": "u"}
    )
    assert rec.endswith(" .")
    parsed = jh.parse_records(rec + "\n")
    assert parsed == [
        ("Job", {"JOBID": "job_1", "JOBNAME": 'we"ird=name.', "USER": "u"})
    ]


def test_multiline_record_reassembly():
    """A logical record whose physical line does not end in the unescaped
    ' .' terminator continues onto the next line
    (JobHistory.parseHistoryFromFS buffering)."""
    text = (
        'Task TASKID="t1" STATE_STRING="line one\n'
        'line two" TASK_TYPE="MAP" .\n'
        'Job JOBID="j" .\n'
    )
    parsed = jh.parse_records(text)
    assert len(parsed) == 2
    assert parsed[0][1]["STATE_STRING"] == "line one\nline two"
    assert parsed[1] == ("Job", {"JOBID": "j"})


def test_escaped_terminator_does_not_end_record():
    # a line ending in '\.' (escaped dot) is NOT a record terminator
    text = 'Task TASKID="a" X="ends with \\.\nmore" .\n'
    parsed = jh.parse_records(text)
    assert parsed[0][1]["X"] == "ends with .\nmore"


def test_counters_compact_roundtrip():
    triples = [
        ("org.apache.hadoop.mapred.Task$Counter", "MAP_INPUT_RECORDS", 1000),
        ("org.apache.hadoop.mapred.Task$Counter", "SPILLED_RECORDS", 0),
        ("weird{group}[x]", "counter(y)", -7),
    ]
    compact = jh.make_counters_compact(triples)
    assert jh.parse_counters(compact) == triples


def test_counters_reference_shape():
    """A hand-written compact string in the exact reference grammar
    parses: {(gname)(gdisp)[(cname)(cdisp)(value)]...}."""
    s = "{(g1)(Group One)[(c1)(C 1)(5)][(c2)(C 2)(6)]}{(g2)(G2)[(c3)(C3)(7)]}"
    assert jh.parse_counters(s) == [
        ("g1", "c1", 5), ("g1", "c2", 6), ("g2", "c3", 7)
    ]


def test_history_df_spark(spark, tmp_path):
    p = tmp_path / "job_1.log"
    p.write_text(
        jh.format_record("Meta", {"VERSION": "1"}) + "\n"
        + jh.format_record("Job", {"JOBID": "job_1", "TOTAL_MAPS": "4"}) + "\n"
        + jh.format_record("Task", {"TASKID": "t_1", "TASK_TYPE": "MAP"}) + "\n"
        + jh.format_record("Task", {"TASKID": "t_2", "TASK_TYPE": "REDUCE"}) + "\n"
    )
    df = jh.history_df(spark, str(p))
    rows = df.collect()
    assert {r["rec_type"] for r in rows} == {"Meta", "Job", "Task"}
    tasks = {r["kv"]["TASKID"]: r["kv"] for r in rows if r["rec_type"] == "Task"}
    assert tasks["t_1"]["TASK_TYPE"] == "MAP"
    job = next(r["kv"] for r in rows if r["rec_type"] == "Job")
    assert job["TOTAL_MAPS"] == "4"


def test_history_parse_roundtrip_matches_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "history_parse_roundtrip")


def test_pre020_dialect_trailing_space_terminator():
    """version 0 (pre-0.20 JT logs): a record ends with a bare trailing
    space; a line without one continues onto the next (joined with \\n)."""
    text = (
        'Job JOBID="job_1" USER="alice" \n'
        'Task TASKID="t_1"\n'
        'START_TIME="5" \n'
        'Task TASKID="t_2" '
    )
    recs = jh.parse_records(text, version=0)
    assert [r[0] for r in recs] == ["Job", "Task", "Task"]
    assert recs[0][1] == {"JOBID": "job_1", "USER": "alice"}
    assert recs[1][1] == {"TASKID": "t_1", "START_TIME": "5"}
    assert recs[2][1] == {"TASKID": "t_2"}
    # the same text under the 1.x dialect has no ' .' terminator at all
    assert jh.parse_records(text, version=1) == []


def test_formfeed_segment_boundary_terminates_record():
    """A form feed (concatenated-log segment marker) force-terminates the
    record in progress AND discards the whole marker line — version-0
    dialect only; 1.x values may contain a literal form feed and must
    round-trip (property suite pins that). The reference drops both
    halves of a '\\f'-bearing line: readBalancedLine
    (HadoopLogsAnalyzer.java:651) truncates text before the first '\\f',
    then the segment branch (:682) recurses past the marker text."""
    text = (
        'Job JOBID="job_1"\n'
        "prefix\f!!FILE part-001!!\n"
        'Job JOBID="job_2" '
    )
    recs = jh.parse_records(text, version=0)
    assert [r[0] for r in recs] == ["Job", "Job"]
    assert recs[0][1] == {"JOBID": "job_1"}
    assert recs[1][1] == {"JOBID": "job_2"}
    # the marker line never contributes a record, even when it carries
    # KEY="value" text after the form feed
    text2 = 'Task TASKID="t_1"\n\fJobtracker START_TIME="1" \nTask TASKID="t_2" '
    recs2 = jh.parse_records(text2, version=0)
    assert [r[0] for r in recs2] == ["Task", "Task"]
