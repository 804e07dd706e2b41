"""Vaidya rule-descriptor XML loader: parse the reference's own shipped
descriptor file and hand-verify each shipped rule's impact formula
(including the Java long-division truncation quirks) through
vaidya_diagnose."""

from __future__ import annotations

import os

import pytest

from hadoop_1_spark.operators import vaidya
from hadoop_1_spark.pipelines import vaidya_diagnose

REF_XML = (
    "/root/reference/src/contrib/vaidya/src/java/org/apache/hadoop/"
    "vaidya/postexdiagnosis/tests/postex_diagnosis_tests.xml"
)

# Self-contained descriptor in the same grammar (CDATA + InputElement),
# so the parse test does not depend on the reference checkout.
INLINE_XML = """<?xml version="1.0" encoding="ISO-8859-1"?>
<PostExPerformanceDiagnosisTests>
<DiagnosticTest>
  <Title><![CDATA[Impact of Map tasks Re-Execution]]></Title>
  <ClassName><![CDATA[org.apache.hadoop.vaidya.postexdiagnosis.tests.MapsReExecutionImpact]]></ClassName>
  <Description><![CDATA[re-execution check]]></Description>
  <Importance><![CDATA[Medium]]></Importance>
  <SuccessThreshold><![CDATA[0.40]]></SuccessThreshold>
  <Prescription><![CDATA[look at failing nodes]]></Prescription>
  <InputElement>
    <SomeParam><![CDATA[1.5]]></SomeParam>
  </InputElement>
</DiagnosticTest>
</PostExPerformanceDiagnosisTests>
"""

SCHEMA = (
    "job_id string, jobtype string, total_maps bigint, launched_maps bigint,"
    " total_reduces bigint, launched_reduces bigint, map_input_bytes bigint,"
    " map_output_bytes bigint, hdfs_bytes_read bigint,"
    " file_bytes_written_maps bigint, reduce_input_records bigint,"
    " reduce_input_records_list array<bigint>"
)


def _counters(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_parse_inline_descriptor():
    (d,) = vaidya.load_rules_xml(INLINE_XML)
    assert d.title == "Impact of Map tasks Re-Execution"
    assert d.class_name.endswith(".MapsReExecutionImpact")
    assert d.importance == "Medium"
    assert d.importance_weight == 0.66
    assert d.success_threshold == 0.40
    assert d.prescription == "look at failing nodes"
    assert d.input_double("SomeParam", 9.9) == 1.5
    assert d.input_double("Missing", 9.9) == 9.9


@pytest.mark.skipif(not os.path.exists(REF_XML), reason="reference checkout absent")
def test_parse_reference_shipped_xml(spark):
    # spark fixture: building the rule Columns needs an active context
    ds = vaidya.load_rules_xml(REF_XML)
    assert [d.title for d in ds] == [
        "Balanaced Reduce Partitioning",
        "Impact of Map tasks Re-Execution",
        "Impact of Reduce tasks Re-Execution",
        "Map and/or Reduce tasks reading HDFS data as a side effect",
        "Map side disk spill",
    ]
    assert [d.success_threshold for d in ds] == [0.20, 0.40, 0.40, 0.05, 0.3]
    assert ds[0].input_double("PercentReduceRecords", 0.9) == 0.85
    assert ds[3].input_double("NormalizationFactor", 0.0) == 2.0
    assert ds[4].input_double("NormalizationFactor", 0.0) == 3.0
    assert ds[0].importance_weight == 0.99 and ds[4].importance_weight == 0.33
    # every shipped ClassName has an impact builder
    assert vaidya.rules_from_descriptors(ds)


def test_unknown_classname_raises():
    d = vaidya.load_rules_xml(INLINE_XML)[0]
    d.class_name = "org.example.NoSuchTest"
    with pytest.raises(ValueError, match="NoSuchTest"):
        vaidya.rules_from_descriptors([d])


@pytest.mark.skipif(not os.path.exists(REF_XML), reason="reference checkout absent")
def test_shipped_rules_hand_computed(spark):
    """Drive the five shipped rules over synthetic job counters with
    hand-computed impacts (formulas from the tests/*.java evaluate
    methods, including long-division truncation)."""
    rows = [
        # jobA: every rule fires.
        #  maps 25/10 -> (25-10) div 10 = 1       (>= 0.40)
        #  reduces 9/3 -> (9-3) div 3 = 2         (>= 0.40)
        #  balanced: list [80,10,10], total 100, pct .85 -> thr 85;
        #    desc cum 80(busy1) +10=90(busy2) -> 1 - 2/3 = 0.333333 (>= .20)
        #  hdfs: 250 div 100 = 2 >= normF 2 -> 1.0 (>= .05)
        #  spill: (500-100) div 100 = 4 > 3 -> 1.0 (>= .3)
        ("jobA", "MAP_REDUCE", 10, 25, 3, 9, 100, 100, 250, 500, 100, [10, 80, 10]),
        # jobB: nothing fires.
        #  maps (14-10) div 10 = 0; reduces (5-3) div 3 = 0
        #  balanced: [34,33,33] thr 85 -> busy 3 -> impact 0 (< .20)
        #  hdfs: 0 reads -> 0; spill: (100-100) div 100 = 0
        ("jobB", "MAP_REDUCE", 10, 14, 3, 5, 100, 100, 0, 100, 100, [34, 33, 33]),
        # jobC: MAP_ONLY -> balanced/reduce-reexec are 0 by rule; hdfs
        #  reads with zero map input -> 1.0; spill (map-only form):
        #  150 div 100 = 1 -> 1/3 = 0.333333 (>= .3 fires)
        ("jobC", "MAP_ONLY", 10, 10, 0, 0, 0, 100, 50, 150, 0, []),
    ]
    rules = vaidya.load_rules(REF_XML)
    out = vaidya_diagnose(_counters(spark, rows), rules, "job_id")
    got = {(r["job_id"], r["rule"]): r["impact"] for r in out.collect()}
    assert got == {
        ("jobA", "Balanaced Reduce Partitioning"): 0.333333,
        ("jobA", "Impact of Map tasks Re-Execution"): 1.0,
        ("jobA", "Impact of Reduce tasks Re-Execution"): 2.0,
        ("jobA", "Map and/or Reduce tasks reading HDFS data as a side effect"): 1.0,
        ("jobA", "Map side disk spill"): 1.0,
        ("jobC", "Map and/or Reduce tasks reading HDFS data as a side effect"): 1.0,
        ("jobC", "Map side disk spill"): 0.333333,
    }


def test_balanced_partitioning_counts_crossing_task(spark):
    """The busy-reducer loop includes the task that crosses the threshold
    and always counts at least one task (the Java loop body runs before
    its break check), even when the threshold is zero records."""
    d = vaidya.load_rules_xml(INLINE_XML)[0]
    d.class_name = (
        "org.apache.hadoop.vaidya.postexdiagnosis.tests.BalancedReducePartitioning"
    )
    d.title = "balanced"
    d.success_threshold = 0.0
    (rule,) = vaidya.rules_from_descriptors([d])
    rows = [
        # all records in one of 4 reducers: busy=1 -> impact 0.75
        ("skewed", "MAP_REDUCE", 1, 1, 4, 4, 0, 1, 0, 0, 100, [100, 0, 0, 0]),
        # zero total records: thr 0, still counts the first task -> 0.5
        ("empty", "MAP_REDUCE", 1, 1, 2, 2, 0, 1, 0, 0, 0, [0, 0]),
    ]
    out = vaidya_diagnose(_counters(spark, rows), [rule], "job_id")
    got = {r["job_id"]: r["impact"] for r in out.collect()}
    assert got == {"skewed": 0.75, "empty": 0.5}
