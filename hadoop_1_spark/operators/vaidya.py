"""Vaidya rule-descriptor XML loader and the five shipped diagnostic
tests as DataFrame expression builders.

The reference's post-execution diagnoser reads an XML descriptor file
listing DiagnosticTests (contrib/vaidya/.../PostExPerformanceDiagnoser.java:43
loads it, DiagnosticTest.java:102-160 exposes Title / Description /
Importance / SuccessThreshold / Prescription / InputElement, and
DiagnosticTest.java:306 defines TEST POSITIVE as impact >= SuccessThreshold),
then evaluates each test's Java class against a finished job's counters.

Here the descriptor file parses into :class:`VaidyaTestDescriptor` rows and
each shipped ClassName maps to a builder that emits the equivalent
:class:`~hadoop_1_spark.pipelines.VaidyaRule` over a per-job counters
DataFrame — so the reference's own ``postex_diagnosis_tests.xml`` drives
:func:`~hadoop_1_spark.pipelines.vaidya_diagnose` unchanged.

Counter-column contract (one row per job, names mirror JobKeys /
aggregated task keys):

  jobtype                    'MAP_ONLY' or 'MAP_REDUCE'
  total_maps, launched_maps, total_reduces, launched_reduces   bigint
  map_input_bytes, map_output_bytes, hdfs_bytes_read           bigint
  file_bytes_written_maps    bigint (sum of map-task FILE_BYTES_WRITTEN)
  reduce_input_records       bigint (job-level REDUCE_INPUT_RECORDS)
  reduce_input_records_list  array<bigint> (per-reduce-task INPUT_RECORDS)

Faithful-quirk note: the reference computes several impacts in Java
``long`` arithmetic — MapsReExecutionImpact.java:59, ReducesReExecution
Impact.java:65 and ReadingHDFSFilesAsSideEffect.java:78 all divide two
longs, so the quotient TRUNCATES before any double math. The builders
replicate that with ``div`` (documented per rule) rather than "fixing" it:
parity with the shipped rules is the point.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from hadoop_1_spark.pipelines import VaidyaRule

# DiagnosticTest.java:37-39 — Importance weight used for severity =
# importance * impact (DiagnosticTest.java:151).
IMPORTANCE_WEIGHT = {"high": 0.99, "medium": 0.66, "low": 0.33}


@dataclass
class VaidyaTestDescriptor:
    """One <DiagnosticTest> element of the rule descriptor XML."""

    title: str
    class_name: str
    description: str
    importance: str
    success_threshold: float
    prescription: str
    input_element: dict[str, str] = field(default_factory=dict)

    @property
    def importance_weight(self) -> float:
        return IMPORTANCE_WEIGHT.get(self.importance.lower(), 0.33)

    def input_double(self, name: str, default: float) -> float:
        """DiagnosticTest.getInputElementDoubleValue (DiagnosticTest.java:
        335): a rule-specific <InputElement> child parsed as double."""
        raw = self.input_element.get(name)
        return default if raw is None else float(raw)


def _text(el: ET.Element | None) -> str:
    return (el.text or "").strip() if el is not None else ""


def load_rules_xml(source: str) -> list[VaidyaTestDescriptor]:
    """Parse a Vaidya rule descriptor (path or XML text) into descriptors.

    Accepts the reference's shipped ``postex_diagnosis_tests.xml`` format:
    <PostExPerformanceDiagnosisTests> containing <DiagnosticTest> elements
    with CDATA-wrapped Title/ClassName/Description/Importance/
    SuccessThreshold/Prescription and an optional <InputElement> whose
    children are per-rule parameters."""
    root = (
        ET.parse(source).getroot()
        if not source.lstrip().startswith("<")
        else ET.fromstring(source)
    )
    out: list[VaidyaTestDescriptor] = []
    for test in root.iter("DiagnosticTest"):
        inp = {
            child.tag: _text(child)
            for ie in test.iter("InputElement")
            for child in ie
        }
        out.append(
            VaidyaTestDescriptor(
                title=_text(test.find("Title")),
                class_name=_text(test.find("ClassName")),
                description=_text(test.find("Description")),
                importance=_text(test.find("Importance")),
                success_threshold=float(_text(test.find("SuccessThreshold")) or "1"),
                prescription=_text(test.find("Prescription")),
                input_element=inp,
            )
        )
    return out


def _normalized(impact: Column, norm: float, inclusive: bool) -> Column:
    """Normalize an impact by ``norm`` and saturate at 1 — the shared tail
    of ReadingHDFSFilesAsSideEffect.java:79-84 (>= compare) and
    MapSideDiskSpill.java:84-88 (> compare)."""
    at_max = impact >= norm if inclusive else impact > norm
    return F.when(at_max, F.lit(1.0)).otherwise(impact / F.lit(norm))


def _balanced_reduce_partitioning(d: VaidyaTestDescriptor) -> Column:
    """BalancedReducePartitioning.java:51-88: sort per-reduce-task input
    record counts descending, count how many tasks ('busy reducers') it
    takes to cover PercentReduceRecords of the job total (the crossing
    task included, and at least one task — the Java loop body runs before
    its break check), impact = 1 - busy/total. MAP_ONLY jobs: 0."""
    pct = d.input_double("PercentReduceRecords", 0.90)
    # (long)(percent * total) — Java truncates the product
    threshold = F.expr(
        f"cast({pct} * reduce_input_records as bigint)"
    )
    busy = F.aggregate(
        F.reverse(F.array_sort(F.col("reduce_input_records_list"))),
        F.struct(
            F.lit(0).cast("bigint").alias("cum"),
            F.lit(0).cast("bigint").alias("busy"),
            threshold.alias("thr"),
        ),
        lambda acc, x: F.when(
            (acc["busy"] > 0) & (acc["cum"] >= acc["thr"]), acc
        ).otherwise(
            F.struct(
                (acc["cum"] + x).alias("cum"),
                (acc["busy"] + F.lit(1).cast("bigint")).alias("busy"),
                acc["thr"].alias("thr"),
            )
        ),
    )["busy"]
    return F.when(F.col("jobtype") == "MAP_ONLY", F.lit(0.0)).otherwise(
        F.lit(1.0) - busy.cast("double") / F.col("total_reduces").cast("double")
    )


def _maps_reexecution(d: VaidyaTestDescriptor) -> Column:
    """MapsReExecutionImpact.java:59 — Java long division: the quotient
    truncates, so impact is 0 until launched >= 2x total."""
    return F.expr("(launched_maps - total_maps) div total_maps").cast("double")


def _reduces_reexecution(d: VaidyaTestDescriptor) -> Column:
    """ReducesReExecutionImpact.java:57-65 — MAP_ONLY jobs: 0; otherwise
    the same truncating long division over reduce counts."""
    return F.when(F.col("jobtype") == "MAP_ONLY", F.lit(0.0)).otherwise(
        F.expr("(launched_reduces - total_reduces) div total_reduces").cast("double")
    )


def _hdfs_side_effect(d: VaidyaTestDescriptor) -> Column:
    """ReadingHDFSFilesAsSideEffect.java:71-86: 1 if bytes appear from
    nowhere (no map input but HDFS reads), 0 if no HDFS reads; otherwise
    the truncating long ratio hdfs_read/map_input normalized by
    NormalizationFactor (saturating at >=)."""
    norm = d.input_double("NormalizationFactor", 2.0)
    ratio = F.expr("hdfs_bytes_read div map_input_bytes").cast("double")
    return (
        F.when(
            (F.col("map_input_bytes") == 0) & (F.col("hdfs_bytes_read") != 0),
            F.lit(1.0),
        )
        .when(F.col("hdfs_bytes_read") == 0, F.lit(0.0))
        .otherwise(_normalized(ratio, norm, inclusive=True))
    )


def _map_side_disk_spill(d: VaidyaTestDescriptor) -> Column:
    """MapSideDiskSpill.java:60-88: local bytes written by maps versus map
    output bytes (map-reduce jobs subtract the expected sort spill),
    truncating long division, normalized by NormalizationFactor
    (saturating at >, not >=)."""
    norm = d.input_double("NormalizationFactor", 3.0)
    mr = F.expr(
        "(file_bytes_written_maps - map_output_bytes) div map_output_bytes"
    ).cast("double")
    map_only = F.expr("file_bytes_written_maps div map_output_bytes").cast("double")
    raw = F.when(F.col("total_reduces") > 0, mr).otherwise(map_only)
    return _normalized(raw, norm, inclusive=False)


# ClassName (as shipped in postex_diagnosis_tests.xml) -> impact builder.
IMPACT_BUILDERS = {
    "org.apache.hadoop.vaidya.postexdiagnosis.tests.BalancedReducePartitioning": _balanced_reduce_partitioning,
    "org.apache.hadoop.vaidya.postexdiagnosis.tests.MapsReExecutionImpact": _maps_reexecution,
    "org.apache.hadoop.vaidya.postexdiagnosis.tests.ReducesReExecutionImpact": _reduces_reexecution,
    "org.apache.hadoop.vaidya.postexdiagnosis.tests.ReadingHDFSFilesAsSideEffect": _hdfs_side_effect,
    "org.apache.hadoop.vaidya.postexdiagnosis.tests.MapSideDiskSpill": _map_side_disk_spill,
}


def rules_from_descriptors(
    descriptors: list[VaidyaTestDescriptor],
) -> list[VaidyaRule]:
    """Compile parsed descriptors into VaidyaRules for vaidya_diagnose:
    test fires when impact >= SuccessThreshold (TEST POSITIVE,
    DiagnosticTest.java:306). Unknown ClassNames raise — a descriptor
    naming a test this engine doesn't implement is a config error, not a
    silent skip."""
    rules: list[VaidyaRule] = []
    for d in descriptors:
        try:
            impact = IMPACT_BUILDERS[d.class_name](d)
        except KeyError:
            raise ValueError(f"no impact builder for {d.class_name}") from None
        rules.append(
            VaidyaRule(d.title, impact >= F.lit(d.success_threshold), impact)
        )
    return rules


def load_rules(source: str) -> list[VaidyaRule]:
    """One-call convenience: descriptor XML (path or text) -> VaidyaRules."""
    return rules_from_descriptors(load_rules_xml(source))
