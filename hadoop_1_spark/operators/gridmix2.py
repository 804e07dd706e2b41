"""Gridmix2 job-mix compiler: the XML workload descriptor -> job specs.

The reference's second-generation cluster-workload benchmark reads a
Hadoop-configuration XML (``gridmix_config.xml``,
src/benchmarks/gridmix2/README.gridmix2:20-66) describing a mix of six
job classes (streamSort, javaSort, webdataScan, combiner, monsterQuery,
webdataSort) at three sizes, and wires every instance into one JobControl
DAG (GridMixRunner.java:436-447 iterates classes x sizes,
GridMixRunner.java:403-434 expands the per-size ``numOfJobs``/
``numOfReduces`` arrays and spreads the compressed-output flags with the
``select`` rule at GridMixRunner.java:389-397; monsterQuery chains three
dependent stages per logical job, GridMixRunner.java:237-276).

This module reimplements the DESCRIPTOR semantics — property parsing with
``${var}`` expansion, array-valued counts, default fallbacks, the select
spread, the monsterQuery stage chain — so a mix file compiles to a
deterministic job-spec table. Executing a scaled mix is the
``gridmix2_mini`` query's job (queries/q_gridmix.py): on Spark the
dependency DAG is simply lazy plan composition, so the compiled specs
drive DataFrame builders instead of a polling JobControl loop.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

# (size name, default numOfJobs, default numOfReduces) —
# GridMixRunner.java:44-50: *_JOBS_PER_CLASS default 0, reducers 15/170/370.
SIZES = [("small", 0, 15), ("medium", 0, 170), ("large", 0, 370)]

# Declaration order of the GridMixJob enum (GridMixRunner.java:105-310);
# EnumSet.allOf iterates in this order, fixing the mix's job order.
CLASSES = [
    "streamSort",
    "javaSort",
    "webdataScan",
    "combiner",
    "monsterQuery",
    "webdataSort",
]

_VAR = re.compile(r"\$\{([^}]+)\}")


def load_config_xml(source: str) -> dict[str, str]:
    """Parse a Hadoop-style configuration XML (<configuration> of
    <property><name/><value/>) into a dict, expanding ``${var}``
    references against earlier properties (Configuration's variable
    substitution, which gridmix_config.xml uses for the data dirs)."""
    root = (
        ET.fromstring(source)
        if source.lstrip().startswith("<")
        else ET.parse(source).getroot()
    )
    conf: dict[str, str] = {}
    for prop in root.iter("property"):
        name = (prop.findtext("name") or "").strip()
        value = (prop.findtext("value") or "").strip()
        if name:
            conf[name] = value
    def expand(v: str, depth: int = 0) -> str:
        if depth > 10:
            return v
        return _VAR.sub(
            lambda m: expand(conf.get(m.group(1), m.group(0)), depth + 1), v
        )
    return {k: expand(v) for k, v in conf.items()}


def select(total: int, selected: int, index: int) -> bool:
    """GridMixRunner.select (GridMixRunner.java:389-397): spread
    ``selected`` of ``total`` job slots evenly across the index range —
    every ``total // selected``-th index, clipped to the largest multiple
    of ``selected``."""
    if selected <= 0 or selected >= total:
        return selected > 0
    step = total // selected
    effective_total = total - total % selected
    return index <= effective_total - 1 and index % step == 0


def _ints(conf: dict[str, str], name: str, default: int) -> list[int]:
    """Configuration.getStrings + per-element parse (GridMixRunner.java:
    360-367): a comma-separated int list, ``[default]`` when absent.

    Exact parity with the reference's stack: StringTokenizer(str, ",")
    SKIPS empty tokens (StringUtils.getStringCollection:314 — so
    ``8,,2`` legitimately parses as [8, 2]), but Integer.parseInt does
    NOT trim (``8, 2`` throws NumberFormatException), and an all-empty
    value makes StringUtils.getStrings return null (:299-301), which
    getInts dereferences — a crash, not a default. Mirror all three."""
    raw = conf.get(name)
    if raw is None:
        return [default]
    toks = [t for t in raw.split(",") if t != ""]
    if not toks:
        raise ValueError(
            f"{name}={raw!r}: empty value (getStrings returns null; the "
            "reference NPEs in getInts rather than applying the default)"
        )
    for t in toks:
        if t != t.strip():
            raise ValueError(
                f"{name}: {t!r} — Integer.parseInt does not trim whitespace"
            )
    return [int(t) for t in toks]


def compile_mix(conf: dict[str, str]) -> list[dict]:
    """Expand a mix descriptor into one spec per logical job, in the
    reference's submission order (class -> size -> config-array group ->
    instance). Spec fields: job, size, idx (0-based within class x size),
    reducers, mapoutput_compressed, output_compressed, stages (3 chained
    stages for monsterQuery, else 1)."""
    specs: list[dict] = []
    for cls in CLASSES:
        for size, d_jobs, d_red in SIZES:
            prefix = f"{cls}.{size}Jobs"
            num_jobs = _ints(conf, prefix + ".numOfJobs", d_jobs)
            num_reduces = _ints(conf, prefix + ".numOfReduces", d_red)
            if len(num_jobs) != len(num_reduces):
                raise ValueError(
                    f"{prefix}.numOfJobs must match {prefix}.numOfReduces"
                )
            n_moc = int(conf.get(prefix + ".numOfMapoutputCompressed", 0))
            n_oc = int(conf.get(prefix + ".numOfOutputCompressed", d_jobs))
            total = sum(num_jobs)
            idx = 0
            for group, n in enumerate(num_jobs):
                for _ in range(n):
                    specs.append(
                        {
                            "job": cls,
                            "size": size,
                            "idx": idx,
                            "reducers": num_reduces[group],
                            "mapoutput_compressed": select(total, n_moc, idx),
                            "output_compressed": select(total, n_oc, idx),
                            "stages": 3 if cls == "monsterQuery" else 1,
                        }
                    )
                    idx += 1
    return specs


# The reference's shipped gridmix_config.xml mix table (the numeric
# properties of src/benchmarks/gridmix2/gridmix_config.xml, cited above) —
# embedded so the repo is self-contained; tests assert it matches the
# reference file verbatim when the checkout is present. Shape per row:
# (class, size, numOfJobs, numOfReduces, numOfMapoutputCompressed,
#  numOfOutputCompressed); None means "property absent, use default".
SHIPPED_MIX: list[tuple[str, str, str | None, str | None, int | None, int | None]] = [
    ("streamSort", "small", "40", "15", 40, 20),
    ("streamSort", "medium", "16", "170", 16, 12),
    ("streamSort", "large", "5", "370", 5, 3),
    ("javaSort", "small", "8,2", "15,70", 10, 3),
    ("javaSort", "medium", "4,2", "170,70", 6, 4),
    ("javaSort", "large", "3", "370", 3, 2),
    ("webdataScan", "small", "24", None, 24, 0),
    ("webdataScan", "medium", "12", "7", 12, 0),
    ("webdataScan", "large", "2", "70", 3, 3),
    ("combiner", "small", "11,4", "10,1", 15, 0),
    ("combiner", "medium", "8", "100", 8, 0),
    ("combiner", "large", "4", "360", 4, 0),
    ("monsterQuery", "small", "7", "5", 7, 0),
    ("monsterQuery", "medium", "5", "100", 5, 0),
    ("monsterQuery", "large", "3", "370", 3, 0),
    ("webdataSort", "small", "7", "15", 7, 7),
    ("webdataSort", "medium", "4", "170", 4, 4),
    ("webdataSort", "large", "1", "800", 1, 1),
]


def shipped_conf() -> dict[str, str]:
    """The embedded shipped mix as a configuration dict."""
    conf: dict[str, str] = {}
    for cls, size, jobs, reds, moc, oc in SHIPPED_MIX:
        prefix = f"{cls}.{size}Jobs"
        if jobs is not None:
            conf[prefix + ".numOfJobs"] = jobs
        if reds is not None:
            conf[prefix + ".numOfReduces"] = reds
        if moc is not None:
            conf[prefix + ".numOfMapoutputCompressed"] = str(moc)
        if oc is not None:
            conf[prefix + ".numOfOutputCompressed"] = str(oc)
    return conf
