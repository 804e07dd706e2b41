"""Gridmix2 mix compiler: descriptor parsing, the select() spread rule,
and agreement between the reference's shipped XML and the embedded copy."""

from __future__ import annotations

import os

import pytest

from hadoop_1_spark.operators import gridmix2

REF_XML = "/root/reference/src/benchmarks/gridmix2/gridmix_config.xml"


def test_select_spread_rule():
    """GridMixRunner.select: degenerate edges then the even-spread rule."""
    assert not gridmix2.select(10, 0, 0)
    assert not gridmix2.select(10, -1, 5)
    assert all(gridmix2.select(10, 10, i) for i in range(10))
    assert all(gridmix2.select(10, 12, i) for i in range(10))
    # 3 of 10: step 3, effective total 9 -> indices 0, 3, 6 fire
    fired = [i for i in range(10) if gridmix2.select(10, 3, i)]
    assert fired == [0, 3, 6]
    # 4 of 10: step 2, effective total 8 -> 0, 2, 4, 6 (not 8: clipped)
    fired = [i for i in range(10) if gridmix2.select(10, 4, i)]
    assert fired == [0, 2, 4, 6]


def test_var_expansion():
    conf = gridmix2.load_config_xml(
        """<configuration>
             <property><name>BASE</name><value>/gridmix/data</value></property>
             <property><name>VARCOMPSEQ</name><value>${BASE}/Web</value></property>
             <property><name>X</name><value>${VARCOMPSEQ}/part-0</value></property>
           </configuration>"""
    )
    assert conf["X"] == "/gridmix/data/Web/part-0"


def test_mismatched_arrays_raise():
    conf = {
        "javaSort.smallJobs.numOfJobs": "8,2",
        "javaSort.smallJobs.numOfReduces": "15",
    }
    with pytest.raises(ValueError, match="numOfJobs must match"):
        gridmix2.compile_mix(conf)


def test_ints_java_parity():
    """StringTokenizer skips empty tokens ('8,,2' -> [8,2]); parseInt
    does not trim (' 2' throws); an all-empty value NPEs in getInts
    rather than falling back to the default (StringUtils.java:299)."""
    assert gridmix2._ints({"k": "8,,2"}, "k", 1) == [8, 2]
    assert gridmix2._ints({}, "k", 7) == [7]
    with pytest.raises(ValueError, match="parseInt"):
        gridmix2._ints({"k": "8, 2"}, "k", 1)
    with pytest.raises(ValueError, match="empty value"):
        gridmix2._ints({"k": ""}, "k", 1)
    with pytest.raises(ValueError, match="empty value"):
        gridmix2._ints({"k": ",,"}, "k", 1)


def test_shipped_mix_expansion():
    """Hand-checked corners of the shipped mix: array-valued javaSort
    groups, full-coverage streamSort map compression, the 20-of-40
    output-compression spread, and monsterQuery's 3-stage chain."""
    specs = gridmix2.compile_mix(gridmix2.shipped_conf())
    assert len(specs) == 172  # logical jobs
    # JobControl node count: monsterQuery adds 2 extra chained stages each
    assert sum(s["stages"] for s in specs) == 172 + 2 * 15
    js = [s for s in specs if s["job"] == "javaSort" and s["size"] == "small"]
    assert len(js) == 10
    assert [s["reducers"] for s in js] == [15] * 8 + [70] * 2
    ss = [s for s in specs if s["job"] == "streamSort" and s["size"] == "small"]
    assert all(s["mapoutput_compressed"] for s in ss)  # 40 of 40
    # 20 of 40 outputs compressed: every 2nd index
    assert [s["idx"] for s in ss if s["output_compressed"]] == list(range(0, 40, 2))
    # webdataScan.small has no numOfReduces property -> size default 15
    ws = [s for s in specs if s["job"] == "webdataScan" and s["size"] == "small"]
    assert {s["reducers"] for s in ws} == {15}
    mq = [s for s in specs if s["job"] == "monsterQuery"]
    assert {s["stages"] for s in mq} == {3} and len(mq) == 15


@pytest.mark.skipif(not os.path.exists(REF_XML), reason="reference checkout absent")
def test_reference_xml_matches_embedded_copy():
    """The embedded shipped-mix table compiles to the same specs as the
    reference's actual gridmix_config.xml."""
    ref = gridmix2.compile_mix(gridmix2.load_config_xml(REF_XML))
    emb = gridmix2.compile_mix(gridmix2.shipped_conf())
    assert ref == emb
