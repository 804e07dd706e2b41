#!/usr/bin/env python3
"""Streaming mapper for the gridmix job-5 API-comparison sort: stdin lines
``doc_id<TAB>text`` -> stdout ``key<TAB>doc_id`` where key = the first five
whitespace tokens joined by single spaces (the VARINFLTEXT 1-10-word-key
extraction, src/benchmarks/gridmix/README:66-72).

Runs under both framings: per-line via rdd.pipe (Hadoop Streaming parity)
and batched via subprocess_map_batches (the Arrow path).
"""

import sys

for line in sys.stdin:
    line = line.rstrip("\n")
    if not line:
        continue
    doc_id, _, text = line.partition("\t")
    key = " ".join(text.split()[:5])
    sys.stdout.write(f"{key}\t{doc_id}\n")
