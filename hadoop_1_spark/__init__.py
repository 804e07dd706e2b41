"""hadoop_1_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Hadoop 1 (reference: kambatla/hadoop-1).

The reference engine is MapReduce: (key, value) records streamed through
map -> shuffle/sort -> reduce, plus a library of relational-ish operators
(mapred/lib, mapred/join, mapred/lib/aggregate, contrib streaming/data_join/
index).  This package re-expresses *what those operators compute* as thin,
well-tested builders over the Spark DataFrame API, letting Catalyst/Tungsten
pick physical strategies (partial aggregation, external sort, shuffle,
broadcast) that Hadoop 1 hand-rolled.

Layout
------
- ``session``    SparkSession factory tuned for the driver harness.
- ``io``         read/write facade (text, kv-text, csv, parquet, jdbc, ...).
- ``operators``  relational operator builders mirroring SURVEY.md §2.
- ``functions``  scalar/aggregate helpers + LLM-data-pipeline extensions
                 (dedup, similarity, text analysis, multimodal).
- ``sources``    synthetic generators (range / random writer / teragen).
- ``streaming``  Structured Streaming windowed aggregations (extension).
"""

from hadoop_1_spark.session import get_spark, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]

__version__ = "0.1.0"
