from hadoop_1_spark.sources import generators, io  # noqa: F401
