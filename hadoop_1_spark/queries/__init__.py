"""Named capability queries, grouped by operator family (SURVEY.md §2).

Each module registers queries into hadoop_1_spark.registry via the
``@register`` decorator; importing the package from registry.py wires the
whole catalog.
"""
