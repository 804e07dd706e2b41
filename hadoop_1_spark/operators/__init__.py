"""Operator builders mirroring the reference's mapred/lib, mapred/join,
mapred/lib/aggregate, and contrib operator inventory (SURVEY.md §2).

Every builder is a pure function DataFrame -> DataFrame so Catalyst sees the
whole plan (no opaque stages) and can push filters/prune columns through it.
"""
