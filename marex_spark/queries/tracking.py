"""Tracking/labelling queries (SURVEY §2.9) — filled in once
marex_spark.operators.{label,overlap,components,track} land. These are
the non-SQL-expressible operators (connected components, iterative
fixpoints): they register without an oracle and are verified by the
engine's own test suite instead."""
