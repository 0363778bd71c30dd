"""marex_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `wienkers/marEx` package
(marine-extremes detect + track), rebuilt Spark-first.

Reference (read-only, for semantics only): /root/reference/
Blueprint: SURVEY.md at the repo root.

Layout
------
- ``session``    : SparkSession builder tuned for local[N] + oracle parity.
- ``datamodel``  : long-format schemas + dimension-name mapping.
- ``sources``    : parquet star-schema loaders + synthetic fixture generators.
- ``functions``  : scalar/temporal/geometry/binning column helpers.
- ``operators``  : the engine — climatology, thresholds, labelling,
                   morphology, overlap/tracking, stats, dedup, similarity,
                   text analysis, multimodal plumbing.
- ``queries``    : the driver-facing registry mapping SURVEY.md §2 operator
                   IDs to (spark_fn, oracle_sql) pairs.
- ``streaming``  : Structured-Streaming-compatible wrappers.
"""

__version__ = "0.1.0"

from marex_spark.session import get_spark  # noqa: F401
