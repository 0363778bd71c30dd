"""As-of join — the temporal lookup Spark lacks as a built-in (the
brief's canonical "custom operator" example; DuckDB/kdb ship it
natively, Flink calls it a temporal table join).

For each left row, attach the latest right row with the same key and
``right_time <= left_time``. Expressed as a UNION + per-key
last-non-null window instead of a range join: both sides shuffle ONCE
by key, the window scans each key's merged timeline in time order, and
there is no (left × right-candidates) intermediate at all — the plan
that survives a skewed 100 TB fact table where a range join's
per-row candidate scan blows up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row + the payload columns of the
    most recent right row at or before its time (``backward``; the
    only direction the reference pattern needs — ``forward`` mirrors
    it with a reversed ordering). Right payload columns are suffixed;
    left rows with no earlier right row keep nulls (left-outer
    semantics, matching DuckDB's ASOF LEFT JOIN).

    Ties: a right row AT the left timestamp is eligible; multiple
    right rows at the same (key, time) resolve to the one last in the
    window's deterministic tiebreak order (right rows sort before left
    rows at equal times via the side marker).

    NULL times follow SCALAR comparison semantics: a NULL left or
    right time never matches (like a NULL key). This deliberately
    differs from DuckDB's native ASOF operator, whose sort-based
    implementation treats a NULL time as +infinity — the differential
    test pins our rule against an explicit lateral-subquery spec.
    """
    if direction not in ("backward", "forward"):
        from marex_spark.exceptions import ConfigurationError

        raise ConfigurationError(
            "asof_join direction must be 'backward' or 'forward'",
            details={"got": direction},
        )
    payload = [c for c in right.columns if c not in (on, right_time)]
    lcols = left.columns

    l_tag = left.withColumn("_t", F.col(left_time)).withColumn(
        "_side", F.lit(1)
    )
    # carry the matched right ROW as one struct: last-non-null over the
    # struct picks the latest right row as a unit, so a NULL payload in
    # that row stays NULL (per-column fills resurrected stale values
    # and could mix columns from different right rows)
    # NULL-time right rows can never satisfy the comparison (NULL
    # <= t is never true) but would sort first under the backward
    # ordering and pollute the running fill — drop them up front
    r_tag = right.filter(
        F.col(on).isNotNull() & F.col(right_time).isNotNull()
    ).select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("_row"),
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows sort BEFORE left rows at the same _t, so an
    # equal-timestamp right row is visible to the left row (<= rule)
    order = (
        [F.col("_t").asc(), F.col("_side").asc()]
        if direction == "backward"
        else [F.col("_t").desc(), F.col("_side").asc()]
    )
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.withColumn("_f", F.last("_row", ignorenulls=True).over(w))
    # NULL join keys never match in an equality join, and a NULL
    # left time never satisfies the comparison (DuckDB ASOF
    # semantics): blank their fill
    fill = F.when(
        F.col(on).isNotNull() & F.col("_t").isNotNull(), F.col("_f")
    )
    return (
        filled.filter(F.col("_side") == 1)
        .withColumn("_f", fill)
        .select(
            *lcols,
            *[F.col(f"_f.{c}").alias(f"{c}{suffix}") for c in payload],
        )
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_time: str,
    start_col: str,
    end_col: str,
    bucket: str = "7 days",
) -> DataFrame:
    """Point-in-interval range join, bucketed (the scale form of the
    brief's "range join" custom operator). A naive t BETWEEN s AND e
    join plans as a broadcast-nested-loop — O(points × intervals) per
    key. Instead each interval explodes into the time buckets it
    covers (bounded fan-out: ⌈len/bucket⌉+1 rows) and the join is an
    EQUI-join on (key, bucket) + an exact containment filter, which
    Catalyst shuffles hash-partitioned like any other join. Intervals
    much longer than ``bucket`` fan out more — pick bucket ≈ the
    typical interval length."""
    secs = F.unix_timestamp  # seconds resolution is enough for bucketing
    # interval width in seconds, parsed driver-side; singular and plural
    # unit forms accepted, typed error otherwise
    unit_s = {
        "week": 604800, "weeks": 604800,
        "day": 86400, "days": 86400,
        "hour": 3600, "hours": 3600,
        "minute": 60, "minutes": 60,
        "second": 1, "seconds": 1,
    }
    try:
        qty, unit = bucket.split()
        width = int(qty) * unit_s[unit.lower()]
    except (ValueError, KeyError):
        from marex_spark.exceptions import ConfigurationError

        raise ConfigurationError(
            "bucket must be '<n> <unit>' with unit in "
            "weeks/days/hours/minutes/seconds",
            details={"got": bucket},
        ) from None

    p_b = points.withColumn("_bkt", F.floor(secs(point_time) / width))
    i_b = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(secs(start_col) / width),
                F.floor(secs(end_col) / width),
            )
        ),
    )
    return (
        p_b.join(i_b, [on, "_bkt"])
        .filter(
            (F.col(point_time) >= F.col(start_col))
            & (F.col(point_time) <= F.col(end_col))
        )
        .drop("_bkt")
    )
