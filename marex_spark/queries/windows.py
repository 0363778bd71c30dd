"""SURVEY.md §2.5/§2.6 window-function operators over the star schema.

All window sums over doubles go through DECIMAL (exact under any
evaluation order — DuckDB uses segment trees for windowed aggs, Spark
streams the frame; decimal makes both exact). Every ORDER BY carries a
unique tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from marex_spark.functions.decimals import dsum
from marex_spark.queries.registry import register
from marex_spark.sources.parquet import load_table

_DEC = "decimal(38,6)"


@register(
    "w1_rolling_mean",
    """SELECT event_id,
              CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) / COUNT(value) OVER w AS roll_mean
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)""",
)
def w1_rolling_mean(spark, sf_dir):
    """Centered rolling mean (detect.py:1810-1812, 21-day smoother →
    rowsBetween frame)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 2)
    return ev.select(
        "event_id",
        (
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("roll_mean"),
    )


@register(
    "w5_lead_lag",
    """SELECT event_id,
              LEAD(value) OVER w AS next_value,
              LAG(value)  OVER w AS prev_value
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def w5_lead_lag(spark, sf_dir):
    """Temporal shift ±1 (track.py:2474 shift(time: -1))."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.lead("value").over(w).alias("next_value"),
        F.lag("value").over(w).alias("prev_value"),
    )


@register(
    "w6_cumsum_offset",
    """WITH m AS (SELECT CAST(day(ts) AS BIGINT) AS d, MAX(event_id) AS max_id
                  FROM events GROUP BY 1)
       SELECT d, CAST(COALESCE(SUM(max_id) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS id_offset
       FROM m""",
)
def w6_cumsum_offset(spark, sf_dir):
    """Cumulative max-ID offsets that make per-time labels globally
    unique (track.py:2762-2766)."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(F.dayofmonth("ts").cast("long").alias("d")).agg(
        F.max("event_id").alias("max_id")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, -1)
    return m.select(
        "d",
        F.coalesce(F.sum("max_id").over(w), F.lit(0)).cast("long").alias("id_offset"),
    )


@register(
    "w7_cdf_cumsum",
    """WITH h AS (
         SELECT event_type,
                CAST(CASE WHEN value < 0 THEN 0
                     ELSE LEAST(GREATEST(1 + CAST(FLOOR(value / 10.0) AS BIGINT), 1), 51)
                     END AS INT) AS bin,
                COUNT(*) AS c
         FROM events GROUP BY 1, 2)
       SELECT event_type, bin,
              CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cdf
       FROM h""",
)
def w7_cdf_cumsum(spark, sf_dir):
    """Histogram → cumulative CDF over bins (detect.py:2510, 2780)."""
    from marex_spark.functions.binning import clip

    ev = load_table(spark, sf_dir, "events")
    pos = clip(F.lit(1) + F.floor(F.col("value") / 10.0).cast("long"), 1, 51)
    h = (
        ev.select(
            "event_type",
            F.when(F.col("value") < 0, F.lit(0)).otherwise(pos).cast("int").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("c"))
    )
    w = W.partitionBy("event_type").orderBy("bin")
    return h.select(
        "event_type", "bin", F.sum("c").over(w).cast("long").alias("cdf")
    )


@register(
    "wr_topk_per_group",
    """WITH r AS (
         SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders)
       SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
       FROM r WHERE rn <= 3""",
)
def wr_topk_per_group(spark, sf_dir):
    """Top-K per group via row_number (SURVEY §2.6 — needed for ID
    compaction and deterministic output)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "wr_dense_rank_compact",
    """SELECT DISTINCT l_suppkey,
              CAST(DENSE_RANK() OVER (ORDER BY l_suppkey) AS BIGINT) AS compact_id
       FROM lineitem""",
)
def wr_dense_rank_compact(spark, sf_dir):
    """dense_rank ID compaction (replaces track.py:2888-2897's dict)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_suppkey", F.dense_rank().over(W.orderBy("l_suppkey")).cast("long").alias("compact_id")
    ).distinct()


@register(
    "sess_sessionize",
    """WITH g AS (
         SELECT user_id, event_id, ts,
                CASE WHEN epoch_us(ts) - epoch_us(COALESCE(LAG(ts) OVER w, ts)) > 3600000000
                     THEN 1 ELSE 0 END AS new_sess
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, event_id,
              CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_idx
       FROM g""",
)
def sess_sessionize(spark, sf_dir):
    """Sessionization: lag-gap flag + running sum (guide §OLAP; the
    batch analogue of session_window in streaming). Gap compare in
    microseconds on both sides (second-truncation would diverge)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.coalesce(F.lag("ts").over(w), F.col("ts")))
    g = ev.select(
        "user_id", "event_id", "ts", F.when(gap > 3600000000, 1).otherwise(0).alias("new_sess")
    )
    return g.select(
        "user_id",
        "event_id",
        F.sum("new_sess").over(w).cast("long").alias("session_idx"),
    )


@register(
    "ops_asof_join",
    """WITH r AS (
         SELECT CAST(o_custkey % 100 AS BIGINT) AS k,
                CAST(o_orderdate AS TIMESTAMP) AS t,
                MAX(o_orderkey) AS last_orderkey,
                COUNT(*) AS n_orders
         FROM orders GROUP BY 1, 2),
       e AS (SELECT CAST(user_id AS BIGINT) AS k, event_id, ts FROM events)
       SELECT e.k AS user_id, e.event_id,
              r.last_orderkey AS last_orderkey_r,
              CAST(r.n_orders AS BIGINT) AS n_orders_r
       FROM e ASOF LEFT JOIN r ON e.k = r.k AND e.ts >= r.t""",
)
def ops_asof_join(spark, sf_dir):
    """As-of join (the brief's canonical custom operator; DuckDB has it
    natively — the oracle IS the ASOF LEFT JOIN syntax): each event
    picks the latest order state of its user at or before the event
    time. Right side pre-aggregated to one row per (key, date) so the
    pick is deterministic. One shuffle per side, no range-join
    candidate blowup (operators/asof.py)."""
    from marex_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("k"), "event_id", "ts"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (F.col("o_custkey") % 100).cast("long").alias("k"),
            F.col("o_orderdate").cast("timestamp").alias("t"),
        )
        .agg(
            F.max("o_orderkey").alias("last_orderkey"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )
    out = asof_join(ev, orders, on="k", left_time="ts", right_time="t")
    return out.select(
        F.col("k").alias("user_id"),
        "event_id",
        F.col("last_orderkey_r"),
        F.col("n_orders_r"),
    )


@register(
    "ops_range_join",
    """WITH iv AS (
         SELECT user_id, event_id AS start_event_id, ts AS s,
                ts + INTERVAL 10 MINUTE AS e
         FROM events WHERE event_id % 10 = 0)
       SELECT p.user_id, p.event_id, iv.start_event_id
       FROM events p JOIN iv
         ON p.user_id = iv.user_id AND p.ts >= iv.s AND p.ts <= iv.e""",
)
def ops_range_join(spark, sf_dir):
    """Range join (the brief's custom-operator list): events falling in
    the 10-minute window after each per-user anchor event. Spark-side
    this is the BINNED equi-join form (operators/asof.range_join_binned
    — bounded interval fan-out, hash shuffle, no nested-loop); the
    oracle is DuckDB's plain inequality join."""
    from marex_spark.operators.asof import range_join_binned

    ev = load_table(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_id") % 10 == 0).select(
        "user_id",
        F.col("event_id").alias("start_event_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
    )
    pts = ev.select("user_id", "event_id", "ts")
    out = range_join_binned(
        pts, iv, on="user_id", point_time="ts", start_col="s",
        end_col="e", bucket="10 minutes",
    )
    return out.select("user_id", "event_id", "start_event_id")


@register(
    "ops_rollup_hier",
    """SELECT source, lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars,
              CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid
       FROM documents GROUP BY ROLLUP (source, lang)""",
)
def ops_rollup_hier(spark, sf_dir):
    """Hierarchical rollup (the "hypertable rollup" family): per
    (source, lang), per source, and grand-total aggregates in ONE pass
    via GROUP BY ROLLUP — Catalyst expands the grouping sets with a
    single shuffle, the multi-resolution continuous-aggregate shape."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.rollup("source", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            (F.grouping("source") * 2 + F.grouping("lang"))
            .cast("long")
            .alias("gid"),
        )
    )


@register(
    "evt_funnel",
    """WITH v AS (
         SELECT user_id, MIN(ts) AS t1 FROM events
         WHERE event_type = 'view' GROUP BY 1),
       c AS (
         SELECT e.user_id, MIN(e.ts) AS t2
         FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
         WHERE e.event_type = 'click' GROUP BY 1),
       p AS (
         SELECT e.user_id, MIN(e.ts) AS t3
         FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
         WHERE e.event_type = 'purchase' GROUP BY 1)
       SELECT 1 AS stage, 'view' AS event_type, COUNT(*) AS n_users FROM v
       UNION ALL
       SELECT 2, 'click', COUNT(*) FROM c
       UNION ALL
       SELECT 3, 'purchase', COUNT(*) FROM p""",
)
def evt_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase: a user
    counts at stage k only with a stage-k event STRICTLY AFTER their
    stage-(k-1) entry time (classic product-analytics funnel).

    Scale shape: each stage is one filtered aggregation plus an
    equi-join on user_id against the (users-sized, shrinking) previous
    stage — no window over the full event log, no per-user event
    collection; all three stages reuse the user_id hash partitioning."""
    ev = load_table(spark, sf_dir, "events")

    def stage(prev, etype, tcol_prev, tcol):
        e = ev.filter(F.col("event_type") == etype)
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(tcol))
        return (
            e.join(prev, "user_id")
            .filter(F.col("ts") > F.col(tcol_prev))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    v = stage(None, "view", None, "t1")
    c = stage(v, "click", "t1", "t2")
    p = stage(c, "purchase", "t2", "t3")

    def cnt(df, k, name):
        return df.agg(
            F.lit(k).cast("int").alias("stage"),
            F.lit(name).alias("event_type"),
            F.count("*").alias("n_users"),
        )

    return cnt(v, 1, "view").unionByName(cnt(c, 2, "click")).unionByName(
        cnt(p, 3, "purchase")
    )


@register(
    "evt_retention_cohorts",
    """WITH firstday AS (
         SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
         FROM events GROUP BY 1)
       SELECT f.cohort_day,
              CAST(CAST(e.ts AS DATE) - f.cohort_day AS BIGINT) AS day_offset,
              COUNT(DISTINCT e.user_id) AS n_users
       FROM events e JOIN firstday f ON f.user_id = e.user_id
       GROUP BY 1, 2""",
)
def evt_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-activity day,
    counted distinct per (cohort, day offset) — the other staple
    product-analytics rollup. Two aggregations on the user_id layout;
    the cohort table is users-sized and co-partitions with the event
    log on the join key."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
