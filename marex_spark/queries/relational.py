"""SURVEY.md §2 relational operator inventory expressed over the driver's
star schema, each with a DuckDB oracle.

Names map to §2 IDs (S scans, P filters, J joins, A aggregations,
SO set-ops, F scalar functions) plus TPC-H classics as headline queries.

Determinism: see queries/registry.py — decimal sums, round6, explicit
casts, deterministic tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from marex_spark.functions.binning import clip
from marex_spark.functions.decimals import davg, davg_sql, dec_sql, dsum
from marex_spark.queries.registry import register, round6, round6_sql
from marex_spark.sources.parquet import load_table


# ---------------------------------------------------------------- scans S1

@register(
    "s1_scan_pushdown",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
       FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'""",
)
def s1_scan_pushdown(spark, sf_dir):
    """Columnar scan with predicate pushdown + column pruning.

    Reference: marEx lazy zarr scan (detect.py:409). The plan must show
    PushedFilters + a 3-column ReadSchema.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


# -------------------------------------------------------------- filters P*

@register(
    "p2_finite_filter",
    """SELECT event_id, user_id, value FROM events
       WHERE value IS NOT NULL AND NOT isnan(value)""",
)
def p2_finite_filter(spark, sf_dir):
    """Finite-validity predicate (detect.py:222, np.isfinite)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("value").isNotNull() & ~F.isnan("value")).select(
        "event_id", "user_id", "value"
    )


@register(
    "p3_validation_audit",
    """SELECT user_id, COUNT(*) AS n_total,
              CAST(SUM(CASE WHEN value IS NULL OR isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid
       FROM events GROUP BY user_id""",
)
def p3_validation_audit(spark, sf_dir):
    """NaN-audit validation scan (detect.py:205-279)."""
    ev = load_table(spark, sf_dir, "events")
    bad = F.when(F.col("value").isNull() | F.isnan("value"), 1).otherwise(0)
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_total"), F.sum(bad).cast("long").alias("n_invalid")
    )


@register(
    "p4_threshold_predicate",
    f"""WITH thr AS (
          SELECT event_type, {davg_sql('value')} AS thr
          FROM events GROUP BY event_type)
        SELECT e.event_id, e.event_type, e.value
        FROM events e JOIN thr t ON e.event_type = t.event_type
        WHERE e.value >= t.thr""",
)
def p4_threshold_predicate(spark, sf_dir):
    """Threshold predicate against a per-group threshold table
    (detect.py:2004 `extremes = anomaly >= threshold`)."""
    ev = load_table(spark, sf_dir, "events")
    thr = ev.groupBy("event_type").agg(davg("value", "thr"))
    return (
        ev.join(F.broadcast(thr), "event_type")
        .filter(F.col("value") >= F.col("thr"))
        .select("event_id", "event_type", "value")
    )


@register(
    "p5_time_slice",
    """SELECT CAST(day(ts) AS BIGINT) AS d, COUNT(*) AS n
       FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
       GROUP BY 1""",
)
def p5_time_slice(spark, sf_dir):
    """Time-range slice (detect.py:638-641 shifting-baseline trim)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy(F.dayofmonth("ts").cast("long").alias("d"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "p6_semi_join",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000)""",
)
def p6_semi_join(spark, sf_dir):
    """ID-set membership via left-semi join (track.py:1895 isin)."""
    li = load_table(spark, sf_dir, "lineitem")
    keep = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return li.join(keep, li.l_orderkey == keep.o_orderkey, "left_semi").select(
        "l_orderkey", "l_linenumber"
    )


@register(
    "p6_anti_join",
    """SELECT l_orderkey, l_linenumber FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 200000)""",
)
def p6_anti_join(spark, sf_dir):
    """Complement of p6 — left-anti (SO2's set-difference shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    keep = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return li.join(keep, li.l_orderkey == keep.o_orderkey, "left_anti").select(
        "l_orderkey", "l_linenumber"
    )


@register(
    "p7_positive_id_cleanup",
    """SELECT event_id,
              CASE WHEN value >= 50 THEN user_id ELSE 0 END AS cleaned_id
       FROM events""",
)
def p7_positive_id_cleanup(spark, sf_dir):
    """Filler/negative-ID zeroing (track.py:1398)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") >= 50, F.col("user_id")).otherwise(F.lit(0)).alias("cleaned_id"),
    )


@register(
    "p8_dtype_casts",
    """SELECT l_orderkey, l_linenumber,
              CAST(l_quantity AS REAL) AS qty_f32,
              CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
              CAST(l_linenumber AS SMALLINT) AS linenum_i16
       FROM lineitem""",
)
def p8_dtype_casts(spark, sf_dir):
    """Dtype casts (detect.py:600 float32, track.py:2045 int32).
    Note: double→int uses FLOOR on both sides (DuckDB CAST rounds,
    Spark truncates — FLOOR removes the ambiguity)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("float").alias("qty_f32"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.col("l_linenumber").cast("short").alias("linenum_i16"),
    )


# ---------------------------------------------------------------- joins J*

@register(
    "j1_climatology_align",
    f"""WITH clim AS (
          SELECT event_type, CAST(day(ts) AS BIGINT) AS d, {davg_sql('value')} AS clim
          FROM events GROUP BY 1, 2)
        SELECT e.event_id, e.value - c.clim AS anom
        FROM events e
        JOIN clim c ON e.event_type = c.event_type AND CAST(day(e.ts) AS BIGINT) = c.d""",
)
def j1_climatology_align(spark, sf_dir):
    """Climatology re-alignment join (detect.py:1676-1688): group-mean per
    (type, day) joined back onto each row, anomaly = value − clim."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "d", F.dayofmonth("ts").cast("long")
    )
    clim = ev.groupBy("event_type", "d").agg(davg("value", "clim"))
    return ev.join(clim, ["event_type", "d"]).select(
        "event_id", (F.col("value") - F.col("clim")).alias("anom")
    )


@register(
    "j3_broadcast_threshold",
    f"""WITH thr AS (SELECT user_id, {davg_sql('value')} AS thr FROM events GROUP BY 1)
        SELECT e.user_id, COUNT(*) AS n_above
        FROM events e JOIN thr t ON e.user_id = t.user_id
        WHERE e.value > t.thr GROUP BY e.user_id""",
)
def j3_broadcast_threshold(spark, sf_dir):
    """Global threshold compare via broadcast equi-join (detect.py:2910-2915)."""
    ev = load_table(spark, sf_dir, "events")
    thr = ev.groupBy("user_id").agg(davg("value", "thr"))
    return (
        ev.join(F.broadcast(thr), "user_id")
        .filter(F.col("value") > F.col("thr"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_above"))
    )


@register(
    "j5_temporal_selfjoin",
    """SELECT a.l_suppkey AS id_t, b.l_suppkey AS id_next, COUNT(*) AS overlap_n
       FROM lineitem a JOIN lineitem b
         ON a.l_partkey = b.l_partkey
        AND CAST(b.l_shipdate AS DATE) = CAST(a.l_shipdate AS DATE) + 1
       GROUP BY 1, 2""",
)
def j5_temporal_selfjoin(spark, sf_dir):
    """Temporal overlap self-join (track.py:2474-2504): pair each key's
    time-t rows with time-t+1 rows, aggregate overlap counts. The
    engine's single most important join (SURVEY J5)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(
        F.col("l_partkey").alias("k"),
        F.col("l_suppkey").alias("id_t"),
        F.to_date("l_shipdate").alias("d"),
    )
    b = li.select(
        F.col("l_partkey").alias("k"),
        F.col("l_suppkey").alias("id_next"),
        F.to_date("l_shipdate").alias("d_next"),
    )
    return (
        a.join(b, (a.k == b.k) & (b.d_next == F.date_add(a.d, 1)))
        .groupBy("id_t", "id_next")
        .agg(F.count("*").alias("overlap_n"))
    )


@register(
    "j6_property_lookup",
    """SELECT o.o_orderkey, c.c_mktsegment, c.c_acctbal
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
)
def j6_property_lookup(spark, sf_dir):
    """Property lookup via broadcast join (track.py:2539-2541 props.sel)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_mktsegment", "c_acctbal"
    )


@register(
    "j8_id_remap",
    """WITH remap AS (
         SELECT s_suppkey, CAST(ROW_NUMBER() OVER (ORDER BY s_acctbal, s_suppkey) AS BIGINT) AS new_id
         FROM supplier)
       SELECT r.new_id, COUNT(*) AS n
       FROM lineitem l JOIN remap r ON l.l_suppkey = r.s_suppkey
       GROUP BY 1""",
)
def j8_id_remap(spark, sf_dir):
    """ID-remap broadcast join (track.py:2894-2926 map_IDs_to_indices):
    original IDs → dense final IDs via a small mapping table."""
    from pyspark.sql import Window as W

    sup = load_table(spark, sf_dir, "supplier")
    remap = sup.select(
        "s_suppkey",
        F.row_number().over(W.orderBy("s_acctbal", "s_suppkey")).cast("long").alias("new_id"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(remap), li.l_suppkey == remap.s_suppkey)
        .groupBy("new_id")
        .agg(F.count("*").alias("n"))
    )


@register(
    "j9_explode_scatter",
    """SELECT o_orderkey, CAST(t.sib AS BIGINT) AS sib
       FROM orders, UNNEST(generate_series(1, o_orderkey % 3 + 1)) AS t(sib)""",
)
def j9_explode_scatter(spark, sf_dir):
    """Merge-ledger scatter (track.py:3031-3106): explode generated
    sibling lists to (row, sibling) pairs."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.explode(
            F.sequence(F.lit(1).cast("long"), (F.col("o_orderkey") % 3 + 1).cast("long"))
        ).alias("sib"),
    )


# --------------------------------------------------------- aggregations A*

@register(
    "a1_doy_climatology",
    f"""SELECT CAST(dayofyear(l_shipdate) AS BIGINT) AS doy, {davg_sql('l_quantity')} AS clim
        FROM lineitem GROUP BY 1""",
)
def a1_doy_climatology(spark, sf_dir):
    """Day-of-year group-mean climatology (detect.py:2365-2373, flox
    nanmean → hash agg with partial/final)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.dayofyear("l_shipdate").cast("long").alias("doy")).agg(
        davg("l_quantity", "clim")
    )


@register(
    "a3_group_std",
    f"""WITH s AS (
          SELECT event_type, COUNT(value) AS n,
                 {dec_sql('value')} AS sv, {dec_sql('value*value')} AS svv
          FROM events GROUP BY 1)
        SELECT event_type, n, sv / n AS mean,
               SQRT(svv / n - (sv / n) * (sv / n)) AS std
        FROM s""",
)
def a3_group_std(spark, sf_dir):
    """Per-group standard deviation (detect.py:2260-2268) via exact
    decimal sums — order-independent, unlike stddev_pop(double)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        dsum("value", "sv"),
        dsum(F.col("value") * F.col("value"), "svv"),
    )
    mean = F.col("sv") / F.col("n")
    return s.select(
        "event_type",
        "n",
        mean.alias("mean"),
        F.sqrt(F.col("svv") / F.col("n") - mean * mean).alias("std"),
    )


@register(
    "a6_exact_quantile",
    f"""SELECT event_type,
               {round6_sql('quantile_cont(value, 0.9)')} AS q90
        FROM events GROUP BY event_type""",
)
def a6_exact_quantile(spark, sf_dir):
    """Exact quantile per group (detect.py:2887-2899 da.quantile)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        round6(F.percentile("value", F.lit(0.9))).alias("q90")
    )


@register(
    "a8_conditional_sum",
    f"""SELECT CAST(day(ts) AS BIGINT) AS d,
               {dec_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS area
        FROM events GROUP BY 1""",
)
def a8_conditional_sum(spark, sf_dir):
    """Per-time conditional area sum (track.py:1499-1518 compute_area)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.dayofmonth("ts").cast("long").alias("d")).agg(
        dsum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0), "area")
    )


@register(
    "a9_object_size",
    f"""SELECT event_type, CAST(day(ts) AS BIGINT) AS d,
               COUNT(*) AS n_cells, {dec_sql('value')} AS total
        FROM events GROUP BY 1, 2""",
)
def a9_object_size(spark, sf_dir):
    """Per-time per-ID size/area stats (track.py:1785-1809)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", F.dayofmonth("ts").cast("long").alias("d")).agg(
        F.count("*").alias("n_cells"), dsum("value", "total")
    )


@register(
    "a12_max_count_distinct",
    """SELECT MAX(event_id) AS max_id, COUNT(DISTINCT user_id) AS n_users FROM events""",
)
def a12_max_count_distinct(spark, sf_dir):
    """Max-ID / distinct-ID count (track.py:2839-2855)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.max("event_id").alias("max_id"), F.countDistinct("user_id").alias("n_users")
    )


@register(
    "a13_first_last_presence",
    """SELECT user_id,
              MIN(CASE WHEN value > 100 THEN ts END) AS t_start,
              MAX(CASE WHEN value > 100 THEN ts END) AS t_end
       FROM events GROUP BY user_id
       HAVING COUNT(CASE WHEN value > 100 THEN 1 END) > 0""",
)
def a13_first_last_presence(spark, sf_dir):
    """First/last presence time per ID (track.py:3109-3117)."""
    ev = load_table(spark, sf_dir, "events")
    present = F.when(F.col("value") > 100, F.col("ts"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.min(present).alias("t_start"),
            F.max(present).alias("t_end"),
            F.count(F.when(F.col("value") > 100, 1)).alias("_n"),
        )
        .filter(F.col("_n") > 0)
        .drop("_n")
    )


@register(
    "a14_global_stats",
    f"""SELECT COUNT(*) AS n_rows, {dec_sql('value')} AS total_value,
               COUNT(DISTINCT user_id) AS n_users,
               MIN(ts) AS t_min, MAX(ts) AS t_max
        FROM events""",
)
def a14_global_stats(spark, sf_dir):
    """Global scalar stats (track.py:1330-1351)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_rows"),
        dsum("value", "total_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("t_min"),
        F.max("ts").alias("t_max"),
    )


# ------------------------------------------------------------- set ops SO*

@register(
    "so1_union_distinct",
    """SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
       UNION
       SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'""",
)
def so1_union_distinct(spark, sf_dir):
    """Union of ID sets (track.py:2853 concatenate+unique)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("k"))
        .union(c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("k")))
        .distinct()
    )


@register(
    "so2_except",
    """SELECT DISTINCT o_custkey AS k FROM orders
       EXCEPT
       SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'""",
)
def so2_except(spark, sf_dir):
    """Set difference (track.py:4723)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.select(F.col("o_custkey").alias("k"))
        .distinct()
        .subtract(
            c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("k"))
        )
    )


@register(
    "so3_union_by_name",
    """SELECT * FROM (SELECT o_orderkey AS k, o_totalprice AS v FROM orders)
       UNION ALL BY NAME
       SELECT * FROM (SELECT l_extendedprice AS v, l_orderkey AS k FROM lineitem)""",
)
def so3_union_by_name(spark, sf_dir):
    """Concatenate tables by column name (track.py:2997-2998 xr.concat)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), F.col("l_orderkey").alias("k")
    )
    return o.unionByName(li)


# ------------------------------------------------------ scalar functions F*

@register(
    "f1_date_parts",
    """SELECT l_orderkey, l_linenumber,
              CAST(year(l_shipdate) AS BIGINT) AS yr,
              CAST(quarter(l_shipdate) AS BIGINT) AS q,
              CAST(month(l_shipdate) AS BIGINT) AS mo,
              CAST(dayofyear(l_shipdate) AS BIGINT) AS doy
       FROM lineitem""",
)
def f1_date_parts(spark, sf_dir):
    """Date-part extraction (detect.py:1605-1606)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").cast("long").alias("yr"),
        F.quarter("l_shipdate").cast("long").alias("q"),
        F.month("l_shipdate").cast("long").alias("mo"),
        F.dayofyear("l_shipdate").cast("long").alias("doy"),
    )


@register(
    "f5_digitize",
    """SELECT event_id,
              CAST(CASE WHEN value < 0 THEN 0
                   ELSE LEAST(GREATEST(1 + CAST(FLOOR(value / 10.0) AS BIGINT), 1), 51)
                   END AS INT) AS bin
       FROM events""",
)
def f5_digitize(spark, sf_dir):
    """Asymmetric binning (detect.py:2601-2631): bin 0 = negatives, then
    uniform width-10 bins clamped to 51."""
    ev = load_table(spark, sf_dir, "events")
    pos = clip(F.lit(1) + F.floor(F.col("value") / 10.0).cast("long"), 1, 51)
    return ev.select(
        "event_id",
        F.when(F.col("value") < 0, F.lit(0)).otherwise(pos).cast("int").alias("bin"),
    )


@register(
    "f7_conditional",
    """SELECT event_id,
              CASE WHEN event_type = 'purchase' THEN value * 2.0
                   WHEN event_type = 'click' THEN value * 0.5
                   WHEN event_type = 'error' THEN 0.0
                   ELSE value END AS weight
       FROM events""",
)
def f7_conditional(spark, sf_dir):
    """xr.where / when-otherwise chains (track.py:1891, 2764)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value") * 2.0)
        .when(F.col("event_type") == "click", F.col("value") * 0.5)
        .when(F.col("event_type") == "error", F.lit(0.0))
        .otherwise(F.col("value"))
        .alias("weight"),
    )


@register(
    "f8_pair_hash",
    """SELECT DISTINCT l_suppkey * 1000000 + l_partkey AS pair_key FROM lineitem""",
)
def f8_pair_hash(spark, sf_dir):
    """int64 pair-key hashing (track.py:2428-2429 id0*max+id1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_suppkey") * 1000000 + F.col("l_partkey")).alias("pair_key")
    ).distinct()


@register(
    "f9_clip",
    """SELECT event_id, LEAST(GREATEST(value, 10.0), 400.0) AS clipped FROM events""",
)
def f9_clip(spark, sf_dir):
    """np.clip → greatest/least (detect.py:2530, track.py:2222)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", clip(F.col("value"), 10.0, 400.0).alias("clipped"))


# ------------------------------------------------------- TPC-H headliners

@register(
    "tpch_q1",
    f"""SELECT l_returnflag, l_linestatus,
               {dec_sql('l_quantity')} AS sum_qty,
               {dec_sql('l_extendedprice')} AS sum_base_price,
               {dec_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {dec_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               {davg_sql('l_quantity')} AS avg_qty,
               {davg_sql('l_extendedprice')} AS avg_price,
               {davg_sql('l_discount')} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""",
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary — the classic groupBy-8-aggs headline."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "tpch_q5_local_supplier",
    f"""SELECT n_name, {dec_sql('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name""",
)
def tpch_q5_local_supplier(spark, sf_dir):
    """TPC-H Q5-style multi-way join with broadcast dims."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "tpch_q3_shipping_priority",
    f"""SELECT l_orderkey,
               {dec_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority""",
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shipping priority: selective dim filter broadcast into
    the fact join, date predicates pushed to both scans."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "tpch_q6_forecast_revenue",
    f"""SELECT {dec_sql('l_extendedprice * l_discount')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate <  TIMESTAMP '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""",
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 forecast revenue: pure filter + global agg — every
    predicate must reach the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
