"""marEx detect-pipeline operator shapes (SURVEY §2.4/§2.5/§2.8) expressed
over the star schema with DuckDB oracles: shifting-baseline fan-out,
2-D histograms, count-interpolated histogram quantiles, circular
day-of-year windows, spatial pooling, spherical centroids, harmonics.

The same building blocks power the real engine in
``marex_spark.operators``; here they run on the driver's tables so the
correctness gate can hash-match them.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from marex_spark.functions.binning import clip
from marex_spark.functions.decimals import davg, davg_sql, dec_sql, dsum
from marex_spark.queries.registry import register, round6, round6_sql
from marex_spark.sources.parquet import load_table


def _events_latlon(spark, sf_dir):
    """Deterministic synthetic lat/lon derived from event keys (the star
    schema has no geo columns; formula mirrored in the oracles)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("lat", (F.col("user_id") % 18) * 10.0 - 85.0).withColumn(
        "lon", (F.col("event_id") % 36) * 10.0 - 175.0
    )


_LATLON_SQL = """SELECT *,
       (user_id % 18) * 10.0 - 85.0 AS lat,
       (event_id % 36) * 10.0 - 175.0 AS lon
  FROM events"""


# ------------------------------------------------------------ A2 fan-out

@register(
    "a2_shifting_climatology",
    f"""SELECT CAST(t.ty AS BIGINT) AS target_year, {davg_sql('l_quantity')} AS clim
        FROM lineitem,
             UNNEST(generate_series(year(l_shipdate) + 1, year(l_shipdate) + 3)) AS t(ty)
        GROUP BY 1""",
)
def a2_shifting_climatology(spark, sf_dir):
    """Shifting-baseline climatology (detect.py:1617-1669): each year's
    rows contribute to the next 3 target years via a generated
    contribution fan-out, then a group-mean per target year."""
    li = load_table(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate")
    return (
        li.select(F.explode(F.sequence(yr + 1, yr + 3)).alias("ty"), "l_quantity")
        .groupBy(F.col("ty").cast("long").alias("target_year"))
        .agg(davg("l_quantity", "clim"))
    )


# -------------------------------------------------------- A4 2-D histogram

_QTY_BIN_SQL = """CAST(CASE WHEN l_quantity < 0 THEN 0
       ELSE LEAST(GREATEST(1 + CAST(FLOOR(l_quantity / 5.0) AS BIGINT), 1), 11)
       END AS INT)"""


def _qty_bin():
    pos = clip(F.lit(1) + F.floor(F.col("l_quantity") / 5.0).cast("long"), 1, 11)
    return F.when(F.col("l_quantity") < 0, F.lit(0)).otherwise(pos).cast("int")


@register(
    "a4_histogram_2d",
    f"""SELECT CAST(dayofyear(l_shipdate) AS BIGINT) AS doy, {_QTY_BIN_SQL} AS bin,
               COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2""",
)
def a4_histogram_2d(spark, sf_dir):
    """2-D (doy × value-bin) histogram (detect.py:2622-2648)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.dayofyear("l_shipdate").cast("long").alias("doy"), _qty_bin().alias("bin")
    ).agg(F.count("*").alias("c"))


# ------------------------------------- A5 count-interpolated histogram quantile

_EV_BIN_SQL = """CAST(CASE WHEN value < 0 THEN 0
       ELSE LEAST(GREATEST(1 + CAST(FLOOR(value / 10.0) AS BIGINT), 1), 51)
       END AS INT)"""


@register(
    "a5_histogram_quantile",
    f"""WITH h AS (
          SELECT event_type, {_EV_BIN_SQL} AS bin, COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        cd AS (
          SELECT event_type, bin, c,
                 CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cdf,
                 CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM h),
        sel AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bin) AS rn
          FROM cd WHERE cdf >= 0.9 * n)
        SELECT event_type,
               {round6_sql('(bin - 1) * 10.0 + 10.0 * (0.9 * n - (cdf - c)) / c')} AS thr
        FROM sel WHERE rn = 1""",
)
def a5_histogram_quantile(spark, sf_dir):
    """marEx's approximate quantile (detect.py:2737-2865): histogram →
    CDF → linear count-interpolation inside the crossing bin."""
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
    wb = W.partitionBy("event_type").orderBy("bin")
    wall = W.partitionBy("event_type")
    cd = h.select(
        "event_type",
        "bin",
        "c",
        F.sum("c").over(wb).cast("long").alias("cdf"),
        F.sum("c").over(wall.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("long")
        .alias("n"),
    )
    sel = cd.filter(F.col("cdf") >= 0.9 * F.col("n")).withColumn(
        "rn", F.row_number().over(wb)
    )
    thr = (F.col("bin") - 1) * 10.0 + 10.0 * (
        0.9 * F.col("n") - (F.col("cdf") - F.col("c"))
    ) / F.col("c")
    return sel.filter(F.col("rn") == 1).select("event_type", round6(thr).alias("thr"))


# ------------------------------------------- A7 doy-window exact percentile

@register(
    "a7_doy_window_percentile",
    f"""SELECT CAST(((dayofyear(l_shipdate) - 1 + t.off + 366) % 366) + 1 AS BIGINT) AS doy,
               {round6_sql('quantile_cont(l_quantity, 0.9)')} AS q90
        FROM lineitem, UNNEST([-2, -1, 0, 1, 2]) AS t(off)
        GROUP BY 1""",
)
def a7_doy_window_percentile(spark, sf_dir):
    """Exact per-doy windowed percentile (detect.py:1921-1956): each row
    fans out to the ±2-day circular doy window, exact percentile per
    target doy."""
    li = load_table(spark, sf_dir, "lineitem")
    doy = F.dayofyear("l_shipdate")
    fan = li.select(
        "l_quantity",
        F.explode(F.array([F.lit(o) for o in (-2, -1, 0, 1, 2)])).alias("off"),
        doy.alias("doy0"),
    )
    center = ((F.col("doy0") - 1 + F.col("off") + 366) % 366 + 1).cast("long")
    return fan.groupBy(center.alias("doy")).agg(
        round6(F.percentile("l_quantity", F.lit(0.9))).alias("q90")
    )


# -------------------------------------------------- A10 spherical centroid

@register(
    "a10_spherical_centroid",
    f"""WITH pts AS ({_LATLON_SQL}),
        s AS (
          SELECT event_type,
                 {dec_sql('value * cos(radians(lat)) * cos(radians(lon))')} AS sx,
                 {dec_sql('value * cos(radians(lat)) * sin(radians(lon))')} AS sy,
                 {dec_sql('value * sin(radians(lat))')} AS sz
          FROM pts GROUP BY 1)
        SELECT event_type,
               {round6_sql('degrees(atan2(sz, sqrt(sx * sx + sy * sy)))')} AS lat_c,
               {round6_sql('degrees(atan2(sy, sx))')} AS lon_c
        FROM s""",
)
def a10_spherical_centroid(spark, sf_dir):
    """Area-weighted spherical centroid (track.py:2195-2230): sum of
    weighted Cartesian unit vectors → back to lat/lon. Handles periodic
    longitude for free — the reason the engine uses this form."""
    pts = _events_latlon(spark, sf_dir)
    la, lo = F.radians("lat"), F.radians("lon")
    w = F.col("value")
    s = pts.groupBy("event_type").agg(
        dsum(w * F.cos(la) * F.cos(lo), "sx"),
        dsum(w * F.cos(la) * F.sin(lo), "sy"),
        dsum(w * F.sin(la), "sz"),
    )
    sx, sy, sz = F.col("sx"), F.col("sy"), F.col("sz")
    return s.select(
        "event_type",
        round6(F.degrees(F.atan2(sz, F.sqrt(sx * sx + sy * sy)))).alias("lat_c"),
        round6(F.degrees(F.atan2(sy, sx))).alias("lon_c"),
    )


# ------------------------------------------------- A11 percentile of areas

@register(
    "a11_area_percentile",
    f"""WITH areas AS (
          SELECT event_type, CAST(day(ts) AS BIGINT) AS d, {dec_sql('value')} AS area
          FROM events GROUP BY 1, 2)
        SELECT event_type, {round6_sql('quantile_cont(area, 0.5)')} AS area_p50
        FROM areas GROUP BY event_type""",
)
def a11_area_percentile(spark, sf_dir):
    """Percentile of object areas — the small-object filter threshold
    (track.py:1838)."""
    ev = load_table(spark, sf_dir, "events")
    areas = ev.groupBy("event_type", F.dayofmonth("ts").cast("long").alias("d")).agg(
        dsum("value", "area")
    )
    return areas.groupBy("event_type").agg(
        round6(F.percentile("area", F.lit(0.5))).alias("area_p50")
    )


# ------------------------------------------------ J2 doy-keyed threshold join

@register(
    "j2_doy_threshold_join",
    f"""WITH thr AS (
          SELECT CAST(dayofyear(l_shipdate) AS BIGINT) AS doy, {davg_sql('l_quantity')} AS thr
          FROM lineitem GROUP BY 1)
        SELECT l.l_suppkey, COUNT(*) AS n_above
        FROM lineitem l
        JOIN thr t ON CAST(dayofyear(l.l_shipdate) AS BIGINT) = t.doy
        WHERE l.l_quantity > t.thr
        GROUP BY 1""",
)
def j2_doy_threshold_join(spark, sf_dir):
    """Day-of-year keyed threshold compare (detect.py:2001-2004): join the
    366-row threshold table, count exceedances per entity."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "doy", F.dayofyear("l_shipdate").cast("long")
    )
    thr = li.groupBy("doy").agg(davg("l_quantity", "thr"))
    return (
        li.join(F.broadcast(thr), "doy")
        .filter(F.col("l_quantity") > F.col("thr"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_above"))
    )


# --------------------------------------------- W2 circular doy rolling sum

@register(
    "w2_circular_doy_window",
    """WITH h AS (
         SELECT CAST(dayofyear(l_shipdate) AS BIGINT) AS doy, COUNT(*) AS c
         FROM lineitem GROUP BY 1)
       SELECT CAST(((h.doy - 1 + t.off + 366) % 366) + 1 AS BIGINT) AS doy,
              CAST(SUM(c) AS BIGINT) AS window_count
       FROM h, UNNEST([-5, -4, -3, -2, -1, 0, 1, 2, 3, 4, 5]) AS t(off)
       GROUP BY 1""",
)
def w2_circular_doy_window(spark, sf_dir):
    """Circular ±5-day rolling sum over a doy histogram
    (detect.py:2494-2500 wrap-pad + sliding window)."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(F.dayofyear("l_shipdate").cast("long").alias("doy")).agg(
        F.count("*").alias("c")
    )
    fan = h.select(
        "doy", "c", F.explode(F.array([F.lit(o) for o in range(-5, 6)])).alias("off")
    )
    center = ((F.col("doy") - 1 + F.col("off") + 366) % 366 + 1).cast("long")
    return fan.groupBy(center.alias("doy")).agg(
        F.sum("c").cast("long").alias("window_count")
    )


# ------------------------------------------------ W4 spatial 5×5 rolling sum

@register(
    "w4_spatial_rolling",
    """WITH g AS (
         SELECT CAST(l_partkey % 20 AS BIGINT) AS y, CAST(l_suppkey % 25 AS BIGINT) AS x,
                COUNT(*) AS c
         FROM lineitem GROUP BY 1, 2)
       SELECT CAST(g.y + dy.v AS BIGINT) AS y,
              CAST((g.x + dx.v + 25) % 25 AS BIGINT) AS x,
              CAST(SUM(c) AS BIGINT) AS pooled
       FROM g, UNNEST([-2, -1, 0, 1, 2]) AS dy(v), UNNEST([-2, -1, 0, 1, 2]) AS dx(v)
       WHERE g.y + dy.v BETWEEN 0 AND 19
       GROUP BY 1, 2""",
)
def w4_spatial_rolling(spark, sf_dir):
    """5×5 spatial pooling with longitude wrap (detect.py:2652-2668):
    offsets fan out, x wraps periodically, y clamps at the poles."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        (F.col("l_partkey") % 20).cast("long").alias("y"),
        (F.col("l_suppkey") % 25).cast("long").alias("x"),
    ).agg(F.count("*").alias("c"))
    offs = F.array([F.lit(o) for o in (-2, -1, 0, 1, 2)])
    fan = g.select("y", "x", "c", F.explode(offs).alias("dy")).select(
        "y", "x", "c", "dy", F.explode(offs).alias("dx")
    )
    return (
        fan.filter((F.col("y") + F.col("dy")).between(0, 19))
        .groupBy(
            (F.col("y") + F.col("dy")).cast("long").alias("y"),
            ((F.col("x") + F.col("dx") + 25) % 25).cast("long").alias("x"),
        )
        .agg(F.sum("c").cast("long").alias("pooled"))
    )


# ----------------------------------------------------- F2/F4/F6 scalar math

@register(
    "f2_harmonics",
    f"""SELECT l_orderkey, l_linenumber,
               {round6_sql('sin(2 * pi() * dayofyear(l_shipdate) / 365.25)')} AS sin1,
               {round6_sql('cos(2 * pi() * dayofyear(l_shipdate) / 365.25)')} AS cos1,
               {round6_sql('sin(4 * pi() * dayofyear(l_shipdate) / 365.25)')} AS sin2,
               {round6_sql('cos(4 * pi() * dayofyear(l_shipdate) / 365.25)')} AS cos2
        FROM lineitem""",
)
def f2_harmonics(spark, sf_dir):
    """Seasonal harmonic regressors (detect.py:2151-2159)."""
    li = load_table(spark, sf_dir, "lineitem")
    ang = 2 * 3.141592653589793 * F.dayofyear("l_shipdate") / 365.25
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round6(F.sin(ang)).alias("sin1"),
        round6(F.cos(ang)).alias("cos1"),
        round6(F.sin(2 * ang)).alias("sin2"),
        round6(F.cos(2 * ang)).alias("cos2"),
    )


@register(
    "f4_haversine",
    f"""WITH pts AS ({_LATLON_SQL})
        SELECT event_id,
               {round6_sql('2 * 6371.0 * asin(sqrt('
                           'pow(sin(radians(lat) / 2), 2) + '
                           'cos(radians(lat)) * cos(0.0) * pow(sin(radians(lon) / 2), 2)))')} AS dist_km
        FROM pts""",
)
def f4_haversine(spark, sf_dir):
    """Haversine distance to (0°, 0°) (track.py:5406-5411)."""
    pts = _events_latlon(spark, sf_dir)
    la, lo = F.radians("lat"), F.radians("lon")
    a = F.pow(F.sin(la / 2), 2) + F.cos(la) * F.cos(F.lit(0.0)) * F.pow(F.sin(lo / 2), 2)
    return pts.select(
        "event_id", round6(F.lit(2 * 6371.0) * F.asin(F.sqrt(a))).alias("dist_km")
    )


@register(
    "f6_interpolation",
    f"""SELECT event_id,
               {round6_sql('FLOOR(value / 10.0) * 10.0 '
                           '+ (value - FLOOR(value / 10.0) * 10.0) '
                           '* ((FLOOR(value / 10.0) + 1) * 10.0 - FLOOR(value / 10.0) * 10.0) / 10.0')}
                 AS interp
        FROM events""",
)
def f6_interpolation(spark, sf_dir):
    """Linear interpolation between bin edges (detect.py:2509-2559,
    np.interp in track.py:3262-3263)."""
    ev = load_table(spark, sf_dir, "events")
    lo = F.floor(F.col("value") / 10.0) * 10.0
    hi = (F.floor(F.col("value") / 10.0) + 1) * 10.0
    interp = lo + (F.col("value") - lo) * (hi - lo) / 10.0
    return ev.select("event_id", round6(interp).alias("interp"))
