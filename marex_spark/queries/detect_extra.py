"""Coverage queries for the remaining SURVEY §2 operator IDs: P1 mask
filter, J4 std-normalise, W3 circular std smoothing, F3 linear detrend
(closed-form OLS oracle vs the engine's design-matrix fit), M11
circular centroid."""

from __future__ import annotations

from pyspark.sql import functions as F

from marex_spark.functions.decimals import davg, davg_sql, dec_sql, dsum
from marex_spark.queries.registry import register, round6, round6_sql
from marex_spark.sources.parquet import load_table


@register(
    "p1_mask_filter",
    """WITH mask AS (
         SELECT CAST(s_suppkey AS BIGINT) AS k, s_acctbal > 0 AS valid FROM supplier)
       SELECT CAST(l.l_suppkey AS BIGINT) AS l_suppkey, COUNT(*) AS n
       FROM lineitem l JOIN mask m ON CAST(l.l_suppkey AS BIGINT) = m.k
       WHERE m.valid GROUP BY 1""",
)
def p1_mask_filter(spark, sf_dir):
    """P1 (track.py:1671/1985): zero out invalid cells via a broadcast
    validity-mask join + filter."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    mask = sup.select(
        F.col("s_suppkey").cast("long").alias("k"),
        (F.col("s_acctbal") > 0).alias("valid"),
    )
    return (
        li.withColumn("k", F.col("l_suppkey").cast("long"))
        .join(F.broadcast(mask), "k")
        .filter("valid")
        .groupBy(F.col("k").alias("l_suppkey"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "j4_std_normalise",
    f"""WITH stats AS (
          SELECT CAST(dayofyear(l_shipdate) AS BIGINT) AS doy,
                 stddev_pop(l_quantity) AS sd, {davg_sql('l_quantity')} AS mu
          FROM lineitem GROUP BY 1)
        SELECT l.l_orderkey, l.l_linenumber,
               {round6_sql('(l.l_quantity - s.mu) / s.sd')} AS z
        FROM lineitem l JOIN stats s ON CAST(dayofyear(l.l_shipdate) AS BIGINT) = s.doy
        WHERE s.sd > 0""",
)
def j4_std_normalise(spark, sf_dir):
    """J4 (detect.py:2277-2278): divide anomalies by the per-doy std
    (A3 + align join)."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "doy", F.dayofyear("l_shipdate").cast("long")
    )
    stats = li.groupBy("doy").agg(
        F.stddev_pop("l_quantity").alias("sd"), davg("l_quantity", "mu")
    )
    return (
        li.join(F.broadcast(stats), "doy")
        .filter(F.col("sd") > 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            round6((F.col("l_quantity") - F.col("mu")) / F.col("sd")).alias("z"),
        )
    )


@register(
    "w3_circular_std_smooth",
    f"""WITH sd AS (
          SELECT CAST(dayofyear(l_shipdate) AS BIGINT) AS doy, stddev_pop(l_quantity) AS v
          FROM lineitem GROUP BY 1)
        SELECT CAST(((sd.doy - 1 + t.off + 366) % 366) + 1 AS BIGINT) AS doy,
               {round6_sql('avg(v)')} AS std_smooth
        FROM sd, UNNEST(generate_series(-15, 15)) AS t(off)
        GROUP BY 1""",
)
def w3_circular_std_smooth(spark, sf_dir):
    """W3 (detect.py:2271-2272): per-doy std smoothed over a ±15-day
    circular window (wrap-pad + rolling mean in long form)."""
    li = load_table(spark, sf_dir, "lineitem")
    sd = li.groupBy(F.dayofyear("l_shipdate").cast("long").alias("doy")).agg(
        F.stddev_pop("l_quantity").alias("v")
    )
    fan = sd.select(
        "doy", "v", F.explode(F.sequence(F.lit(-15), F.lit(15))).alias("off")
    )
    center = ((F.col("doy") - 1 + F.col("off") + 366) % 366 + 1).cast("long")
    return fan.groupBy(center.alias("doy")).agg(
        round6(F.avg("v")).alias("std_smooth")
    )


@register(
    "f3_linear_detrend",
    f"""WITH d AS (
          SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
                 year(l_shipdate) + (dayofyear(l_shipdate) - 1) /
                   (CASE WHEN year(l_shipdate) % 4 = 0
                          AND (year(l_shipdate) % 100 != 0 OR year(l_shipdate) % 400 = 0)
                         THEN 366.0 ELSE 365.0 END) AS t
          FROM lineitem),
        fit AS (
          SELECT l_suppkey,
                 {dec_sql('l_quantity')} / COUNT(*) AS my,
                 {dec_sql('t')} / COUNT(*) AS mt,
                 regr_slope(l_quantity, t) AS b
          FROM d GROUP BY 1)
        SELECT d.l_orderkey, d.l_linenumber,
               {round6_sql('d.l_quantity - (f.my + f.b * (d.t - f.mt))')} AS detrended
        FROM d JOIN fit f ON d.l_suppkey = f.l_suppkey""",
)
def f3_linear_detrend(spark, sf_dir):
    """F3 (detect.py:2143-2220, n_harmonics=0 case): remove the
    per-entity linear trend over decimal time. The engine fits via the
    driver-side design-matrix pseudo-inverse; the oracle uses the
    closed-form OLS (regr_slope) — both are the least-squares solution,
    equal to well past 6 decimals."""
    from marex_spark.functions.temporal import decimal_year

    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_quantity",
        decimal_year("l_shipdate").alias("t"),
    )
    fit = d.groupBy("l_suppkey").agg(
        (dsum("l_quantity") / F.count("*")).alias("my"),
        (dsum("t") / F.count("*")).alias("mt"),
        F.regr_slope("l_quantity", "t").alias("b"),
    )
    detr = F.col("l_quantity") - (
        F.col("my") + F.col("b") * (F.col("t") - F.col("mt"))
    )
    return d.join(fit, "l_suppkey").select(
        "l_orderkey", "l_linenumber", round6(detr).alias("detrended")
    )


@register(
    "m11_circular_centroid",
    f"""WITH pts AS (
          SELECT event_type,
                 2 * pi() * (CAST(event_id % 36 AS BIGINT)) / 36.0 AS ang
          FROM events)
        SELECT event_type,
               {round6_sql('((atan2(avg(sin(ang)), avg(cos(ang))) * 36.0 / (2 * pi())) + 36.0) % 36.0')} AS cx
        FROM pts GROUP BY 1""",
)
def m11_circular_centroid(spark, sf_dir):
    """M11 (track.py:2050-2107): periodic-boundary pixel centroid via
    the circular mean — atan2 of mean sin/cos — instead of the
    reference's shift-by-Nx special-casing."""
    ev = load_table(spark, sf_dir, "events")
    ang = 2 * 3.141592653589793 * (F.col("event_id") % 36) / 36.0
    d = ev.select("event_type", ang.alias("ang"))
    cx = (F.atan2(F.avg(F.sin("ang")), F.avg(F.cos("ang"))) * 36.0 / (
        2 * 3.141592653589793
    ))
    return d.groupBy("event_type").agg(
        round6((cx + 36.0) % 36.0).alias("cx")
    )


@register(
    "viz_clim_robust",
    f"""SELECT event_type,
               {round6_sql('quantile_cont(value, 0.02)')} AS vmin,
               {round6_sql('quantile_cont(value, 0.98)')} AS vmax
        FROM events GROUP BY 1""",
)
def viz_clim_robust(spark, sf_dir):
    """clim_robust percentile colour limits (reference plotX
    base.py:559-571) — the one piece of the visualisation accessor that
    is a data query; rendering itself collects to the client."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        round6(F.percentile("value", F.lit(0.02))).alias("vmin"),
        round6(F.percentile("value", F.lit(0.98))).alias("vmax"),
    )


# ------------------------------------------- packed blocked-kernel gate

_PK_NY, _PK_NX = 6, 8
_PK_NOISE = (
    "CAST(CONCAT('0x', SUBSTRING(md5(CONCAT(CAST(d AS VARCHAR), '|', "
    "CAST(y AS VARCHAR), '|', CAST(x AS VARCHAR))), 1, 15)) AS BIGINT) "
    "% 1000 / 1000.0"
)


@register(
    "det_packed_threshold",
    f"""WITH daily AS (
          SELECT l_shipdate AS d,
                 CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE) / 1e6 AS rev
          FROM lineitem GROUP BY 1),
        grid AS (
          SELECT d, y, x,
                 rev + 2.0 * cos(2 * pi() * dayofyear(d) / 365.0)
                     + {_PK_NOISE} AS value
          FROM daily,
               UNNEST(generate_series(0, {_PK_NY - 1})) AS ty(y),
               UNNEST(generate_series(0, {_PK_NX - 1})) AS tx(x)),
        anom AS (
          SELECT y, x, value - AVG(value) OVER (
                   PARTITION BY dayofyear(d), y, x) AS anomaly
          FROM grid)
        SELECT CAST(y AS INT) AS y, CAST(x AS INT) AS x,
               {round6_sql('quantile_cont(anomaly, 0.95)')} AS threshold
        FROM anom GROUP BY 1, 2""",
)
def det_packed_threshold(spark, sf_dir):
    """The packed blocked detect KERNEL vs SQL: doy climatology +
    per-cell exact 95th-percentile threshold (detect.py:2365-2373 +
    2887-2899) computed by the numpy band kernel over the packed
    array-column layout, checked value-for-value against DuckDB's
    quantile_cont. The seasonal term cancels inside each engine's own
    climatology, so any doy-indexing or stacking bug in the kernel
    surfaces as a value mismatch."""
    from marex_spark.operators.detect_blocked import (
        detect_extremes_blocked_packed,
        pack_gridded,
    )

    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        (
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
            / 1e6
        ).alias("rev")
    )
    yy = spark.range(_PK_NY).select(F.col("id").cast("int").alias("y"))
    xx = spark.range(_PK_NX).select(F.col("id").cast("int").alias("x"))
    noise = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("d").cast("string"),
                        F.col("y").cast("string"),
                        F.col("x").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000
        / 1000.0
    )
    grid = (
        daily.crossJoin(F.broadcast(yy))
        .crossJoin(F.broadcast(xx))
        .select(
            "d",
            "y",
            "x",
            (
                F.col("rev")
                + 2.0
                * F.cos(2 * 3.141592653589793 * F.dayofyear("d") / 365.0)
                + noise
            ).alias("value"),
        )
    )
    packed = pack_gridded(grid, nx=_PK_NX, time_col="d")
    thr = detect_extremes_blocked_packed(
        packed, method_percentile="exact", time_col="d", output="thresholds"
    )
    return thr.select("y", "x", round6(F.col("threshold")).alias("threshold"))


@register(
    "det_packed_unstructured",
    f"""WITH daily AS (
          SELECT l_shipdate AS d,
                 CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE) / 1e6 AS rev
          FROM lineitem GROUP BY 1),
        grid AS (
          SELECT d, y * {_PK_NX} + x AS cell,
                 rev + 2.0 * cos(2 * pi() * dayofyear(d) / 365.0)
                     + {_PK_NOISE} AS value
          FROM daily,
               UNNEST(generate_series(0, {_PK_NY - 1})) AS ty(y),
               UNNEST(generate_series(0, {_PK_NX - 1})) AS tx(x)),
        anom AS (
          SELECT cell, value - AVG(value) OVER (
                   PARTITION BY dayofyear(d), cell) AS anomaly
          FROM grid)
        SELECT CAST(cell AS BIGINT) AS cell,
               {round6_sql('quantile_cont(anomaly, 0.95)')} AS threshold
        FROM anom GROUP BY 1""",
)
def det_packed_unstructured(spark, sf_dir):
    """The UNSTRUCTURED packed fast path vs SQL: the same doy-
    climatology + per-cell exact-percentile field as
    det_packed_threshold, but flattened to mesh cell ids and blocked at
    a width (17) unrelated to the source grid — proving the arbitrary
    cell blocking (detect_blocked.pack_unstructured) reproduces
    per-cell thresholds value-for-value (reference unstructured ICON
    support, detect.py:17-18)."""
    from marex_spark.operators.detect_blocked import (
        detect_extremes_unstructured_packed,
    )

    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        (
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
            / 1e6
        ).alias("rev")
    )
    yy = spark.range(_PK_NY).select(F.col("id").cast("int").alias("y"))
    xx = spark.range(_PK_NX).select(F.col("id").cast("int").alias("x"))
    noise = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("d").cast("string"),
                        F.col("y").cast("string"),
                        F.col("x").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000
        / 1000.0
    )
    mesh = (
        daily.crossJoin(F.broadcast(yy))
        .crossJoin(F.broadcast(xx))
        .select(
            "d",
            (F.col("y").cast("long") * _PK_NX + F.col("x")).alias("cell"),
            (
                F.col("rev")
                + 2.0
                * F.cos(2 * 3.141592653589793 * F.dayofyear("d") / 365.0)
                + noise
            ).alias("value"),
        )
    )
    thr = detect_extremes_unstructured_packed(
        mesh, block_cells=17, time_col="d", output="thresholds",
        method_percentile="exact",
    )
    return thr.select("cell", round6(F.col("threshold")).alias("threshold"))


@register(
    "viz_trajectory_unwrap",
    f"""WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 fmod(fmod(SUM(value) * 37, 360) + 360, 360) AS lon,
                 AVG(value) AS lat
          FROM events GROUP BY 1, 2),
        stepd AS (
          SELECT *, lon - LAG(lon) OVER (PARTITION BY event_type ORDER BY d) AS dlon
          FROM daily),
        corr AS (
          SELECT event_type, d, lat, lon,
                 SUM(CASE WHEN dlon > 180 THEN -360.0
                          WHEN dlon < -180 THEN 360.0 ELSE 0.0 END)
                   OVER (PARTITION BY event_type ORDER BY d
                         ROWS UNBOUNDED PRECEDING) AS adj
          FROM stepd)
        SELECT event_type, d, {round6_sql('lat')} AS lat,
               {round6_sql('lon + COALESCE(adj, 0)')} AS lon_unwrapped
        FROM corr""",
)
def viz_trajectory_unwrap(spark, sf_dir):
    """plotX trajectory preparation (viz.trajectories): per-event daily
    centroid path with dateline unwrapping — a lag window classifies
    >180° jumps, a running sum carries the ±360° correction forward.
    The synthetic modular path (sum(value)·37 mod 360) jumps across
    the seam constantly, so the unwrap logic is exercised on every
    event series."""
    from marex_spark.viz import trajectories

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.pmod(F.sum("value") * 37, F.lit(360.0)).alias("centroid_lon"),
        F.avg("value").alias("centroid_lat"),
    )
    traj = trajectories(
        daily, time_col="d", id_col="event_type",
        lon_col="centroid_lon", lat_col="centroid_lat",
    )
    return traj.select(
        "event_type",
        "d",
        round6(F.col("lat")).alias("lat"),
        round6(F.col("lon_unwrapped")).alias("lon_unwrapped"),
    )


@register(
    "s2_netcdf_scan",
    """WITH g AS (
         SELECT t.range AS t, y.range AS y, x.range AS x,
                CAST(t.range*100 + y.range*10 + x.range AS DOUBLE) AS value
         FROM range(5) t CROSS JOIN range(4) y CROSS JOIN range(6) x
         WHERE NOT (t.range = 0 AND y.range = 0 AND x.range = 0))
       SELECT CAST(y AS INT) AS y, CAST(x AS INT) AS x,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(value) AS DOUBLE) AS total
       FROM g GROUP BY 1, 2""",
)
def s2_netcdf_scan(spark, sf_dir):
    """S2 (reference detect.py:409 NetCDF input): distributed stdlib
    ingestion of a NetCDF classic file — a deterministic (t*100+y*10+x)
    fixture written by the package's spec-literal writer, with the
    (0,0,0) cell encoded as _FillValue (must be dropped). The oracle
    regenerates the same field relationally; every value is an exact
    small integer so the float32 round-trip and the DOUBLE sum are
    hash-stable."""
    import os
    import tempfile

    import numpy as np

    from marex_spark.sources.netcdf import (
        ingest_netcdf_classic,
        write_netcdf_classic,
    )

    T, NY, NX = 5, 4, 6
    t, y, x = np.meshgrid(
        np.arange(T), np.arange(NY), np.arange(NX), indexing="ij"
    )
    data = (t * 100 + y * 10 + x).astype(np.float32)
    data[0, 0, 0] = 9.96921e36  # default NC fill
    path = os.path.join(tempfile.gettempdir(), "marex_s2_fixture.nc")
    write_netcdf_classic(
        path, data, np.arange(T, dtype=np.float64), fill=9.96921e36
    )
    df = ingest_netcdf_classic(spark, path, "sst")
    return df.groupBy(F.col("y").cast("int").alias("y"), F.col("x").cast("int").alias("x")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("double")).alias("total"),
    )


@register(
    "s2_netcdf4_scan",
    """WITH g AS (
         SELECT t.range AS t, y.range AS y, x.range AS x,
                CAST(t.range*100 + y.range*10 + x.range AS DOUBLE) AS value
         FROM range(5) t CROSS JOIN range(4) y CROSS JOIN range(6) x
         WHERE NOT (t.range = 0 AND y.range = 0 AND x.range = 0))
       SELECT CAST(y AS INT) AS y, CAST(x AS INT) AS x,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(value) AS DOUBLE) AS total
       FROM g GROUP BY 1, 2""",
)
def s2_netcdf4_scan(spark, sf_dir):
    """S2, NetCDF-4/HDF5 flavour (reference detect.py:409 — xarray's
    default engine is netcdf4): the same deterministic fixture as
    s2_netcdf_scan but written as a CHUNKED + shuffled + deflated HDF5
    file by the package's spec-literal writer and ingested through the
    distributed chunk-index reader (sources/hdf5.py) — chunk B-tree
    walk, per-chunk inflate/unshuffle, edge-chunk trim, fill drop all
    on the hash path. Same oracle as the classic entry: both readers
    must agree exactly."""
    import os
    import tempfile

    import numpy as np

    from marex_spark.sources.hdf5 import ingest_netcdf4, write_netcdf4

    T, NY, NX = 5, 4, 6
    t, y, x = np.meshgrid(
        np.arange(T), np.arange(NY), np.arange(NX), indexing="ij"
    )
    data = (t * 100 + y * 10 + x).astype(np.float32)
    data[0, 0, 0] = 9.96921e36  # default NC fill
    path = os.path.join(tempfile.gettempdir(), "marex_s2_h5_fixture.nc")
    write_netcdf4(
        path, data, np.arange(T, dtype=np.float64),
        chunks=(2, 3, 4), compress=True, shuffle=True, fill=9.96921e36,
    )
    df = ingest_netcdf4(spark, path, "sst")
    return df.groupBy(F.col("y").cast("int").alias("y"), F.col("x").cast("int").alias("x")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("double")).alias("total"),
    )


@register(
    "s6_catalog_scan",
    """SELECT CAST(r.r_name AS VARCHAR) AS r_name,
              CAST(COUNT(*) AS BIGINT) AS n_nations,
              CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
       FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY 1""",
)
def s6_catalog_scan(spark, sf_dir):
    """S6 (reference tests/make_test_data.ipynb cells 6-8: intake
    catalog pull): datasets are addressed by NAME through a declarative
    catalog — including one nested sub-catalog hop, mirroring intake's
    ``cat['sub']['dataset']`` traversal — and the reads come back as
    lazy parquet scans (predicate pushdown intact, nothing materialised
    at open time)."""
    import os
    import tempfile

    from marex_spark.sources.catalog import open_catalog, star_schema_catalog

    d = tempfile.gettempdir()
    star = star_schema_catalog(sf_dir, os.path.join(d, "marex_s6_star.json"))
    root = os.path.join(d, "marex_s6_root.json")
    with open(root, "w") as f:
        import json

        json.dump(
            {"sources": {"star": {"driver": "catalog", "args": {"urlpath": star}}}},
            f,
        )
    cat = open_catalog(root)
    nation = cat.read(spark, "star.nation")
    region = cat.read(spark, "star.region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").cast("long").alias("n_nations"),
            F.sum(F.col("n_nationkey").cast("long")).alias("key_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Per-cell extreme-episode statistics — the classic Hobday et al. (2016)
# marine-heatwave summary the reference's users compute from detect
# output (episodes = runs of extreme days, gaps <= 2 days bridged,
# minimum duration 5 days; then per-cell frequency/duration metrics).
# Pure gaps-and-islands window algebra: one shuffle by cell, every
# window partition-local — the same single-shuffle shape as detect.
# ---------------------------------------------------------------------------


@register(
    "mhw_episode_stats",
    f"""WITH daily AS (
          SELECT CAST(l_suppkey % 50 AS BIGINT) AS cell,
                 date_diff('day', DATE '1970-01-01', l_shipdate) AS de,
                 SUM(l_extendedprice * (1 - l_discount)) AS rev
          FROM lineitem GROUP BY 1, 2),
        thr AS (
          SELECT cell, quantile_cont(rev, 0.9) AS q FROM daily GROUP BY cell),
        ext AS (
          SELECT d.cell, d.de FROM daily d JOIN thr t USING (cell) WHERE d.rev > t.q),
        gaps AS (
          SELECT cell, de,
                 CASE WHEN de - LAG(de) OVER (PARTITION BY cell ORDER BY de) <= 3
                      THEN 0 ELSE 1 END AS brk
          FROM ext),
        epi AS (
          SELECT cell, de,
                 SUM(brk) OVER (PARTITION BY cell ORDER BY de
                                ROWS UNBOUNDED PRECEDING) AS eid
          FROM gaps),
        runs AS (
          SELECT cell, eid, MAX(de) - MIN(de) + 1 AS duration,
                 COUNT(*) AS n_days
          FROM epi GROUP BY cell, eid
          HAVING MAX(de) - MIN(de) + 1 >= 5)
        SELECT cell,
               CAST(COUNT(*) AS BIGINT) AS n_episodes,
               CAST(MAX(duration) AS BIGINT) AS max_duration,
               {round6_sql('AVG(CAST(duration AS DOUBLE))')} AS mean_duration,
               CAST(SUM(n_days) AS BIGINT) AS total_extreme_days
        FROM runs GROUP BY cell""",
)
def mhw_episode_stats(spark, sf_dir):
    """Per-cell episode metrics over a thresholded daily series:
    episodes bridge gaps <= 2 days and must last >= 5 days (Hobday
    definitions); outputs count, max/mean duration, total extreme
    days."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(
            (F.col("l_suppkey") % 50).cast("long").alias("cell"),
            F.datediff("l_shipdate", F.lit("1970-01-01")).alias("de"),
        )
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    thr = daily.groupBy("cell").agg(F.percentile("rev", F.lit(0.9)).alias("q"))
    ext = daily.join(thr, "cell").filter(F.col("rev") > F.col("q"))
    w = Window.partitionBy("cell").orderBy("de")
    brk = F.when(
        F.col("de") - F.lag("de").over(w) <= 3, F.lit(0)
    ).otherwise(F.lit(1))
    epi = ext.withColumn("brk", brk).withColumn(
        "eid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = (
        epi.groupBy("cell", "eid")
        .agg(
            (F.max("de") - F.min("de") + 1).alias("duration"),
            F.count("*").alias("n_days"),
        )
        .filter(F.col("duration") >= 5)
    )
    return runs.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_episodes"),
        F.max("duration").cast("long").alias("max_duration"),
        round6(F.avg(F.col("duration").cast("double"))).alias("mean_duration"),
        F.sum("n_days").cast("long").alias("total_extreme_days"),
    )


# ------------------------------------------------- S3/S4/S5 sink round-trips

@register(
    "s3_checkpoint_roundtrip",
    """SELECT CAST(l_returnflag AS VARCHAR) AS flag,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
       FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
       GROUP BY 1""",
)
def s3_checkpoint_roundtrip(spark, sf_dir):
    """S3 (reference helper.py:642-777 checkpoint_to_zarr): the
    materialise-and-reload lineage break. The aggregate runs on the
    RE-READ side of the checkpoint, so the round trip (write, footer
    discovery, schema recovery, scan) is what the hash verifies."""
    import os
    import tempfile

    from marex_spark.functions.decimals import dsum
    from marex_spark.sources.io import checkpoint_parquet

    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter(F.col("l_shipdate") >= F.lit("1995-01-01")).select(
        "l_returnflag", "l_quantity"
    )
    path = os.path.join(tempfile.gettempdir(), "marex_s3_ckpt")
    back = checkpoint_parquet(filtered, path)
    return back.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count("*").cast("long").alias("n"),
        dsum("l_quantity", "qty"),
    )


@register(
    "s4_region_overwrite",
    """WITH base AS (
         SELECT CAST(o_orderkey % 8 AS BIGINT) AS bucket,
                CAST(o_orderkey AS BIGINT) AS k,
                CAST(o_totalprice AS DOUBLE) AS v
         FROM orders),
       final AS (
         SELECT bucket, k, CASE WHEN bucket = 3 THEN v * 2.0 ELSE v END AS v
         FROM base)
       SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS total
       FROM final GROUP BY bucket""",
)
def s4_region_overwrite(spark, sf_dir):
    """S4 (reference track.py:4323-4328 zarr region write): dynamic
    partition overwrite rewrites ONLY bucket 3 (doubled values) while
    the other buckets' files stay untouched — the idempotent re-run
    primitive. The final store state is read back and aggregated, so
    the hash proves the overwrite replaced exactly one partition."""
    import os
    import shutil
    import tempfile

    from marex_spark.functions.decimals import dsum
    from marex_spark.sources.io import write_region

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        (F.col("o_orderkey") % 8).cast("long").alias("bucket"),
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    path = os.path.join(tempfile.gettempdir(), "marex_s4_region")
    shutil.rmtree(path, ignore_errors=True)
    write_region(base, path, partition_col="bucket")
    patch = base.filter(F.col("bucket") == 3).withColumn("v", F.col("v") * 2.0)
    write_region(patch, path, partition_col="bucket")
    back = spark.read.parquet(path)
    return back.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count("*").cast("long").alias("n"),
        dsum("v", "total"),
    )


@register(
    "s5_stats_sidecar",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS acctbal_sum
       FROM customer""",
)
def s5_stats_sidecar(spark, sf_dir):
    """S5 (reference track.py:1264-1277 npz stats sink): scalar run
    stats written to the JSON sidecar and READ BACK — the returned row
    comes from the sidecar file, not the live aggregate, so the hash
    verifies the sink+scan loop the archive workflow depends on."""
    import os
    import tempfile

    from marex_spark.functions.decimals import dsum
    from marex_spark.sources.io import read_stats_json, write_stats_json

    cust = load_table(spark, sf_dir, "customer")
    row = cust.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
        dsum("c_acctbal", "acctbal_sum"),
    ).first()
    path = os.path.join(tempfile.gettempdir(), "marex_s5_stats.json")
    write_stats_json(
        {
            "n_rows": row.n_rows,
            "n_nations": row.n_nations,
            "acctbal_sum": row.acctbal_sum,
        },
        path,
    )
    stats = read_stats_json(path)
    return spark.createDataFrame(
        [(stats["n_rows"], stats["n_nations"], float(stats["acctbal_sum"]))],
        "n_rows long, n_nations long, acctbal_sum double",
    )


@register(
    "s7_zarr_roundtrip",
    """WITH g AS (
         SELECT t.range AS t, y.range AS y, x.range AS x,
                CAST(t.range*100 + y.range*10 + x.range AS DOUBLE) AS value
         FROM range(6) t CROSS JOIN range(5) y CROSS JOIN range(7) x
         WHERE NOT (y.range = 1 AND x.range = 2))
       SELECT CAST(y AS INT) AS y, CAST(x AS INT) AS x,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(value) AS DOUBLE) AS total
       FROM g GROUP BY 1, 2""",
)
def s7_zarr_roundtrip(spark, sf_dir):
    """S7 (reference helper.py:642-777 checkpoint_to_zarr — the WRITE
    side): a deterministic (t*100+y*10+x) grid with one hole goes out
    through the distributed zarr-v2 writer (executor-side chunk encode,
    sources/zarr.py write_zarr_gridded) and comes back through the
    distributed reader; the hash covers chunk assembly, zlib encode,
    edge-chunk padding, missing-cell fill and the CF time coordinate."""
    import os
    import shutil
    import tempfile

    from marex_spark.sources.zarr import ingest_zarr_gridded, write_zarr_gridded

    T, NY, NX = 6, 5, 7
    grid = spark.range(T * NY * NX).selectExpr(
        f"date_add(DATE '2001-03-01', CAST(id / {NY * NX} AS INT)) AS d",
        f"CAST(id % {NY * NX} / {NX} AS INT) AS y",
        f"CAST(id % {NX} AS INT) AS x",
        f"CAST(CAST(id / {NY * NX} AS INT) * 100 "
        f"   + CAST(id % {NY * NX} / {NX} AS INT) * 10 "
        f"   + id % {NX} AS FLOAT) AS value",
    ).filter("NOT (y = 1 AND x = 2)").selectExpr(
        "CAST(d AS TIMESTAMP) AS time", "y", "x", "value"
    )
    store = os.path.join(tempfile.gettempdir(), "marex_s7_store.zarr")
    shutil.rmtree(store, ignore_errors=True)
    write_zarr_gridded(grid, store, var="sst", chunks=(4, 3, 4))
    back = ingest_zarr_gridded(spark, store, "sst", layout="long")
    return back.groupBy(
        F.col("y").cast("int").alias("y"), F.col("x").cast("int").alias("x")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("double")).alias("total"),
    )


@register(
    "s7_zarr_v3_roundtrip",
    """WITH g AS (
         SELECT t.range AS t, y.range AS y, x.range AS x,
                CAST(t.range*100 + y.range*10 + x.range AS DOUBLE) AS value
         FROM range(6) t CROSS JOIN range(5) y CROSS JOIN range(7) x
         WHERE NOT (y.range = 1 AND x.range = 2))
       SELECT CAST(y AS INT) AS y, CAST(x AS INT) AS x,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(value) AS DOUBLE) AS total
       FROM g GROUP BY 1, 2""",
)
def s7_zarr_v3_roundtrip(spark, sf_dir):
    """S7, zarr-v3 layout: the same deterministic grid out through
    ``write_zarr_gridded(zarr_format=3)`` (zarr.json metadata,
    c/t/y/x chunk keys, bytes+gzip codec chain — what zarr-python 3.x
    emits) and back through the v3 reader; same oracle as the v2
    entry, so the hash additionally pins v2/v3 value equivalence."""
    import os
    import shutil
    import tempfile

    from marex_spark.sources.zarr import ingest_zarr_gridded, write_zarr_gridded

    T, NY, NX = 6, 5, 7
    grid = spark.range(T * NY * NX).selectExpr(
        f"date_add(DATE '2001-03-01', CAST(id / {NY * NX} AS INT)) AS d",
        f"CAST(id % {NY * NX} / {NX} AS INT) AS y",
        f"CAST(id % {NX} AS INT) AS x",
        f"CAST(CAST(id / {NY * NX} AS INT) * 100 "
        f"   + CAST(id % {NY * NX} / {NX} AS INT) * 10 "
        f"   + id % {NX} AS FLOAT) AS value",
    ).filter("NOT (y = 1 AND x = 2)").selectExpr(
        "CAST(d AS TIMESTAMP) AS time", "y", "x", "value"
    )
    store = os.path.join(tempfile.gettempdir(), "marex_s7_v3_store.zarr")
    shutil.rmtree(store, ignore_errors=True)
    write_zarr_gridded(grid, store, var="sst", chunks=(4, 3, 4), zarr_format=3)
    back = ingest_zarr_gridded(spark, store, "sst", layout="long")
    return back.groupBy(
        F.col("y").cast("int").alias("y"), F.col("x").cast("int").alias("x")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("double")).alias("total"),
    )



@register(
    "s7_zarr_sharded_roundtrip",
    """WITH g AS (
         SELECT t.range AS t, y.range AS y, x.range AS x,
                CAST(t.range*100 + y.range*10 + x.range AS DOUBLE) AS value
         FROM range(6) t CROSS JOIN range(5) y CROSS JOIN range(7) x
         WHERE NOT (y.range = 1 AND x.range = 2))
       SELECT CAST(y AS INT) AS y, CAST(x AS INT) AS x,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(value) AS DOUBLE) AS total
       FROM g GROUP BY 1, 2""",
)
def s7_zarr_sharded_roundtrip(spark, sf_dir):
    """S7, zarr-v3 SHARDED layout (sharding_indexed — zarr-python 3's
    default for large arrays, and the layout that bounds object-store
    file counts at 100 TB): the same deterministic grid out through
    ``write_zarr_gridded(zarr_format=3, shard_shape=...)`` (one FILE
    per shard, gzip inner chunks + u64 offset index, assembled
    executor-side, one task per shard) and back through the shard-aware
    reader; same oracle as the v2/v3 entries, so the hash additionally
    pins plain-v3/sharded value equivalence."""
    import os
    import shutil
    import tempfile

    from marex_spark.sources.zarr import ingest_zarr_gridded, write_zarr_gridded

    T, NY, NX = 6, 5, 7
    grid = spark.range(T * NY * NX).selectExpr(
        f"date_add(DATE '2001-03-01', CAST(id / {NY * NX} AS INT)) AS d",
        f"CAST(id % {NY * NX} / {NX} AS INT) AS y",
        f"CAST(id % {NX} AS INT) AS x",
        f"CAST(CAST(id / {NY * NX} AS INT) * 100 "
        f"   + CAST(id % {NY * NX} / {NX} AS INT) * 10 "
        f"   + id % {NX} AS FLOAT) AS value",
    ).filter("NOT (y = 1 AND x = 2)").selectExpr(
        "CAST(d AS TIMESTAMP) AS time", "y", "x", "value"
    )
    store = os.path.join(tempfile.gettempdir(), "marex_s7_shard_store.zarr")
    shutil.rmtree(store, ignore_errors=True)
    write_zarr_gridded(
        grid, store, var="sst", chunks=(2, 3, 4), zarr_format=3,
        shard_shape=(4, 6, 8),
    )
    back = ingest_zarr_gridded(spark, store, "sst", layout="long")
    return back.groupBy(
        F.col("y").cast("int").alias("y"), F.col("x").cast("int").alias("x")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("double")).alias("total"),
    )
