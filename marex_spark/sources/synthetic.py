"""Deterministic synthetic fixtures, generated *inside* Spark (no driver
loops, no numpy round-trips) — the long-format analogues of the
reference's zarr test fixtures (FIXTURES.md §1-§5; reference
tests/data/sst_gridded.zarr etc.).

Everything derives from ``spark.range`` cross-joins + hash-based noise,
so fixtures scale to any size without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _uniform(cols, lo: float = -0.5, hi: float = 0.5, salt: int = 0):
    """Deterministic pseudo-uniform in [lo, hi) from xxhash64 of key cols."""
    h = F.xxhash64(*cols, F.lit(salt))
    u = (F.pmod(h, F.lit(1_000_000)).cast("double")) / 1_000_000.0
    return F.lit(lo) + u * (hi - lo)


def synthetic_sst_gridded(
    spark: SparkSession,
    n_years: int = 5,
    ny: int = 20,
    nx: int = 40,
    start: str = "2000-01-01",
    trend_per_year: float = 0.02,
    noise_amp: float = 1.0,
    seed: int = 42,
    band_partitioned: bool = False,
) -> DataFrame:
    """SST-like gridded series in long format (time, y, x, value), one row
    per cell-day: latitude-dependent mean + seasonal cycle + linear
    trend + AR-free hash noise (FIXTURES.md §1; reference fixture
    tests/data/sst_gridded.zarr, 40y × 20 × 40).

    ``band_partitioned=True`` emits the data already hash-partitioned
    by latitude band (values identical), letting blocked detect skip
    its only shuffle.
    """
    n_days = n_years * 365
    t = spark.range(n_days).select(F.col("id").alias("t"))
    yy = spark.range(ny).select(F.col("id").cast("int").alias("y"))
    xx = spark.range(nx).select(F.col("id").cast("int").alias("x"))
    if band_partitioned:
        # hash-partition the y dimension FIRST and broadcast the other
        # axes in: broadcast joins preserve the streamed side's
        # partitioning, so every output partition holds complete
        # latitude bands and blocked detect can skip its shuffle
        # entirely (assume_band_partitioned=True).
        par = spark.sparkContext.defaultParallelism
        df = (
            yy.repartitionByRange(par, "y")
            .crossJoin(F.broadcast(t))
            .crossJoin(F.broadcast(xx))
        )
    else:
        df = t.crossJoin(yy).crossJoin(xx)

    time = F.timestamp_add("DAY", F.col("t").cast("int"), F.lit(start).cast("timestamp"))
    lat = -85.0 + F.col("y") * (170.0 / max(ny - 1, 1))
    seasonal = 8.0 * F.cos(2 * 3.141592653589793 * (F.col("t") % 365) / 365.0) * F.signum(
        -lat
    )
    base = 18.0 - 0.25 * F.abs(lat)
    trend = F.lit(trend_per_year) * (F.col("t") / 365.0)
    noise = _uniform([F.col("t"), F.col("y"), F.col("x")], -noise_amp, noise_amp, seed)
    return df.select(
        time.alias("time"),
        "y",
        "x",
        (base + seasonal + trend + noise).cast("float").alias("value"),
    )


def synthetic_sst_gridded_packed(
    spark: SparkSession,
    n_years: int = 5,
    ny: int = 20,
    nx: int = 40,
    start: str = "2000-01-01",
    trend_per_year: float = 0.02,
    noise_amp: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """The same series as :func:`synthetic_sst_gridded`, generated in the
    PACKED gridded layout: one row per (time, y) with ``vals`` =
    array<float> over x (the Spark analogue of the reference's zarr
    chunk layout). Value-identical to the long form (same expressions,
    same hash noise — pinned by tests/test_detect_blocked.py); rows
    shrink ×nx, so the detect shuffle and Arrow transfer move plain
    float arrays instead of per-cell (time,y,x,value) tuples.

    CAVEAT (measured): Spark evaluates higher-order ``transform``
    lambdas interpreted, outside whole-stage codegen — generating
    packed data in-plan is 4-9× slower than the long generator. Use
    this for parity tests and packed-path plumbing; for bulk synthetic
    benchmarking generate long and ``pack_gridded`` once, and for real
    data ingest packed directly (sources/zarr.py)."""
    n_days = n_years * 365
    t = spark.range(n_days).select(F.col("id").alias("t"))
    yy = spark.range(ny).select(F.col("id").cast("int").alias("y"))
    df = t.crossJoin(yy)

    time = F.timestamp_add("DAY", F.col("t").cast("int"), F.lit(start).cast("timestamp"))
    lat = -85.0 + F.col("y") * (170.0 / max(ny - 1, 1))
    seasonal = 8.0 * F.cos(2 * 3.141592653589793 * (F.col("t") % 365) / 365.0) * F.signum(
        -lat
    )
    base = 18.0 - 0.25 * F.abs(lat)
    trend = F.lit(trend_per_year) * (F.col("t") / 365.0)
    xs = F.sequence(F.lit(0), F.lit(nx - 1))
    vals = F.transform(
        xs,
        lambda x: (
            base
            + seasonal
            + trend
            + _uniform([F.col("t"), F.col("y"), x], -noise_amp, noise_amp, seed)
        ).cast("float"),
    )
    return df.select(time.alias("time"), "y", vals.alias("vals"))


def grid_dims(spark: SparkSession, ny: int = 20, nx: int = 40):
    """Dimension tables (FIXTURES.md §1): grid_y(y, lat), grid_x(x, lon)
    spanning the full globe so periodic-x logic is exercised."""
    gy = spark.range(ny).select(
        F.col("id").cast("int").alias("y"),
        (-85.0 + F.col("id") * (170.0 / max(ny - 1, 1))).alias("lat"),
    )
    gx = spark.range(nx).select(
        F.col("id").cast("int").alias("x"),
        (F.col("id") * (360.0 / nx)).alias("lon"),
    )
    return gy, gx


def synthetic_moving_blob(
    spark: SparkSession,
    n_time: int = 32,
    ny: int = 36,
    nx: int = 72,
    blob_half_deg: float = 3.5,
    lon_start: float = 170.0,
    lon_speed: float = 3.0,
    start: str = "2020-01-01",
) -> DataFrame:
    """Analytic moving-blob boolean field (FIXTURES.md §4, reference
    tests/make_test_data.ipynb): square blob of side 2·blob_half_deg
    centred at lat 0, centre longitude drifting lon_speed °/day east
    from lon_start, wrapping the dateline. Grid: 5°×5° cells.

    Returns (time, y, x, extreme boolean). The analytic centre path is
    the test oracle (tests/test_gridded_tracking.py:587-683 semantics:
    tracked centroid within 0.5° lon / 0.25° lat).
    """
    dlat = 180.0 / ny
    dlon = 360.0 / nx
    t = spark.range(n_time).select(F.col("id").alias("t"))
    yy = spark.range(ny).select(F.col("id").cast("int").alias("y"))
    xx = spark.range(nx).select(F.col("id").cast("int").alias("x"))
    df = t.crossJoin(yy).crossJoin(xx)

    time = F.timestamp_add("DAY", F.col("t").cast("int"), F.lit(start).cast("timestamp"))
    lat = -90.0 + (F.col("y") + 0.5) * dlat
    lon = (F.col("x") + 0.5) * dlon
    center_lon = (F.lit(lon_start) + F.lit(lon_speed) * F.col("t")) % 360.0
    # wrapped longitudinal distance
    dl = F.abs(lon - center_lon)
    dist_lon = F.least(dl, 360.0 - dl)
    inside = (F.abs(lat) <= blob_half_deg) & (dist_lon <= blob_half_deg)
    return df.select(time.alias("time"), "y", "x", inside.alias("extreme"))


def synthetic_extremes_gridded(
    spark: SparkSession,
    n_time: int = 32,
    ny: int = 36,
    nx: int = 72,
    density: float = 0.05,
    seed: int = 7,
    start: str = "2020-01-01",
) -> DataFrame:
    """Sparse clumped boolean event field (FIXTURES.md §3): ~5% true,
    spatially clumped via coarse-block hashing."""
    t = spark.range(n_time).select(F.col("id").alias("t"))
    yy = spark.range(ny).select(F.col("id").cast("int").alias("y"))
    xx = spark.range(nx).select(F.col("id").cast("int").alias("x"))
    df = t.crossJoin(yy).crossJoin(xx)
    time = F.timestamp_add("DAY", F.col("t").cast("int"), F.lit(start).cast("timestamp"))
    block = _uniform(
        [F.col("t"), (F.col("y") / 4).cast("int"), (F.col("x") / 4).cast("int")],
        0.0,
        1.0,
        seed,
    )
    jitter = _uniform([F.col("t"), F.col("y"), F.col("x")], 0.0, 1.0, seed + 1)
    extreme = (block < density * 2.5) & (jitter < 0.8)
    return df.select(time.alias("time"), "y", "x", extreme.alias("extreme"))


def synthetic_documents(
    spark: SparkSession,
    n_docs: int,
    words_per_doc: int = 16,
    vocab_size: int = 8192,
    dup_every: int = 100,
    n_sources: int = 5,
    partitions: int = 64,
) -> DataFrame:
    """Synthetic document corpus for the dedup scale-rehearsal rows —
    the text analogue of the packed band fixture: rows are generated
    by a numpy ``mapInArrow`` kernel (splitmix64-style word draws, no
    driver loops), so a multi-million-doc corpus lands in seconds.

    Every ``dup_every``-th doc copies the NEXT doc's text verbatim, so
    exact/near-dup operators have a known ~1/dup_every duplicate rate
    to find; everything else is near-orthogonal under 3-gram shingles.
    Schema matches the testdata ``documents`` table's columns the
    dedup suite reads: ``(doc_id long, source string, text string)``.
    Source ``src0`` — the held-out benchmark side decontamination
    queries probe against — is assigned to ~1/1000 docs (a benchmark
    is small relative to a training corpus); the rest spread over
    ``src1..src{n_sources-1}``.
    """
    import numpy as np
    import pyarrow as pa

    vocab = np.array([f"tok{i}" for i in range(vocab_size)])

    def _gen(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy().astype(np.uint64)
            n = np.uint64(n_docs)
            seed = np.where(
                (ids % np.uint64(dup_every) == 0) & (ids + np.uint64(1) < n),
                ids + np.uint64(1),
                ids,
            )
            # splitmix64 word draws: deterministic, batch-layout-free
            pos = np.arange(words_per_doc, dtype=np.uint64)
            z = (
                seed[:, None] * np.uint64(0x9E3779B97F4A7C15)
                + (pos + np.uint64(1)) * np.uint64(0xBF58476D1CE4E5B9)
            )
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xD6E8FEB86659FD93)
            z = z ^ (z >> np.uint64(27))
            w = vocab[(z % np.uint64(vocab_size)).astype(np.int64)]
            text = w[:, 0]
            for j in range(1, words_per_doc):
                text = np.char.add(np.char.add(text, " "), w[:, j])
            # source keys off the RAW id (seed redirection would make
            # src0 unsatisfiable: ids≡0 mod 1000 are all dup-redirected).
            # A src0 doc that is also a dup (id≡0 mod 1000) duplicates
            # training doc id+1's text — i.e. the corpus contains REAL
            # contamination for the decontam operators to find.
            src = np.where(
                ids % np.uint64(1000) == 0,
                "src0",
                np.char.add(
                    "src",
                    (
                        np.uint64(1) + ids % np.uint64(max(1, n_sources - 1))
                    ).astype(str),
                ),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64)),
                    pa.array(src.tolist()),
                    pa.array(text.tolist()),
                ],
                names=["doc_id", "source", "text"],
            )

    return spark.range(n_docs, numPartitions=partitions).mapInArrow(
        _gen, schema="doc_id long, source string, text string"
    )


def materialize_corpus_fixture(
    spark: SparkSession,
    corpus_dir: str,
    n_docs: int,
    words_per_doc: int = 16,
    reuse: bool = True,
) -> str:
    """Land :func:`synthetic_documents` as ``{corpus_dir}/documents.
    parquet`` — the layout ``load_table`` reads, so every registered
    dedup/text query runs unchanged against the scale corpus by
    passing ``corpus_dir`` as its ``sf_dir``. ``reuse=True`` skips
    generation when the parquet already exists with a matching row
    count and word width (same reuse contract as the packed band
    fixture)."""
    import os

    path = os.path.join(corpus_dir, "documents.parquet")
    if reuse and os.path.isdir(path):
        try:
            prior = spark.read.parquet(path)
            first = prior.select("text").first()
            if (
                prior.count() == n_docs
                and len(first[0].split(" ")) == words_per_doc
            ):
                return corpus_dir
        except Exception:
            pass
    synthetic_documents(
        spark, n_docs, words_per_doc=words_per_doc
    ).write.mode("overwrite").parquet(path)
    return corpus_dir


def synthetic_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    dup_every: int = 100,
    partitions: int = 64,
) -> DataFrame:
    """Synthetic embedding corpus for the similarity/semdedup scale
    rows — numpy ``mapInArrow`` splitmix64 draws in [-0.5, 0.5), so
    random pairs sit near cosine 0 at any real dimension. Every
    ``dup_every``-th vector copies the NEXT vector verbatim (cosine
    1.0): the planted ~1/dup_every near-duplicate rate semantic dedup
    must find. Schema ``(vec_id long, embedding array<float>)``."""
    import numpy as np
    import pyarrow as pa

    def _gen(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy().astype(np.uint64)
            n = np.uint64(n_vecs)
            seed = np.where(
                (ids % np.uint64(dup_every) == 0) & (ids + np.uint64(1) < n),
                ids + np.uint64(1),
                ids,
            )
            pos = np.arange(dim, dtype=np.uint64)
            z = (
                seed[:, None] * np.uint64(0x9E3779B97F4A7C15)
                + (pos + np.uint64(1)) * np.uint64(0xD1B54A32D192ED03)
            )
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = z ^ (z >> np.uint64(27))
            vals = (z % np.uint64(1 << 24)).astype(np.float64) / float(1 << 24) - 0.5
            emb = vals.astype(np.float32)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64)),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(emb.reshape(-1)), dim
                    ).cast(pa.list_(pa.float32())),
                ],
                names=["vec_id", "embedding"],
            )

    return spark.range(n_vecs, numPartitions=partitions).mapInArrow(
        _gen, schema="vec_id long, embedding array<float>"
    )


def materialize_embedding_fixture(
    spark: SparkSession,
    corpus_dir: str,
    n_vecs: int,
    dim: int = 64,
    reuse: bool = True,
) -> str:
    """Land :func:`synthetic_embeddings` as ``{corpus_dir}/embeddings.
    parquet`` (the load_table layout) with the packed-fixture reuse
    contract (row count + dim pin)."""
    import os

    path = os.path.join(corpus_dir, "embeddings.parquet")
    if reuse and os.path.isdir(path):
        try:
            prior = spark.read.parquet(path)
            if (
                prior.count() == n_vecs
                and len(prior.select("embedding").first()[0]) == dim
            ):
                return corpus_dir
        except Exception:
            pass
    synthetic_embeddings(spark, n_vecs, dim=dim).write.mode(
        "overwrite"
    ).parquet(path)
    return corpus_dir
