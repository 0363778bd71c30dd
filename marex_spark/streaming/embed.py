"""Streaming embedding scorers.

Everything here is a MAP-ONLY expression over the micro-batch: the
index (PQ codebooks + a query's distance LUTs) ships as plan literals,
so scoring adds no stream-side state, no watermark requirement, and no
shuffle — the ingest-time "how close is this new vector to the query /
the index" gate costs one codegen pass per micro-batch, identical to
the batch expression (parity pinned in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pq_encode_cols(vec_col: str, books: list[list[list[float]]]):
    """One code Column per subspace for fitted PQ codebooks
    (operators/embed.pq_fit) — slice + literal-centroid argmin, the
    same expression the batch encoder uses."""
    from marex_spark.operators.embed import kmeans_assign_cols

    m = len(books)
    sd = len(books[0][0])
    cols = []
    for j in range(m):
        sl = F.slice(vec_col, j * sd + 1, sd)
        code, _ = kmeans_assign_cols(sl, books[j])
        cols.append(code.alias(f"pq_code{j}"))
    return cols


def pq_score_stream(
    stream: DataFrame,
    books: list[list[list[float]]],
    query: list[float],
    vec_col: str = "embedding",
    out_col: str = "adc_dist2",
) -> DataFrame:
    """Score a vector stream against a query with the PQ asymmetric
    distance estimate (queries/similarity.ann_pq_adc's scoring half):
    encode each arriving vector and sum the per-subspace LUT lookups.
    Stateless map-only — at ingest scale this is the cheap "near the
    watchlist?" gate before any exact re-rank."""
    from marex_spark.queries.similarity import _dec_dist2_col

    m = len(books)
    sd = len(books[0][0])
    adc = None
    for j in range(m):
        sl = F.slice(vec_col, j * sd + 1, sd)
        from marex_spark.operators.embed import kmeans_assign_cols

        code, _ = kmeans_assign_cols(sl, books[j])
        qsub = F.array(*[F.lit(float(v)) for v in query[j * sd : (j + 1) * sd]])
        lut = F.array(*[_dec_dist2_col(qsub, c) for c in books[j]])
        term = F.element_at(lut, code + F.lit(1))
        adc = term if adc is None else adc + term
    return stream.withColumn(out_col, adc.cast("double"))


def ivfpq_residual_score_stream(
    stream: DataFrame,
    coarse: list[list[float]],
    books: list[list[list[float]]],
    query: list[float],
    probe_ids: list[int] | None = None,
    vec_col: str = "embedding",
    out_col: str = "adc_dist2",
    list_col: str = "ivf_list",
) -> DataFrame:
    """Residual IVF-PQ gate (the streaming half of
    queries/similarity.ann_ivfpq_residual_topk): each arriving vector
    coarse-assigns to its IVF list, its RESIDUAL to that list's
    centroid encodes against the pooled residual codebooks, and the
    ADC estimate uses the query's LUT for THAT list (q − centroid_c).

    Stateless map-only — every table (centroids, codebooks, one LUT
    per list) is a plan literal, so the gate is a pure per-row codegen
    expression at any ingest rate. ``probe_ids`` limits scoring to the
    query's probed lists (vectors landing elsewhere emit NULL — the
    definitely-not-near fast path); None scores every list."""
    from marex_spark.operators.embed import kmeans_assign_cols
    from marex_spark.queries.similarity import _dec_dist2_col

    m = len(books)
    sd = len(books[0][0])
    gcode, _ = kmeans_assign_cols(vec_col, coarse)
    cents_arr = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in coarse]
    )
    resid = F.zip_with(
        F.col(vec_col),
        F.element_at(cents_arr, gcode + F.lit(1)),
        lambda x, cm: x.cast("double") - cm,
    )
    lists = (
        range(len(coarse)) if probe_ids is None else [int(c) for c in probe_ids]
    )
    adc = None
    for c in lists:
        qr = [float(query[i]) - float(coarse[c][i]) for i in range(len(query))]
        total = None
        for j in range(m):
            sl = F.slice(resid, j * sd + 1, sd)
            code, _ = kmeans_assign_cols(sl, books[j])
            qsub = F.array(*[F.lit(v) for v in qr[j * sd : (j + 1) * sd]])
            lut = F.array(*[_dec_dist2_col(qsub, b) for b in books[j]])
            term = F.element_at(lut, code + F.lit(1))
            total = term if total is None else total + term
        branch = total.cast("double")
        adc = (
            F.when(gcode == c, branch)
            if adc is None
            else adc.when(gcode == c, branch)
        )
    return stream.withColumn(list_col, gcode).withColumn(out_col, adc)
