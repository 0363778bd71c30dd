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
