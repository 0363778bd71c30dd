"""Distributed linear classification for document-quality pipelines:
hashed bag-of-words features + batch-gradient logistic regression.

The production shape (fasttext-style quality/language classifiers over
hashed n-gram features) with the same "small model, big scan" tiering
as pca_fit/kmeans_fit (operators/embed.py): per-iteration work is two
corpus-sized aggregations whose shuffles carry only (docs × 1) scores
and (dim × 1) gradients after map-side combine; driver state is the
weight vector. Fixed iteration counts + decimal-fold sums +
round6(sigmoid) make training deterministic enough to replay as
unrolled SQL in the DuckDB oracle (queries/text.py txt_quality_lr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marex_spark.functions.decimals import dsum


def hashed_bow_features(
    docs: DataFrame,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, j, x) hashed bag-of-words: token → md5 → int64 → bucket
    j ∈ [0, dim); x = bucket count / doc token count; plus an intercept
    feature j=dim with x=1 for every doc. One explode + one
    map-side-combinable groupBy."""
    tok = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    j = (
        F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long") % dim
    ).cast("int")
    counts = tok.groupBy(id_col, j.alias("j")).agg(F.count("*").alias("c"))
    lens = tok.groupBy(id_col).agg(F.count("*").alias("n"))
    feats = counts.join(lens, id_col).select(
        id_col, "j", (F.col("c").cast("double") / F.col("n")).alias("x")
    )
    intercept = docs.select(
        id_col, F.lit(dim).cast("int").alias("j"), F.lit(1.0).alias("x")
    )
    return feats.unionByName(intercept)


def _scores(features: DataFrame, weights: list[float], id_col: str):
    """Per-doc round6(sigmoid(w·x)) — weights ship as a plan-literal
    array indexed by j (codegen lookup, no join)."""
    from marex_spark.queries.registry import round6

    warr = F.array(*[F.lit(float(v)) for v in weights])
    z = features.groupBy(id_col).agg(
        dsum(F.col("x") * F.element_at(warr, F.col("j") + 1), "z")
    )
    return z.select(
        id_col, round6(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))).alias("p")
    )


def logreg_fit(
    features: DataFrame,
    labels: DataFrame,
    dim: int,
    n_iter: int = 2,
    lr: float = 0.5,
    id_col: str = "doc_id",
    features_materialized: bool = False,
) -> list[float]:
    """Batch-gradient logistic regression: w ← w − lr·(1/N)·Σ(σ(w·x)−y)x,
    ``n_iter`` full-batch steps from w=0. ``features`` is the
    (id, j, x) long form (j=dim is the intercept); ``labels`` is
    (id, y∈{0,1}). Returns the dim+1 weights as plain floats.

    Determinism: z and the gradient fold DECIMAL(38,6); the one
    transcendental (exp) is wrapped in round6 so a last-ulp libm
    difference between engines cannot leak into the next iteration —
    the DuckDB oracle replays training bit-for-bit."""
    if dim <= 0 or n_iter < 0:
        raise ValueError("logreg_fit needs dim > 0 and n_iter >= 0")
    n = labels.count()
    if n == 0:
        raise ValueError("logreg_fit on an empty label set")
    # each iteration runs two jobs over `features` — materialise once
    # here so an un-checkpointed feature lineage (explode + groupBys)
    # is not recomputed 2×n_iter times. Callers that ALSO score with
    # the same frame should checkpoint it themselves and declare
    # features_materialized=True, so fit and predict share one
    # materialisation.
    if not features_materialized:
        features = features.localCheckpoint()
    w = [0.0] * (dim + 1)
    for _ in range(n_iter):
        p = _scores(features, w, id_col)
        resid = p.join(labels, id_col).select(
            id_col, (F.col("p") - F.col("y").cast("double")).alias("r")
        )
        g_rows = (
            features.join(resid, id_col)
            .groupBy("j")
            .agg((dsum(F.col("r") * F.col("x")) / F.lit(float(n))).alias("g"))
            .collect()
        )
        g = {r.j: float(r.g) for r in g_rows}
        w = [w[j] - lr * g.get(j, 0.0) for j in range(dim + 1)]
    return w


def logreg_predict(
    features: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """(id, p, label) scores for a fitted weight vector — a pure
    per-doc aggregation over the feature scan (one corpus pass at any
    scale)."""
    p = _scores(features, weights, id_col)
    return p.select(
        id_col, "p", (F.col("p") >= threshold).alias("label")
    )
