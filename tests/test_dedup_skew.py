"""LSH skew guard: star expansion on hot band buckets must preserve
the connected components (canonicalisation answer) of the clique
expansion — the property that lets the O(d) form replace the O(d²)
form at scale."""

from pyspark.sql import functions as F

from marex_spark.operators.components import connected_components_driver
from marex_spark.queries.dedup import (
    _STAR_CAP,
    _lsh_bands,
    dedup_lsh_star_capped,
    dedup_minhash_lsh,
)
from marex_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _clusters(spark, pairs):
    docs = load_table(spark, SF, "documents").select("doc_id")
    comp = connected_components_driver(
        pairs.select(
            F.col("doc_a").alias("id_t"), F.col("doc_b").alias("id_next")
        ),
        docs,
        id_col="doc_id",
        compact=False,
    )
    return {
        (r.doc_id, r.event_id) for r in comp.collect()
    }


def test_star_cap_fires_and_preserves_clusters(spark):
    clique = dedup_minhash_lsh(spark, SF)
    star = dedup_lsh_star_capped(spark, SF)
    n_clique, n_star = clique.count(), star.count()
    # the cap actually engages on this corpus (otherwise the test is vacuous)
    bands = _lsh_bands(load_table(spark, SF, "documents"))
    big = (
        bands.groupBy("band", "band_key")
        .count()
        .filter(F.col("count") > _STAR_CAP)
        .count()
    )
    assert big > 0
    assert n_star <= n_clique
    assert _clusters(spark, clique) == _clusters(spark, star)


def test_substring_spans_planted_copy(spark, tmp_path):
    """A verbatim 16-token span copied between two docs is flagged at
    every window position it covers; unrelated docs and short docs
    report zero with ratio 0.0."""
    import marex_spark.queries.dedup as dq

    span = " ".join(f"tok{i}" for i in range(16))
    docs = [
        (0, "alpha " + span + " omega", "en", "s0", 0),
        (1, "prefix words here " + span, "en", "s1", 0),
        (2, " ".join(f"other{i}" for i in range(30)), "en", "s0", 0),
        (3, "too short", "en", "s1", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: r
        for r in dq.dedup_substring_spans(spark, str(tmp_path)).collect()
    }
    # doc0: 18 tokens -> 3 windows; only the exact copied alignment
    # (positions covering the span with identical 16-token content)
    # is shared with doc1 -> the 'alpha..'-shifted windows differ
    assert out[0].n_windows == 3 and out[0].n_dup_windows == 1
    assert out[1].n_windows == 4 and out[1].n_dup_windows == 1
    assert out[2].n_windows == 15 and out[2].n_dup_windows == 0
    assert out[3].n_windows == 0 and out[3].dup_ratio == 0.0
