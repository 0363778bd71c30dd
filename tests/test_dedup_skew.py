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
