"""Theta-sketch operator tier: mergeability (the 100 TB property),
estimate accuracy on a known-cardinality corpus, and the geometry
guard."""

import pytest
from pyspark.sql import functions as F

from marex_spark.operators.sketch import (
    theta_distinct,
    theta_estimate,
    theta_survivors,
    theta_threshold,
)


def _items(spark, lo, hi, grp="g"):
    """Distinct items lo..hi-1, each duplicated 3× (sketch must be
    frequency-blind)."""
    return (
        spark.range(lo, hi)
        .select(F.concat(F.lit("item"), F.col("id")).alias("v"))
        .withColumn("dup", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))))
        .select(F.lit(grp).alias("g"), "v")
    )


def test_merge_of_sketches_equals_sketch_of_union(spark):
    """Survivor sets union: sketch(A ∪ B) == estimate over
    (survivors(A) ∪ survivors(B)), with A and B OVERLAPPING so the
    distinct in the merge is load-bearing."""
    a = _items(spark, 0, 6000)
    b = _items(spark, 4000, 10000)  # 2000 items overlap
    scale = 16
    direct = theta_distinct(
        a.unionByName(b), ["g"], F.col("v"), scale
    ).collect()
    merged = theta_estimate(
        theta_survivors(a, ["g"], F.col("v"), scale).unionByName(
            theta_survivors(b, ["g"], F.col("v"), scale)
        ),
        ["g"],
        scale,
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, merged))


def test_estimate_accuracy_known_cardinality(spark):
    """10k distinct items at scale=16: stderr ~ sqrt(16/10000) = 4%,
    so a 20% band is a ~5-sigma test — deterministic anyway (md5)."""
    est = theta_distinct(_items(spark, 0, 10000), ["g"], F.col("v"), 16).first()
    assert 8000 <= est["est_distinct"] <= 12000
    assert est["n_sample"] * 16 == est["est_distinct"]


def test_duplicates_do_not_move_the_estimate(spark):
    one_copy = (
        spark.range(0, 3000)
        .select(F.lit("g").alias("g"), F.concat(F.lit("item"), F.col("id")).alias("v"))
    )
    est_dup = theta_distinct(_items(spark, 0, 3000), ["g"], F.col("v"), 16).first()
    est_one = theta_distinct(one_copy, ["g"], F.col("v"), 16).first()
    assert est_dup["est_distinct"] == est_one["est_distinct"]


def test_scale_must_be_power_of_two():
    with pytest.raises(ValueError):
        theta_threshold(10)
    with pytest.raises(ValueError):
        theta_threshold(0)
    assert theta_threshold(16) == (1 << 60) // 16


def test_source_overlap_estimates_planted_jaccard(spark):
    """Two sources with a planted shingle-set overlap: the signature
    estimator must land near the true Jaccard (64 perms → stderr
    ~ sqrt(J(1-J)/64) ≈ 0.06 at J=0.5; assert a generous band —
    deterministic anyway)."""
    from marex_spark.queries.dedup import sketch_source_overlap

    import tempfile

    from pyspark.sql import functions as F

    # 300 docs: src_x = docs 0..199, src_y = docs 100..299 → doc sets
    # overlap 100/300; 12-word docs from a doc-unique token stream so
    # shingle sets inherit the doc overlap (Jaccard ≈ 1/3)
    base = spark.range(300).select(
        F.col("id").alias("k"),
        F.concat_ws(
            " ", *[F.concat(F.lit("t"), F.col("id") * 20 + j) for j in range(12)]
        ).alias("text"),
    )
    docs = (
        base.filter("k < 200")
        .select((F.col("k")).alias("doc_id"), F.lit("src_x").alias("source"), "text")
        .unionByName(
            base.filter("k >= 100").select(
                (F.col("k") + 1000).alias("doc_id"),
                F.lit("src_y").alias("source"),
                "text",
            )
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("n_chars", F.length("text"))
    )
    d = tempfile.mkdtemp(prefix="mx_overlap_")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    est = sketch_source_overlap(spark, d).first()
    true_j = 1.0 / 3.0
    assert abs(est["est_jaccard"] - true_j) < 0.2, est["est_jaccard"]


def test_theta_estimate_rejects_mixed_scale_merge(spark):
    """Survivor sets tagged with their scale must fail loudly when
    folded at a different scale (ADVICE r7: a mixed-scale merge
    silently biases the estimate)."""
    import pytest
    from pyspark.sql import functions as F

    from marex_spark.operators.sketch import theta_estimate, theta_survivors

    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("item")
    )
    s16 = theta_survivors(df, ["g"], F.col("item"), 16, tag_scale=True)
    s32 = theta_survivors(df, ["g"], F.col("item"), 32, tag_scale=True)
    # same-scale tagged merge works and estimates sanely
    est = theta_estimate(s16.unionByName(s16), ["g"], 16).first()
    assert abs(est["est_distinct"] - 5000) / 5000 < 0.25
    # mixed-scale merge raises inside the job
    with pytest.raises(Exception, match="theta_estimate"):
        theta_estimate(s16.unionByName(s32), ["g"], 16).collect()


def test_theta_caller_scale_column_not_misread(spark):
    """ADVICE r8: the scale tag rides the reserved __theta_scale
    column, so a caller whose data legitimately carries a 'scale'
    column — even as a GROUP column — must work: the column is never
    compared against the sketch scale nor dropped."""
    import pytest
    from pyspark.sql import functions as F

    from marex_spark.operators.sketch import (
        THETA_SCALE_TAG,
        theta_estimate,
        theta_survivors,
    )

    df = spark.range(4000).select(
        (F.col("id") % 2).alias("scale"),  # caller's own column
        F.col("id").cast("string").alias("item"),
    )
    surv = theta_survivors(df, ["scale"], F.col("item"), 16, tag_scale=True)
    est = {r["scale"]: r["est_distinct"]
           for r in theta_estimate(surv, ["scale"], 16).collect()}
    assert set(est) == {0, 1}
    for v in est.values():
        assert abs(v - 2000) / 2000 < 0.5
    # untagged path groups by the caller's 'scale' column untouched too
    est2 = theta_estimate(
        theta_survivors(df, ["scale"], F.col("item"), 16), ["scale"], 16
    ).collect()
    assert {r["scale"] for r in est2} == {0, 1}
    # the reserved name itself is refused as a group col
    with pytest.raises(ValueError, match="reserved"):
        theta_survivors(df, [THETA_SCALE_TAG], F.col("item"), 16)
