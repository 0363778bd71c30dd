"""domain_top_n: the group-limit single-window form and the salted
two-phase fallback must return EXACTLY the same rows on any domain
histogram (the salt only changes where sorting happens, never which
rows win), and the cap must actually bind on a hot domain."""

import pytest
from pyspark.sql import functions as F

from marex_spark.operators.curation import domain_top_n, domain_top_n_salted


def _skewed(spark, n=5000, hot_share=0.9):
    """~90% of rows in ONE domain, the rest spread over 10."""
    n_hot = int(n * hot_share)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("d"), F.pmod("id", F.lit(10))))
        .alias("source"),
        # score with heavy ties so the tiebreak column is load-bearing
        F.pmod(F.col("id") * 2654435761, F.lit(97)).alias("score"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_fallback_equals_group_limit_form(spark):
    df = _skewed(spark)
    order = [F.desc("score"), F.col("doc_id")]
    fast = domain_top_n(df, "source", order, 25)
    salted = domain_top_n_salted(
        df, "source", order, 25, salt_col=F.pmod("doc_id", F.lit(8)), n_salts=8
    )
    assert _rows(fast) == _rows(salted)
    # the cap binds on the hot domain and every rank is 1..25
    got = fast.groupBy("source").count().collect()
    assert all(r["count"] <= 25 for r in got)
    assert next(r["count"] for r in got if r.source == "hot") == 25


def test_salted_default_partition_id_same_winners(spark):
    """spark_partition_id salting is layout-dependent, but the RESULT
    must not be: phase 2 re-ranks whatever superset phase 1 kept."""
    df = _skewed(spark, n=2000)
    order = [F.desc("score"), F.col("doc_id")]
    default_salt = domain_top_n_salted(df, "source", order, 10)
    fast = domain_top_n(df, "source", order, 10)
    assert _rows(default_salt) == _rows(fast)


def test_cap_larger_than_domain_keeps_all(spark):
    df = _skewed(spark, n=300, hot_share=0.5)
    order = [F.desc("score"), F.col("doc_id")]
    out = domain_top_n(df, "source", order, 10_000)
    assert out.count() == 300


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 4),      # domain
            st.integers(0, 5),      # score (heavy ties)
        ),
        min_size=1,
        max_size=60,
    ),
    n=st.integers(1, 7),
    salts=st.sampled_from([1, 2, 8]),
)
@pytest.mark.slow
def test_property_salted_equals_group_limit(spark, rows, n, salts):
    """Any domain histogram, any tie structure, any cap, any salt
    count: the salted two-phase fallback returns exactly the
    group-limit window's rows."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"d{d}", s) for i, (d, s) in enumerate(rows)],
        "doc_id long, source string, score long",
    )
    order = [F.desc("score"), F.col("doc_id")]
    fast = domain_top_n(df, "source", order, n)
    salted = domain_top_n_salted(
        df, "source", order, n,
        salt_col=F.pmod("doc_id", F.lit(salts)), n_salts=salts,
    )
    assert _rows(fast) == _rows(salted)


def test_rank_name_collision_raises(spark):
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 5, 0)], "doc_id long, source string, score long, rank int"
    )
    with pytest.raises(ValueError, match="rank_name"):
        domain_top_n(df, "source", [F.desc("score"), F.col("doc_id")], 2)
    # a different rank_name works
    out = domain_top_n(
        df, "source", [F.desc("score"), F.col("doc_id")], 2, rank_name="r"
    )
    assert out.columns.count("r") == 1


def test_salted_temp_names_avoid_caller_columns(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "a", i, 7, 8) for i in range(6)],
        "doc_id long, source string, score long, __salt int, __r1 int",
    )
    out = domain_top_n_salted(
        df, "source", [F.desc("score"), F.col("doc_id")], 3, n_salts=2
    )
    rows = out.orderBy("doc_id").collect()
    assert len(rows) == 3
    # caller's __salt/__r1 survive untouched
    assert all(r["__salt"] == 7 and r["__r1"] == 8 for r in rows)
