"""As-of join operator tests: backward/forward directions, equal-time
eligibility, left-outer nulls."""

from __future__ import annotations

import datetime

import pytest

from marex_spark.operators.asof import asof_join

T0 = datetime.datetime(2024, 1, 1)


def _t(d):
    return T0 + datetime.timedelta(days=d)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _t(1)), (1, _t(5)), (1, _t(10)), (2, _t(3)), (3, _t(2))],
        "k long, lt timestamp",
    )
    right = spark.createDataFrame(
        [(1, _t(0), 100.0), (1, _t(5), 150.0), (1, _t(8), 200.0), (2, _t(4), 50.0)],
        "k long, rt timestamp, px double",
    )
    return left, right


def test_backward(spark, frames):
    left, right = frames
    out = {
        (r.k, r.lt.day): r.px_r
        for r in asof_join(left, right, "k", "lt", "rt").collect()
    }
    assert out[(1, 2)] == 100.0   # day1 → day0 row
    assert out[(1, 6)] == 150.0   # day5 → equal-time row eligible
    assert out[(1, 11)] == 200.0  # day10 → day8
    assert out[(2, 4)] is None    # day3 < first right row (day4)
    assert out[(3, 3)] is None    # key with no right rows


def test_forward(spark, frames):
    left, right = frames
    out = {
        (r.k, r.lt.day): r.px_r
        for r in asof_join(left, right, "k", "lt", "rt", direction="forward").collect()
    }
    assert out[(1, 2)] == 150.0   # next right at/after day1 is day5
    assert out[(1, 6)] == 150.0   # equal time eligible
    assert out[(1, 11)] is None   # nothing after day10
    assert out[(2, 4)] == 50.0


def test_direction_validation(spark, frames):
    from marex_spark.exceptions import ConfigurationError

    left, right = frames
    with pytest.raises(ConfigurationError):
        asof_join(left, right, "k", "lt", "rt", direction="sideways")


def test_range_join_binned_bucket_boundaries(spark):
    """Intervals spanning bucket boundaries must still match (the
    explode covers every bucket the interval touches)."""
    from marex_spark.operators.asof import range_join_binned

    pts = spark.createDataFrame(
        [(1, _t(0) + datetime.timedelta(hours=h)) for h in range(0, 48, 5)],
        "k long, t timestamp",
    )
    iv = spark.createDataFrame(
        [(1, _t(0) + datetime.timedelta(hours=20),
          _t(0) + datetime.timedelta(hours=30), "A")],
        "k long, s timestamp, e timestamp, tag string",
    )
    out = range_join_binned(pts, iv, "k", "t", "s", "e", bucket="7 days")
    hours = sorted((r.t - _t(0)).total_seconds() / 3600 for r in out.collect())
    assert hours == [20.0, 25.0, 30.0]
    # tiny bucket → interval fans out over many buckets, same answer
    out2 = range_join_binned(pts, iv, "k", "t", "s", "e", bucket="1 hours")
    hours2 = sorted((r.t - _t(0)).total_seconds() / 3600 for r in out2.collect())
    assert hours2 == hours


class TestAsofReviewFixes:
    """Review findings: row-unit fill + NULL-key semantics."""

    def test_null_payload_not_resurrected(self, spark):
        """A NULL payload in the LATEST matching right row must stay
        NULL (per-column fill resurrected older values)."""
        from marex_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 3)], "k int, t int")
        right = spark.createDataFrame(
            [(1, 1, 5, 10), (1, 2, None, 20)], "k int, t int, val int, cnt int"
        )
        row = asof_join(left, right, "k", "t", "t").first()
        assert row.val_r is None  # from the t=2 row, not t=1's 5
        assert row.cnt_r == 20    # same right row supplies every column

    def test_null_keys_never_match(self, spark):
        from marex_spark.operators.asof import asof_join

        left = spark.createDataFrame([(None, 5)], "k int, t int")
        right = spark.createDataFrame([(None, 1, 7)], "k int, t int, val int")
        row = asof_join(left, right, "k", "t", "t").first()
        assert row.val_r is None

    def test_bucket_parser_units_and_errors(self, spark):
        import pytest

        from marex_spark.exceptions import ConfigurationError
        from marex_spark.operators.asof import range_join_binned

        pts = spark.createDataFrame(
            [(1, "2024-01-02 00:00:00")], "k int, t string"
        ).selectExpr("k", "CAST(t AS TIMESTAMP) AS t")
        iv = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", "2024-01-03 00:00:00")],
            "k int, s string, e string",
        ).selectExpr("k", "CAST(s AS TIMESTAMP) AS s", "CAST(e AS TIMESTAMP) AS e")
        # singular unit now accepted
        assert range_join_binned(pts, iv, "k", "t", "s", "e", bucket="1 day").count() == 1
        with pytest.raises(ConfigurationError, match="unit"):
            range_join_binned(pts, iv, "k", "t", "s", "e", bucket="1 fortnight")


def test_asof_differential_vs_duckdb_with_nulls(spark):
    """Randomised differential: asof_join vs DuckDB's native ASOF LEFT
    JOIN, including NULL payloads and NULL keys — the cases the
    pre-aggregated registry oracle can't reach."""
    import random

    import duckdb

    rng = random.Random(99)
    left_rows = [
        (rng.choice([1, 2, 3, None]), rng.randint(0, 50)) for _ in range(120)
    ]
    right_rows = [
        (
            rng.choice([1, 2, 3]),
            rng.randint(0, 50),
            rng.choice([None, 10, 20, 30]),
        )
        for _ in range(60)
    ]
    # dedupe right (k, t) so "latest right row" is unambiguous
    seen = {}
    for k, t, v in right_rows:
        seen[(k, t)] = v
    right_rows = [(k, t, v) for (k, t), v in seen.items()]

    from marex_spark.operators.asof import asof_join

    left = spark.createDataFrame(left_rows, "k int, t int")
    right = spark.createDataFrame(right_rows, "k int, rt int, val int")
    got = {
        (r.k, r.t, r.val_r)
        for r in asof_join(left, right, "k", "t", "rt").collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INT, t INT)")
    con.executemany("INSERT INTO l VALUES (?, ?)", left_rows)
    con.execute("CREATE TABLE r(k INT, rt INT, val INT)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", right_rows)
    want = {
        tuple(row)
        for row in con.execute(
            "SELECT l.k, l.t, r.val FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.rt"
        ).fetchall()
    }
    assert got == want


def test_asof_differential_null_times_scalar_semantics(spark):
    """NULL left/right TIMES follow scalar-comparison semantics (a NULL
    comparison never matches) — deliberately NOT DuckDB's native ASOF,
    whose sort-based implementation treats a NULL time as +infinity.
    The oracle is an explicit lateral subquery spelling the rule out."""
    import random

    import duckdb

    rng = random.Random(7)
    left_rows = [
        (
            rng.choice([1, 2, 3, None]),
            rng.choice([None] + list(range(31))),
        )
        for _ in range(100)
    ]
    right_rows = [
        (
            rng.choice([1, 2, 3]),
            rng.choice([None] + list(range(31))),
            rng.choice([None, 10, 20, 30]),
        )
        for _ in range(50)
    ]
    seen = {}
    for k, t, v in right_rows:
        seen[(k, t)] = v
    right_rows = [(k, t, v) for (k, t), v in seen.items()]

    from marex_spark.operators.asof import asof_join

    left = spark.createDataFrame(left_rows, "k int, t int")
    right = spark.createDataFrame(right_rows, "k int, rt int, val int")
    from collections import Counter

    got = Counter(
        (r.k, r.t, r.val_r)
        for r in asof_join(left, right, "k", "t", "rt").collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INT, t INT)")
    con.executemany("INSERT INTO l VALUES (?, ?)", left_rows)
    con.execute("CREATE TABLE r(k INT, rt INT, val INT)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", right_rows)
    want = Counter(
        tuple(row)
        for row in con.execute(
            """SELECT l.k, l.t,
                      (SELECT r.val FROM r
                        WHERE r.k = l.k AND r.rt <= l.t
                        ORDER BY r.rt DESC LIMIT 1) AS val
               FROM l"""
        ).fetchall()
    )
    assert got == want
