"""Connected-components tests (SURVEY M7): driver union-find vs the
distributed min-label-propagation fallback must agree — the fallback is
the 100 TB path when the pair graph outgrows the driver."""

from __future__ import annotations

from pyspark.sql import functions as F

from marex_spark.operators.components import (
    connected_components_distributed,
    connected_components_driver,
)


def _graph(spark):
    # components: {1,2,3,4}(chain), {10,11}, {20} singleton, {30,31,32}(star)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (30, 31), (30, 32)],
        "id_t long, id_next long",
    )
    ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11, 20, 30, 31, 32)], "obj_id long"
    )
    return pairs, ids


def test_driver_cc_components(spark):
    pairs, ids = _graph(spark)
    got = {
        r.obj_id: r.event_id
        for r in connected_components_driver(pairs, ids).collect()
    }
    assert got[1] == got[2] == got[3] == got[4]
    assert got[10] == got[11] != got[1]
    assert got[30] == got[31] == got[32]
    assert len({got[1], got[10], got[20], got[30]}) == 4
    assert set(got.values()) == {1, 2, 3, 4}  # dense 1..K


def test_distributed_cc_matches_driver(spark):
    pairs, ids = _graph(spark)
    drv = {
        r.obj_id: r.event_id
        for r in connected_components_driver(pairs, ids).collect()
    }
    dist = {
        r.obj_id: r.event_id
        for r in connected_components_distributed(pairs, ids).collect()
    }
    assert drv == dist


def test_distributed_cc_long_chain(spark):
    """Pointer jumping must converge on a long path well under the
    round cap (doubling: ~log2(n) rounds)."""
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_t long, id_next long"
    )
    ids = spark.range(n + 1).select(F.col("id").alias("obj_id"))
    got = connected_components_distributed(pairs, ids, max_rounds=24)
    assert got.select("event_id").distinct().count() == 1
