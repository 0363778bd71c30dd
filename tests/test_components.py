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


def test_driver_cc_auto_fallback_matches(spark):
    """Above max_driver_pairs the driver solver hands off to the
    distributed path; both compact forms must agree with the in-memory
    union-find."""
    from marex_spark.operators.components import connected_components_driver

    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (10, 11, 1.0)],
        "id_t long, id_next long, overlap_area double",
    )
    ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20)], "obj_id long"
    )
    want_roots = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}
    direct = {
        r.obj_id: r.event_id
        for r in connected_components_driver(pairs, ids, compact=False).collect()
    }
    assert direct == want_roots
    fallback = {
        r.obj_id: r.event_id
        for r in connected_components_driver(
            pairs, ids, compact=False, max_driver_pairs=1
        ).collect()
    }
    # the distributed root form covers nodes in the pair graph; nodes
    # absent from it are singletons and keep their own id via the
    # remap join's semantics — here assert graph nodes match
    for k in (1, 2, 3, 10, 11):
        assert fallback[k] == want_roots[k]
    compact_fb = {
        r.obj_id: r.event_id
        for r in connected_components_driver(
            pairs, ids, compact=True, max_driver_pairs=1
        ).collect()
    }
    assert set(compact_fb.values()) == {1, 2, 3}  # dense 1..K over 3 components
    assert compact_fb[1] == compact_fb[2] == compact_fb[3]
    assert compact_fb[10] == compact_fb[11] != compact_fb[20]


def test_sparse_mapping_remap_equals_dense(spark):
    """include_singletons=False + remap_ids_sparse must reproduce the
    dense compact=False mapping's remap EXACTLY (rows, values, column
    order) — it's the default link path of track_events, which skips
    the all-ids distinct pass (r9 link-phase optimization)."""
    from marex_spark.operators.components import remap_ids, remap_ids_sparse

    pairs, ids = _graph(spark)
    # a cell table: several rows per obj id, plus payload columns
    cells = ids.crossJoin(spark.range(3).select(F.col("id").alias("t"))).select(
        "t", "obj_id", (F.col("obj_id") * 10 + F.col("t")).alias("payload")
    )
    dense = connected_components_driver(pairs, ids, compact=False)
    sparse = connected_components_driver(
        pairs, ids, compact=False, include_singletons=False
    )
    # sparse mapping must not contain singleton 20
    assert 20 not in {r.obj_id for r in sparse.collect()}
    want = remap_ids(cells, dense)
    got = remap_ids_sparse(cells, sparse)
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() == cells.count()


def test_sparse_requires_non_compact(spark):
    import pytest

    pairs, ids = _graph(spark)
    with pytest.raises(ValueError):
        connected_components_driver(
            pairs, ids, compact=True, include_singletons=False
        )
