"""reference_period — restricting the fixed-baseline climatology to a
year range while scoring every sample (reference detect.py:301,
358-362, validation 570-577; climatology-only scope 2411-2413).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marex_spark.exceptions import ConfigurationError
from marex_spark.operators.climatology import anomaly_fixed_baseline
from marex_spark.operators.detect import preprocess_data
from marex_spark.operators.detect_blocked import detect_extremes_blocked
from marex_spark.sources.synthetic import synthetic_sst_gridded


@pytest.fixture(scope="module")
def sst(spark):
    return synthetic_sst_gridded(spark, n_years=6, ny=6, nx=8).localCheckpoint()


def test_rejected_for_other_methods(spark, sst):
    for m in ("shifting_baseline", "detrend_harmonic"):
        with pytest.raises(ConfigurationError, match="reference_period"):
            preprocess_data(sst, method_anomaly=m, reference_period=(2000, 2002))


def test_clim_uses_only_reference_years(spark, sst):
    """Manually recompute the climatology from the reference years only
    and check the anomaly of a post-period sample."""
    out = anomaly_fixed_baseline(sst, reference_period=(2000, 2002))
    probe = out.filter(
        (F.col("y") == 3) & (F.col("x") == 4) & (F.col("doy") == 100)
    ).select("year", "value", "clim", "anomaly")
    rows = {r.year: r for r in probe.collect()}
    ref_vals = [
        r.value for y, r in rows.items() if 2000 <= y <= 2002
    ]
    want_clim = sum(ref_vals) / len(ref_vals)
    for y, r in rows.items():
        assert r.clim == pytest.approx(want_clim, rel=1e-12)
        assert r.anomaly == pytest.approx(r.value - want_clim, rel=1e-9)


def test_differs_from_full_series_clim(sst):
    """With a warming trend, an early-years baseline must yield larger
    late anomalies than the full-series baseline."""
    early = anomaly_fixed_baseline(sst, reference_period=(2000, 2001))
    full = anomaly_fixed_baseline(sst)
    a_early = early.filter(F.col("year") == 2005).agg(F.avg("anomaly")).first()[0]
    a_full = full.filter(F.col("year") == 2005).agg(F.avg("anomaly")).first()[0]
    assert a_early > a_full


def test_blocked_kernel_parity(spark, sst):
    """Blocked kernel with reference_period must flag exactly the same
    extreme cells as the relational path."""
    rel = preprocess_data(
        sst,
        method_anomaly="fixed_baseline",
        method_extreme="global_extreme",
        method_percentile="exact",
        threshold_percentile=0.9,
        reference_period=(2000, 2003),
    )
    rel_cells = {
        (r.time, r.y, r.x)
        for r in rel.extremes.filter(F.col("extreme"))
        .select("time", "y", "x")
        .collect()
    }
    blk = detect_extremes_blocked(
        sst,
        method_anomaly="fixed_baseline",
        method_extreme="global_extreme",
        method_percentile="exact",
        threshold_percentile=0.9,
        reference_period=(2000, 2003),
    )
    blk_cells = {(r.time, r.y, r.x) for r in blk.collect()}
    rel.unpersist()
    assert rel_cells == blk_cells
    assert len(blk_cells) > 0


def test_detrend_fixed_baseline_reference_period(spark, sst):
    """detrend_fixed_baseline honours the period in the climatology step
    (kernel vs relational parity again)."""
    rel = preprocess_data(
        sst,
        method_anomaly="detrend_fixed_baseline",
        method_extreme="global_extreme",
        method_percentile="exact",
        threshold_percentile=0.9,
        reference_period=(2001, 2004),
    )
    rel_cells = {
        (r.time, r.y, r.x)
        for r in rel.extremes.filter(F.col("extreme"))
        .select("time", "y", "x")
        .collect()
    }
    blk = detect_extremes_blocked(
        sst,
        method_anomaly="detrend_fixed_baseline",
        method_extreme="global_extreme",
        method_percentile="exact",
        threshold_percentile=0.9,
        reference_period=(2001, 2004),
    )
    blk_cells = {(r.time, r.y, r.x) for r in blk.collect()}
    rel.unpersist()
    assert rel_cells == blk_cells
    assert len(blk_cells) > 0
