"""Temporal column helpers (reference: marEx/detect.py:1605-1606 doy/year
accessors; detect.py:2031-2058 decimal year)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dayofyear_col(time: Column | str) -> Column:
    """Day-of-year 1..366 (matches xarray's ``.dt.dayofyear``)."""
    return F.dayofyear(time)


def decimal_year(time: Column | str) -> Column:
    """Continuous decimal year, e.g. 1996-07-02 → ~1996.5.

    Reference computes (detect.py:2031-2058) a decimal-year axis for the
    harmonic/trend design matrix. Uses exact day arithmetic: year +
    (doy-1)/days_in_year.
    """
    t = F.col(time) if isinstance(time, str) else time
    year = F.year(t)
    doy = F.dayofyear(t)
    days_in_year = F.when(
        (year % 4 == 0) & ((year % 100 != 0) | (year % 400 == 0)), F.lit(366.0)
    ).otherwise(F.lit(365.0))
    return year + (doy - F.lit(1)) / days_in_year


def epoch_day(time: Column | str) -> Column:
    """Days since 1970-01-01 as an integer — a monotone integer time key
    used for rangeBetween windows (gap-robust rolling means, SURVEY W1)."""
    t = F.col(time) if isinstance(time, str) else time
    return F.datediff(t.cast("date"), F.lit("1970-01-01").cast("date"))
