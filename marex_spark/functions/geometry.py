"""Spherical-geometry column expressions (reference: marEx/track.py
lat/lon→Cartesian 2196-2199, haversine 5406-5411, cell-area-from-
resolution 445-458). All pure JVM-side expressions — no UDFs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def latlon_to_cartesian(lat: Column, lon: Column) -> tuple[Column, Column, Column]:
    """Unit-sphere Cartesian components. Area-weighted sums of these give
    the spherical centroid (SURVEY A10) with periodic-longitude handling
    for free (track.py:2088-2097's wrap logic becomes unnecessary)."""
    la, lo = F.radians(lat), F.radians(lon)
    return (
        F.cos(la) * F.cos(lo),
        F.cos(la) * F.sin(lo),
        F.sin(la),
    )


def cartesian_to_latlon(x: Column, y: Column, z: Column) -> tuple[Column, Column]:
    """Inverse of latlon_to_cartesian on a (not necessarily unit) vector."""
    lat = F.degrees(F.atan2(z, F.sqrt(x * x + y * y)))
    lon = F.degrees(F.atan2(y, x))
    return lat, lon


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (track.py:5406-5411)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dphi / 2), 2) + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dlmb / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def cell_area_from_resolution(lat: Column, dlat_deg: float, dlon_deg: float) -> Column:
    """Grid-cell area on the sphere in km²:
    R² · |sin(lat+dφ/2) − sin(lat−dφ/2)| · dλ  (track.py:445-458)."""
    half = dlat_deg / 2.0
    return (
        F.lit(EARTH_RADIUS_KM**2)
        * F.abs(F.sin(F.radians(lat + F.lit(half))) - F.sin(F.radians(lat - F.lit(half))))
        * F.lit(float(__import__("math").radians(dlon_deg)))
    )


def unify_coordinates(df, lat_col: str = "lat", lon_col: str = "lon"):
    """Coordinate unification (reference track.py:919-976): auto-detect
    radians vs degrees from the value range (|lat| ≤ π and |lon| ≤ 2π
    ⇒ radians, track.py:947-971) and convert to degrees; normalise
    longitude to [0, 360). Returns (df, was_radians)."""
    from pyspark.sql import functions as F

    r = df.agg(
        F.max(F.abs(F.col(lat_col))).alias("la"),
        F.max(F.abs(F.col(lon_col))).alias("lo"),
    ).first()
    was_radians = (
        r.la is not None
        and r.la <= 3.15
        and r.lo is not None
        and r.lo <= 6.3
    )
    if was_radians:
        df = df.withColumn(lat_col, F.degrees(lat_col)).withColumn(
            lon_col, F.degrees(lon_col)
        )
    df = df.withColumn(lon_col, F.pmod(F.col(lon_col), F.lit(360.0)))
    return df, was_radians
