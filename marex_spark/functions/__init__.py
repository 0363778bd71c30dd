from marex_spark.functions.temporal import dayofyear_col, decimal_year  # noqa: F401
from marex_spark.functions.geometry import (  # noqa: F401
    latlon_to_cartesian,
    haversine_km,
    cell_area_from_resolution,
)
from marex_spark.functions.binning import digitize, clip  # noqa: F401
from marex_spark.functions.decimals import dsum, davg  # noqa: F401
