from marex_spark.sources.parquet import load_table, load_star_schema  # noqa: F401
from marex_spark.sources.synthetic import synthetic_sst_gridded  # noqa: F401
