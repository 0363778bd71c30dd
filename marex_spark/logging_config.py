"""Logging / verbosity controls — the Spark-side analogue of the
reference's ``marEx.logging_config`` surface (logging_config.py:49-246:
get_logger / configure_logging / set_verbose_mode / set_quiet_mode /
set_normal_logging / verbosity queries / timing context).

Spark-first notes: executor-side code (Arrow kernels inside
mapInPandas/mapInArrow) must NOT touch driver logger state — kernels
stay pure; all logging here is driver-side orchestration logging.  The
one Spark-specific addition is ``quiet_spark_logs``, which drops the
JVM log level via the SparkContext so bench/driver runs aren't flooded
(the analogue of the reference silencing its external dask/distributed
loggers, logging_config.py:228-244).
"""

from __future__ import annotations

import logging
import sys
import time
from contextlib import contextmanager

DEFAULT_LOG_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
VERBOSE_LOG_FORMAT = (
    "%(asctime)s - %(name)s - %(levelname)s - %(funcName)s:%(lineno)d - %(message)s"
)
QUIET_LOG_FORMAT = "%(levelname)s - %(message)s"
DATE_FORMAT = "%Y-%m-%d %H:%M:%S"

_state = {"verbosity": "normal"}  # normal | verbose | quiet


def get_logger(name: str = "marex_spark") -> logging.Logger:
    """Namespaced logger (reference logging_config.py:49-68)."""
    if name == "marex_spark" or name.startswith("marex_spark."):
        return logging.getLogger(name)
    return logging.getLogger(f"marex_spark.{name}")


def configure_logging(
    level: int | str | None = None,
    log_file: str | None = None,
    verbose: bool | None = None,
    quiet: bool | None = None,
) -> logging.Logger:
    """(Re)configure the package root logger (reference
    logging_config.py:71-180). ``quiet`` wins over ``verbose`` when both
    are set, matching the reference's precedence (track.py:147-148)."""
    root = logging.getLogger("marex_spark")
    for h in list(root.handlers):
        root.removeHandler(h)

    if quiet:
        _state["verbosity"] = "quiet"
        eff_level, fmt = logging.WARNING, QUIET_LOG_FORMAT
    elif verbose:
        _state["verbosity"] = "verbose"
        eff_level, fmt = logging.DEBUG, VERBOSE_LOG_FORMAT
    else:
        _state["verbosity"] = "normal"
        eff_level, fmt = logging.INFO, DEFAULT_LOG_FORMAT
    if level is not None:
        eff_level = (
            getattr(logging, level.upper()) if isinstance(level, str) else level
        )

    handler: logging.Handler
    if log_file:
        handler = logging.FileHandler(log_file)
    else:
        handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(fmt, DATE_FORMAT))
    root.addHandler(handler)
    root.setLevel(eff_level)
    root.propagate = False
    return root


def set_verbose_mode(verbose: bool = True) -> None:
    """Reference logging_config.py:183-190."""
    configure_logging(verbose=verbose) if verbose else set_normal_logging()


def set_quiet_mode(quiet: bool = True) -> None:
    """Reference logging_config.py:193-200."""
    configure_logging(quiet=quiet) if quiet else set_normal_logging()


def set_normal_logging() -> None:
    """Reference logging_config.py:203-205."""
    configure_logging()


def get_verbosity_level() -> str:
    """'verbose' | 'normal' | 'quiet' (reference logging_config.py:208-215)."""
    return _state["verbosity"]


def is_verbose_mode() -> bool:
    return _state["verbosity"] == "verbose"


def is_quiet_mode() -> bool:
    return _state["verbosity"] == "quiet"


def quiet_spark_logs(spark, level: str = "WARN") -> None:
    """Drop the JVM-side log level (the Spark analogue of the
    reference's external-logger silencing, logging_config.py:228-244)."""
    spark.sparkContext.setLogLevel(level)


@contextmanager
def log_timing(
    logger: logging.Logger, message: str, level: int = logging.INFO
):
    """Timed block (reference logging_config.py:288-340): logs
    '<message>...' on entry and '<message> completed in Xs' on exit."""
    logger.log(level, "%s...", message)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.log(
            level, "%s completed in %.2fs", message, time.perf_counter() - t0
        )
