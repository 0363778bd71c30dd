"""Logging/verbosity surface (reference logging_config.py:49-340)."""

from __future__ import annotations

import logging

import marex_spark
from marex_spark.logging_config import (
    configure_logging,
    get_logger,
    get_verbosity_level,
    is_quiet_mode,
    is_verbose_mode,
    log_timing,
    set_normal_logging,
    set_quiet_mode,
    set_verbose_mode,
)


def teardown_module():
    set_normal_logging()


def test_get_logger_namespacing():
    assert get_logger().name == "marex_spark"
    assert get_logger("detect").name == "marex_spark.detect"
    assert get_logger("marex_spark.track").name == "marex_spark.track"


def test_verbosity_modes():
    set_verbose_mode()
    assert is_verbose_mode() and get_verbosity_level() == "verbose"
    assert logging.getLogger("marex_spark").level == logging.DEBUG
    set_quiet_mode()
    assert is_quiet_mode() and get_verbosity_level() == "quiet"
    assert logging.getLogger("marex_spark").level == logging.WARNING
    set_normal_logging()
    assert get_verbosity_level() == "normal"
    assert logging.getLogger("marex_spark").level == logging.INFO


def test_quiet_wins_over_verbose():
    configure_logging(verbose=True, quiet=True)
    assert is_quiet_mode()
    set_normal_logging()


def test_log_file(tmp_path):
    p = tmp_path / "marex.log"
    log = configure_logging(log_file=str(p))
    log.info("hello file")
    for h in log.handlers:
        h.flush()
    assert "hello file" in p.read_text()
    set_normal_logging()


def test_log_timing():
    # the package root has propagate=False (own handler), so capture
    # with an explicit handler rather than caplog
    records: list[logging.LogRecord] = []

    class _Cap(logging.Handler):
        def emit(self, record):
            records.append(record)

    log = get_logger("timing_test")
    h = _Cap(level=logging.INFO)
    log.addHandler(h)
    try:
        with log_timing(log, "doing work"):
            pass
    finally:
        log.removeHandler(h)
    msgs = [r.getMessage() for r in records]
    assert any("doing work..." in m for m in msgs)
    assert any("completed in" in m for m in msgs)


def test_lazy_top_level_exports():
    assert marex_spark.set_verbose_mode is set_verbose_mode
    assert marex_spark.get_logger is get_logger
