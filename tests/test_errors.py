"""Typed exception surface (reference tests/test_error_handling.py
coverage of exceptions.py:11-295): hierarchy, structured context in the
message, and the operator preconditions that raise each category."""

from __future__ import annotations

import pytest

from marex_spark.exceptions import (
    ConfigurationError,
    DataValidationError,
    MarexSparkError,
    TrackingError,
)


def test_hierarchy_and_message_structure():
    e = DataValidationError(
        "bad data", details={"cells": 3}, suggestions=["mask them"]
    )
    assert isinstance(e, MarexSparkError)
    assert "bad data" in str(e)
    assert "cells=3" in str(e)
    assert "mask them" in str(e)
    assert e.details == {"cells": 3}


def test_audit_raises_data_validation_with_context(spark):
    from marex_spark.operators.detect import audit_series

    df = spark.createDataFrame(
        [(1, 1, float("nan")), (2, 2, 5.0)], "y int, x int, value double"
    )
    with pytest.raises(DataValidationError) as ei:
        audit_series(df)
    assert "worst" in ei.value.details
    assert ei.value.suggestions


def test_unknown_method_is_configuration_error(spark):
    from marex_spark.operators.detect import preprocess_data

    df = spark.createDataFrame([(1, 1, 5.0)], "y int, x int, value double")
    with pytest.raises(ConfigurationError) as ei:
        preprocess_data(df, method_anomaly="bogus")
    assert ei.value.details["got"] == "bogus"


def test_unstructured_merge_needs_cell_geo(spark):
    from marex_spark.operators.track import track_events_unstructured

    ext = spark.createDataFrame(
        [("2020-01-01", 1, True)], "time string, cell long, extreme boolean"
    ).selectExpr("CAST(time AS timestamp) time", "cell", "extreme")
    edges = spark.createDataFrame([(1, 2)], "cell long, nbr long")
    with pytest.raises(TrackingError, match="cell_geo"):
        track_events_unstructured(ext, edges, allow_merging=True)


class TestDependencyGates:
    """Optional-dependency surface (reference _dependencies.py:7-243)."""

    def test_has_dependency(self):
        from marex_spark._dependencies import has_dependency

        assert has_dependency("numpy")
        assert not has_dependency("definitely_not_a_module_xyz")

    def test_require_dependencies_raises_typed(self):
        import pytest

        from marex_spark._dependencies import require_dependencies
        from marex_spark.exceptions import DependencyError

        require_dependencies(["numpy", "pandas"], "core math")  # no raise
        with pytest.raises(DependencyError, match="no_such_mod"):
            require_dependencies(["no_such_mod"], "imaginary feature")

    def test_profile_and_status(self, capsys):
        from marex_spark._dependencies import (
            get_installation_profile,
            print_dependency_status,
        )

        assert get_installation_profile() in ("minimal", "io", "full")
        print_dependency_status()
        out = capsys.readouterr().out
        assert "Current Profile:" in out
        assert "duckdb" in out


class TestConvenienceConstructors:
    """Reference exceptions.py:338-419."""

    def test_data_validation(self):
        from marex_spark.exceptions import (
            DataValidationError,
            create_data_validation_error,
        )

        e = create_data_validation_error(
            "bad frame", data_info={"rows": 0, "dtype": "float"}
        )
        assert isinstance(e, DataValidationError)
        assert e.details["rows"] == 0
        assert "bad frame" in str(e)

    def test_coordinate(self):
        from marex_spark.exceptions import CoordinateError, create_coordinate_error

        e = create_coordinate_error(
            "lon out of range",
            coordinate_ranges={"lon": (-180, 180)},
            detected_system="degrees_-180_180",
        )
        assert isinstance(e, CoordinateError)
        assert e.details["detected_system"] == "degrees_-180_180"

    def test_processing(self):
        from marex_spark.exceptions import ProcessingError, create_processing_error

        e = create_processing_error(
            "stage died", computation_info={"partitions": 32},
            suggestions=["raise shuffle partitions"],
        )
        assert isinstance(e, ProcessingError)
        assert e.details["partitions"] == 32
        assert "raise shuffle partitions" in str(e)

    def test_visualisation_error_in_hierarchy(self):
        from marex_spark.exceptions import MarexSparkError, VisualisationError

        assert issubclass(VisualisationError, MarexSparkError)


class TestHelperConfig:
    """configure_spark / sizing rules (reference helper.py:90-639)."""

    def test_conf_shape(self, tmp_path):
        from marex_spark.helper import configure_spark

        conf = configure_spark(
            scratch_dir=str(tmp_path), workers=100,
            memory_per_worker_gb=32, dataset_bytes=15 * 1024**4,
        )
        assert conf["spark.local.dir"] == str(tmp_path)
        assert conf["spark.executor.instances"] == "100"
        assert conf["spark.executor.memory"] == "28g"  # 10% headroom
        # 15 TB / 128 MB = ~122k partitions
        assert int(conf["spark.sql.shuffle.partitions"]) == 15 * 1024**4 // (128 * 1024**2)
        assert conf["spark.sql.adaptive.enabled"] == "true"

    def test_overrides_win(self):
        from marex_spark.helper import configure_spark

        conf = configure_spark(config={"spark.sql.adaptive.enabled": "false"})
        assert conf["spark.sql.adaptive.enabled"] == "false"

    def test_validation(self):
        import pytest

        from marex_spark.exceptions import ConfigurationError
        from marex_spark.helper import configure_spark

        with pytest.raises(ConfigurationError):
            configure_spark(workers=0)
        with pytest.raises(ConfigurationError):
            configure_spark(memory_per_worker_gb=-1)

    def test_recommended_partitions_floor(self):
        from marex_spark.helper import recommended_shuffle_partitions

        assert recommended_shuffle_partitions(0) == 32
        assert recommended_shuffle_partitions(1024) == 32
        assert recommended_shuffle_partitions(64 * 1024**3) == 512
