"""Typed exception surface (reference exceptions.py:11-295).

The reference raises a small hierarchy rooted at MarExError so callers
can catch validation vs configuration vs tracking failures separately;
this module mirrors that contract (names and category semantics, not
the implementation) with structured context carried on the exception.
"""

from __future__ import annotations


class MarexSparkError(Exception):
    """Base class (reference MarExError, exceptions.py:11): message plus
    optional structured ``details`` and remediation ``suggestions``."""

    def __init__(
        self,
        message: str,
        details: dict | None = None,
        suggestions: list[str] | None = None,
    ):
        self.details = details or {}
        self.suggestions = suggestions or []
        parts = [message]
        if self.details:
            parts.append(
                "details: " + ", ".join(f"{k}={v}" for k, v in self.details.items())
            )
        if self.suggestions:
            parts.append("try: " + "; ".join(self.suggestions))
        super().__init__(" | ".join(parts))


class DataValidationError(MarexSparkError):
    """Invalid input data — NaN audit failures, empty series, wrong
    dtypes (reference exceptions.py:84)."""


class CoordinateError(MarexSparkError):
    """Broken coordinate assumptions — unknown columns, unsortable or
    duplicated time axis, grid mismatches (reference exceptions.py:122)."""


class ConfigurationError(MarexSparkError):
    """Invalid parameter combinations or unknown method names
    (reference exceptions.py:180)."""


class ProcessingError(MarexSparkError):
    """A pipeline stage failed mid-computation (reference
    exceptions.py:151)."""


class DependencyError(MarexSparkError):
    """An optional dependency (xarray, codecs) is missing (reference
    exceptions.py:217)."""


class TrackingError(MarexSparkError):
    """Tracking-stage contract violations — missing geometry tables,
    non-boolean fields (reference exceptions.py:255)."""


class VisualisationError(MarexSparkError):
    """Rendering-layer failures — unknown colormap, bad frame geometry
    (reference exceptions.py:295)."""


def create_data_validation_error(
    message: str, data_info: dict | None = None, **kwargs
) -> DataValidationError:
    """Convenience constructor folding data context (type, shape, dtype)
    into ``details`` (reference exceptions.py:338-361)."""
    details = dict(kwargs.pop("details", {}) or {})
    if data_info:
        details.update(data_info)
    return DataValidationError(message, details=details, **kwargs)


def create_coordinate_error(
    message: str,
    coordinate_ranges: dict | None = None,
    detected_system: str | None = None,
    **kwargs,
) -> CoordinateError:
    """Convenience constructor folding coordinate ranges / detected
    system into ``details`` (reference exceptions.py:363-394)."""
    details = dict(kwargs.pop("details", {}) or {})
    if coordinate_ranges:
        details["coordinate_ranges"] = coordinate_ranges
    if detected_system:
        details["detected_system"] = detected_system
    return CoordinateError(message, details=details, **kwargs)


def create_processing_error(
    message: str, computation_info: dict | None = None, **kwargs
) -> ProcessingError:
    """Convenience constructor folding computation context (partition
    sizes, row counts) into ``details`` (reference exceptions.py:397-419)."""
    details = dict(kwargs.pop("details", {}) or {})
    if computation_info:
        details.update(computation_info)
    return ProcessingError(message, details=details, **kwargs)


def wrap_exception(
    original_exception: Exception,
    message: str | None = None,
    exception_type: type | None = None,
) -> MarexSparkError:
    """Wrap a generic exception in the typed hierarchy (reference
    exceptions.py:434-470): keeps the original as ``__cause__`` and in
    ``details``. Already-typed errors pass through unchanged."""
    if isinstance(original_exception, MarexSparkError):
        return original_exception
    cls = exception_type or ProcessingError
    msg = message or f"{type(original_exception).__name__}: {original_exception}"
    wrapped = cls(
        msg,
        details={"original_type": type(original_exception).__name__},
    )
    wrapped.__cause__ = original_exception
    return wrapped


# Reference-name alias: marEx users catch MarExError (exceptions.py:11).
MarExError = MarexSparkError
