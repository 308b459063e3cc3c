"""Spark error classification shared across sources/sinks/jobs.

One home for the version-sensitive AnalysisException probing (Spark 4
renamed ``getErrorClass`` to ``getCondition``), so a future error-class
rename is a one-line fix instead of a hunt across call sites.
"""

from __future__ import annotations


def error_condition(exc: Exception) -> str:
    """The AnalysisException error class/condition, or ''."""
    get_cond = getattr(exc, "getCondition", None) or getattr(
        exc, "getErrorClass", lambda: None
    )
    return get_cond() or ""


def is_missing_path(exc: Exception) -> bool:
    """True when the exception means "no committed data at this path":
    the path doesn't exist, or it exists with no visible data files to
    infer a schema from (a crash mid-write leaves only ``_temporary/``,
    which readers filter out — UNABLE_TO_INFER_SCHEMA, not
    PATH_NOT_FOUND)."""
    cond = error_condition(exc)
    return (
        "PATH_NOT_FOUND" in cond
        or "UNABLE_TO_INFER_SCHEMA" in cond
        or "Path does not exist" in str(exc)
        or "Unable to infer schema" in str(exc)
    )


def is_missing_table(exc: Exception) -> bool:
    """True when a catalog read failed because the table doesn't exist
    (vs a transient failure that must propagate)."""
    cond = error_condition(exc)
    return "TABLE_OR_VIEW_NOT_FOUND" in cond or "TABLE_OR_VIEW_NOT_FOUND" in str(
        exc
    )
