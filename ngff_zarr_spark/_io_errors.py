"""Shared error-classification helpers for source probing.

A file-stream source derives its schema from a driver-side batch read
of the live footers; when the directory does not exist yet (producer
has not started) or is empty (no footers), falling back to the
documented default layout lets the stream START ahead of its producer.
Every OTHER failure mode — corrupt footer, permission error, transient
FS fault on an existing directory — must surface, not silently swap in
a hardcoded schema that reads all-null columns (ADVICE r17).
"""

from __future__ import annotations


def is_missing_or_empty_source(exc: Exception) -> bool:
    """True iff a batch schema probe failed because the source path is
    missing or holds no footers to infer from. Matches Spark's error
    classes first (PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA on
    3.4+/4.x), with a message probe for older class-less
    AnalysisExceptions, plus plain FileNotFoundError from local-FS
    paths."""
    if isinstance(exc, FileNotFoundError):
        return True
    try:
        from pyspark.errors import AnalysisException
    except ImportError:  # pragma: no cover - pyspark<3.4 layout
        from pyspark.sql.utils import AnalysisException
    if not isinstance(exc, AnalysisException):
        return False
    probe = getattr(exc, "getCondition", None) or getattr(
        exc, "getErrorClass", None
    )
    cls = (probe() if probe is not None else None) or ""
    if cls in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
        return True
    msg = str(exc)
    return (
        "PATH_NOT_FOUND" in msg
        or "Path does not exist" in msg
        or "UNABLE_TO_INFER_SCHEMA" in msg
        or "Unable to infer schema" in msg
    )
