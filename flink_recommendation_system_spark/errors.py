"""Shared Spark-exception classification helpers."""

from __future__ import annotations

from pyspark.sql.utils import AnalysisException


def is_path_not_found(e: AnalysisException) -> bool:
    """True iff ``e`` is Spark's missing-read-path error. Matches on the
    stable error class (Spark 3.4+ / 4.x) first; the message-substring
    check is only a fallback for builds that predate error classes, where
    phrasing (not locale — Spark error text is not localized) may vary."""
    cond = None
    getter = getattr(e, "getCondition", None) or getattr(
        e, "getErrorClass", None
    )
    if getter is not None:
        try:
            cond = getter()
        except Exception:  # pragma: no cover - defensive
            cond = None
    if cond is not None:
        return cond == "PATH_NOT_FOUND"
    msg = str(e)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg
