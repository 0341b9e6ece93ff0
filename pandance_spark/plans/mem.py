"""Plan-level utilities.

The reference ships ``_estimate_mem_cost_cartesian``
(``pandance/pandance.py:894-917``) — an advisory estimate of the memory
a cross join would need, used by its ``_mem_check`` guard
(``pandance/pandance.py:879-891``).  Spark spills to disk and AQE
re-plans at runtime, so no guard is needed; we keep an advisory
estimator for API parity, computed from Catalyst plan statistics
(no job is triggered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["estimate_mem_cost_cartesian", "explain_str"]


def _stats(df: DataFrame):
    qe = df._jdf.queryExecution()
    return qe.optimizedPlan().stats()


def estimate_mem_cost_cartesian(a: DataFrame, b: DataFrame) -> int:
    """Estimated MiB held by the cross join of ``a`` and ``b``.

    Parity shim for reference ``_estimate_mem_cost_cartesian``
    (``pandance/pandance.py:894-917``).  Uses Catalyst size/row-count
    estimates; purely advisory (Spark spills rather than OOMs on big
    cross joins).
    """
    try:
        sa, sb = _stats(a), _stats(b)
        ra = sa.rowCount().isDefined() and int(sa.rowCount().get()) or None
        rb = sb.rowCount().isDefined() and int(sb.rowCount().get()) or None
        bytes_a, bytes_b = int(sa.sizeInBytes()), int(sb.sizeInBytes())
        if ra and rb and ra > 0 and rb > 0:
            row_bytes = bytes_a / ra + bytes_b / rb
            total = ra * rb * row_bytes
        else:
            # fall back to size product scaled by a nominal 100-byte row
            total = (bytes_a / 100.0) * (bytes_b / 100.0) * 100.0
        return int(total // (1024 * 1024))
    except Exception:
        return -1


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Return ``df.explain(mode)`` output as a string (for tests/logs)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )
