"""Plan inspection + CI guards: catch scale regressions BEFORE the
cluster does.

A 100 TB pipeline dies in one of a few well-known ways — a join
silently degrades to a CartesianProduct when a key column is renamed,
a broadcast flips to a shuffle when a dimension grows past the
threshold, a filter stops reaching the parquet scan after a refactor.
All of them are visible in the plan long before execution.
``plan_report`` extracts the numbers the repo's PLANS.md audits read
by hand; ``assert_scalable`` turns them into a test/CI gate a
pipeline can run against its own DataFrames (zero execution cost —
the plan is analyzed, never run).

The parsers read Spark's own plan strings (``executedPlan`` /
formatted explain), which are a stable diagnostic surface — the same
one a human reads.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from pandance_spark.plans.mem import explain_str

__all__ = ["plan_report", "assert_scalable"]

_NODE_COUNTS = {
    "broadcast_hash_joins": "BroadcastHashJoin",
    "sort_merge_joins": "SortMergeJoin",
    "shuffled_hash_joins": "ShuffledHashJoin",
    "broadcast_nested_loop_joins": "BroadcastNestedLoopJoin",
    "cartesian_products": "CartesianProduct",
    "scans": "FileScan",
    "python_evals": "BatchEvalPython",
    "arrow_evals": "ArrowEvalPython",
}


def plan_report(df: DataFrame) -> dict:
    """Structural summary of a DataFrame's optimized physical plan.

    Returns a dict with node counts (exchanges, each join strategy,
    scans, Python-eval stages), ``wholestage_codegen_stages``, and the
    ``pushed_filters`` / ``partition_filters`` lists from every
    parquet scan — the exact facts a plan audit checks.  Pure plan
    analysis: nothing executes.

    ``wholestage_codegen_stages`` reads the ``*(n)`` stage markers,
    which an ADAPTIVE plan only carries once finalized (AQE hides
    them until first execution) — on an unexecuted AQE plan the count
    is 0, not "no codegen"; execute once (or check a non-adaptive
    sub-plan) before asserting on it.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    rep = {k: plan.count(pat) for k, pat in _NODE_COUNTS.items()}
    # "exchanges" counts SHUFFLES only: BroadcastExchange moves a
    # build side, ReusedExchange moves nothing — counting either would
    # fail a max_exchanges budget on plans that got BETTER (e.g. a
    # shuffle join flipping to broadcast)
    rep["exchanges"] = len(
        re.findall(r"(?<!Broadcast)(?<!Reused)Exchange ", plan)
    )
    rep["broadcast_exchanges"] = plan.count("BroadcastExchange")
    rep["reused_exchanges"] = plan.count("ReusedExchange")
    rep["wholestage_codegen_stages"] = len(
        set(re.findall(r"\*\((\d+)\)", plan))
    )
    fmt = explain_str(df, "formatted")
    rep["pushed_filters"] = [
        f.strip()
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", fmt)
        for f in m.split(",")
        if f.strip()
    ]
    rep["partition_filters"] = [
        f.strip()
        for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", fmt)
        for f in m.split(",")
        if f.strip()
    ]
    return rep


def assert_scalable(
    df: DataFrame,
    allow_cartesian: bool = False,
    allow_bnlj: bool = None,
    allow_python: bool = True,
    max_exchanges: int = None,
) -> dict:
    """CI gate: raise ``AssertionError`` if the plan contains a scale
    hazard; returns the :func:`plan_report` on success.

    - ``CartesianProduct`` and ``BroadcastNestedLoopJoin`` are both
      rows x rows COMPUTE at scale (a BNLJ's condition bounds the
      output, not the comparisons) — fail unless allowed.
      ``allow_cartesian`` waives both (theta joins own that cost
      knowingly); ``allow_bnlj`` waives ONLY the BNLJ, so a
      deliberate small-broadcast non-equi join passes while a real
      CartesianProduct regression still fails.
    - ``BatchEvalPython`` is the row-at-a-time Python path (never
      acceptable in this codebase's hot paths); Arrow-batched stages
      pass unless ``allow_python=False``.
    - ``max_exchanges`` caps SHUFFLE count (broadcast/reused
      exchanges excluded) — pin it to today's plan and a refactor
      that adds an accidental shuffle fails the test.
    """
    rep = plan_report(df)
    problems = []
    if allow_bnlj is None:
        allow_bnlj = allow_cartesian
    if not allow_cartesian and rep["cartesian_products"]:
        problems.append(
            f"cartesian join in plan "
            f"(CartesianProduct={rep['cartesian_products']})"
        )
    if not allow_bnlj and rep["broadcast_nested_loop_joins"]:
        problems.append(
            f"cartesian-class join in plan "
            f"(BroadcastNestedLoopJoin={rep['broadcast_nested_loop_joins']})"
        )
    if rep["python_evals"]:
        problems.append(
            f"row-at-a-time Python eval in plan "
            f"(BatchEvalPython={rep['python_evals']})"
        )
    if not allow_python and rep["arrow_evals"]:
        problems.append(
            f"Python stage in plan (ArrowEvalPython={rep['arrow_evals']})"
        )
    if max_exchanges is not None and rep["exchanges"] > max_exchanges:
        problems.append(
            f"{rep['exchanges']} exchanges > max_exchanges={max_exchanges}"
        )
    if problems:
        raise AssertionError("; ".join(problems))
    return rep
