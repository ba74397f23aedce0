"""Plan inspection — programmatic access to the physical-plan facts that
matter at scale (what the guardrail tests assert, exposed as an API).

``explain_summary(df)`` answers, without reading walls of explain text:
how many scans/exchanges, which filters reached the parquet reader, and
whether any red-flag operators (cartesian product, row-at-a-time Python
UDF) are present. Use it in notebooks and CI alike::

    s = explain_summary(df)
    assert s["cartesian_products"] == 0 and s["exchanges"] <= 2
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().toString()


def explain_summary(df: DataFrame) -> dict:
    """Counts + pushed-filter list from the executed/optimized plan."""
    text = _plan_text(df)
    pushed: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            pushed.extend(p.strip() for p in m.group(1).split(","))
    return {
        "scans": len(re.findall(r"FileScan|Scan parquet", text)),
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", text)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", text)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", text)),
        "nested_loop_joins": len(re.findall(r"BroadcastNestedLoopJoin", text)),
        "cartesian_products": len(re.findall(r"CartesianProduct", text)),
        "generates": len(re.findall(r"Generate ", text)),
        "python_row_udfs": len(re.findall(r"BatchEvalPython", text)),
        "python_arrow_stages": len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", text)),
        "pushed_filters": pushed,
    }
