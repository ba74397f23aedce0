"""Window operators (SURVEY.md §2.5/2.6): ranking, top-k, window aggregates.

The reference's only ordering constructs are windows (row_number/first-over
-order) and ``sort_array`` on collected arrays — there are no global sorts.
The engine keeps it that way: top-k is always per-group via window, never a
global ``orderBy().limit()`` unless the user asks for a presentation sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """row_number-over-window top-k (W5: control-image ranking, top
    phenodigm score per (disease, marker) — impc_api_mapper.py:2026-2166).
    One shuffle on ``keys``; with AQE, skewed groups split automatically.
    Include a unique tie-breaker in ``order_by`` for determinism."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def ranked_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    value: str,
    out: str,
) -> DataFrame:
    """``first(value) over (partition by keys order by ...)`` attached to every
    row (W2/W4 — modal category, representative thumbnail)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(out, F.first(value).over(w))


def ordered_window(keys: Sequence[str], order_by: Sequence[str | Column]):
    """Partitioned+ordered WindowSpec for analytic offsets (lag/lead/
    running aggs). Include a unique tie-breaker in ``order_by`` — an
    ambiguous order makes lag/lead nondeterministic across runs."""
    return Window.partitionBy(*keys).orderBy(*order_by)


def window_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    """Unordered partition-window aggregates attached per-row (W3/W6 —
    min ontology level per doc, publication counts per year). For multiple
    aggs over the same partitioning Spark evaluates them in one Window
    physical node — pass them together."""
    w = Window.partitionBy(*keys)
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def running_collect_set(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    value: str,
    out: str,
    sorted_out: bool = True,
) -> DataFrame:
    """W1 exact shape — ``collect_set(value)`` over an ORDERED window
    (cross_ref_helper.py:162-169): each row receives the distinct values
    seen up to its order position. The default frame of an ordered window
    is RANGE (unbounded preceding → current), so order-PEERS are included
    in each other's sets, exactly like the reference's metadata-item
    accumulation. ``sorted_out`` sort_arrays the set for deterministic
    output (collect_set order is otherwise partition-dependent).

    One shuffle on ``keys``; per-row set state is bounded by the group's
    distinct values, so memory follows group cardinality, not row count.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    c = F.collect_set(value).over(w)
    return df.withColumn(out, F.sort_array(c) if sorted_out else c)
