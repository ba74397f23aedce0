"""Cleaning operators: normalization maps, drops, blocklists, priority dedup.

The reference implements these with Python scalar UDFs (dict lookups —
shared/utils.py:94-101), `where` chains (experiment_cleaner.py:234-338), and
a self-join for source-priority dedup (specimen_cleaner.py:235-252). All are
re-expressed JVM-side:

- dict lookups  → ``F.create_map`` literal maps (whole-stage codegen, no
  Python round-trip),
- priority dedup → window ``row_number``,
- null/blocklist filters → plain Column predicates (pushed to the scan by
  Catalyst when possible).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from itertools import chain

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def map_normalize(
    df: DataFrame,
    column: str,
    mapping: dict[str, str],
    default_keep: bool = True,
) -> DataFrame:
    """Rewrite values of ``column`` via a literal map.

    Replaces the reference's ``udf(lambda x: MAP.get(x, x))`` pattern
    (shared/utils.py:94-101, experiment_cleaner.py:160-182) with a
    ``create_map`` lookup: stays in codegen, broadcast-free, null-safe.
    ``default_keep`` keeps unmapped values (the reference semantics).
    """
    if not mapping:
        return df
    lit_map = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    looked_up = lit_map.getItem(F.col(column))
    value = F.coalesce(looked_up, F.col(column)) if default_keep else looked_up
    return df.withColumn(column, value)


def drop_null_rows(df: DataFrame, required: Sequence[str]) -> DataFrame:
    """Drop rows where any required column is null (experiment_cleaner.py:291-338)."""
    pred = None
    for c in required:
        p = F.col(c).isNotNull()
        pred = p if pred is None else (pred & p)
    return df.where(pred) if pred is not None else df


def blocklist_filter(df: DataFrame, column: str, blocked: Iterable) -> DataFrame:
    """Drop rows whose ``column`` is in a constant blocklist
    (experiment_cleaner.py:234-263). Null values are kept (isin is
    null-rejecting, matching the reference's ``~isin`` + null survival)."""
    blocked = list(blocked)
    if not blocked:
        return df
    return df.where(~F.col(column).isin(blocked) | F.col(column).isNull())


def allowlist_filter(df: DataFrame, column: str, allowed: Iterable) -> DataFrame:
    """Keep only rows whose ``column`` is in a constant allowlist."""
    return df.where(F.col(column).isin(list(allowed)))


def conditional_rewrite(df: DataFrame, column: str, rules: Sequence[tuple[Column, Column]],
                        otherwise: Column | None = None) -> DataFrame:
    """Build a ``when/otherwise`` chain from (condition, value) rules —
    the P4 centre/zygosity normalization pattern
    (specimen_experiment_cross_ref.py:142-162)."""
    expr = None
    for cond, value in rules:
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    if expr is None:
        return df
    expr = expr.otherwise(otherwise if otherwise is not None else F.col(column))
    return df.withColumn(column, expr)


def dedup_by_priority(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep one row per key tuple, picking the first under ``order_by``.

    Replaces the reference's self-left-outer-join + null-or-priority filter
    (specimen_cleaner.py:235-252 — prefer non-3i source per specimen) with a
    single window pass: one shuffle on ``keys`` instead of a join's two.
    ``order_by`` must be a total order for determinism — include a
    tie-breaker column.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def regex_clean(df: DataFrame, column: str, pattern: str, replacement: str) -> DataFrame:
    """regexp_replace in place (specimen_cleaner.py:225-233 `MGI:` strip,
    HTML-entity unescape)."""
    return df.withColumn(column, F.regexp_replace(F.col(column), pattern, replacement))
