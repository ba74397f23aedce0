"""Surrogate key minting.

Reference: ``md5(concat(*cols))`` with explicit null sentinels
(experiment_cleaner.py:340-384, specimen_cleaner.py:254-277,
stats_results_mapper.py:789-811 ``doc_id``), plus
``monotonically_increasing_id()`` and ``expr("uuid()")``.

md5-of-concat is deterministic and distributed — the right call at 100 TB
(no global sequence). The null sentinel must be explicit and stable or keys
silently collide/shift between runs; the reference uses both ``""`` and
``"NA"`` in different jobs, so the sentinel is a parameter here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surrogate_key(
    df: DataFrame,
    out: str,
    cols: Sequence[str],
    null_sentinel: str = "",
    sep: str | None = None,
) -> DataFrame:
    """Add ``out`` = md5 over ``cols`` in the given order.

    ``sep`` (if set) joins parts with a delimiter so ("ab","c") and
    ("a","bc") can't collide — an improvement over the reference's raw
    ``concat`` which has that ambiguity; leave ``sep=None`` for
    reference-faithful concatenation.
    """
    parts: list[Column] = [
        F.coalesce(F.col(c).cast("string"), F.lit(null_sentinel)) for c in cols
    ]
    joined = F.concat_ws(sep, *parts) if sep is not None else F.concat(*parts)
    return df.withColumn(out, F.md5(joined))


def position_key(df: DataFrame, out: str, parent_key: str, family: str, pos_col: str) -> DataFrame:
    """Observation-id minting: md5(parent ‖ family ‖ position) — the
    per-exploded-parameter id scheme (observation_mapper.py:1026-1082)."""
    return df.withColumn(
        out,
        F.md5(F.concat_ws("#", F.col(parent_key), F.lit(family), F.col(pos_col).cast("string"))),
    )


def uuid_fill(df: DataFrame, column: str = "id") -> DataFrame:
    """Fill missing ids with uuid() (workflow/load.py:114-117). Nondeterministic
    by construction — use only at sink boundaries, never for join keys."""
    if column in df.columns:
        return df.withColumn(column, F.coalesce(F.col(column), F.expr("uuid()")))
    return df.withColumn(column, F.expr("uuid()"))
