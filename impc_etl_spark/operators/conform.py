"""Schema contracts: conform DataFrames to fixed column contracts.

Reference behavior: the IMPC observation mapper pads every sub-frame with
typed null columns to a fixed 66-column contract and aligns unioned frames
by appending ``lit(None)`` columns then selecting in a canonical order
(reference: jobs/load/observation_mapper.py:419-424 ``unify_schema``;
jobs/load/solr/stats_results_mapper.py:241-308 union alignment loops).

Here that copy-pasted loop becomes two first-class operators:
``conform_to_schema`` and ``union_conform``. Both are pure column
projections — zero shuffle, fully codegen'd, safe at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructField, StructType


def conform_to_schema(df: DataFrame, contract: StructType, strict_types: bool = False) -> DataFrame:
    """Project ``df`` onto ``contract``: missing columns become typed nulls,
    extra columns are dropped, column order matches the contract.

    With ``strict_types=True`` existing columns are also cast to the
    contract's type (otherwise their current type is kept). Casts are
    ``try_cast``: a malformed value conforms to NULL instead of failing
    the job under ANSI mode — a schema CONTRACT must accept dirty input
    (the cleaning layer decides what to drop).
    """
    existing = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for field in contract.fields:
        if field.name in existing:
            c = F.col(field.name)
            if strict_types and existing[field.name] != field.dataType:
                c = c.try_cast(field.dataType)
            cols.append(c.alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def contract(*fields: tuple[str, DataType]) -> StructType:
    """Build a StructType contract from (name, type) pairs."""
    return StructType([StructField(n, t, True) for n, t in fields])


def union_conform(frames: Sequence[DataFrame]) -> DataFrame:
    """Union frames by column NAME, tolerating missing columns.

    Replaces the reference's positional ``union`` after manual
    add-null-column loops (stats_results_mapper.py:241-308) with
    ``unionByName(allowMissingColumns=True)`` — immune to column-order
    drift, and Catalyst still plans it as a single union node.
    """
    if not frames:
        raise ValueError("union_conform needs at least one frame")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Incremental release merge: rows from ``updates`` replace same-key
    rows in ``existing``; everything else is kept (MERGE/upsert semantics
    on plain parquet stores).

    unionByName + one priority-dedup window on the keys — a single
    shuffle. Pair with the DAG runner to publish a new release on top of
    the previous one without rebuilding the store. Assumes ``updates`` is
    key-unique (dedupe it first if not).
    """
    from pyspark.sql import Window

    # schema-drift guard: a winning update row null-fills any column it
    # is missing (allowMissingColumns), silently WIPING stored values —
    # an incremental batch missing a column must fail loudly instead
    missing = set(existing.columns) - set(updates.columns)
    if missing:
        raise ValueError(
            "merge_upsert: updates frame is missing store columns "
            f"{sorted(missing)} — a merged key would silently null them; "
            "project the updates to the full store schema first"
        )
    tagged = updates.withColumn("__prio", F.lit(0)).unionByName(
        existing.withColumn("__prio", F.lit(1)), allowMissingColumns=True
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__prio"))
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__prio", "__rn")
    )


def select_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Single-select column mapping: ``{target: source_expr}``.

    Replaces the reference's per-column ``withColumn`` loops over dict
    contracts (observation_mapper.py:235-417, EXPERIMENT_TO_OBSERVATION_MAP)
    — one projection node instead of hundreds of chained plan nodes.
    Values are SQL expressions, so ``{"id": "specimen_id", "src": "'impc'"}``
    both work.
    """
    return df.select(*[F.expr(src).alias(dst) for dst, src in mapping.items()])
