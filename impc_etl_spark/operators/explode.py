"""Nested-data explosion (SURVEY.md §2.1 S2, §3 entry point 2).

The reference's core move: nested entity arrays (experiment/line/mouse/
embryo; simpleParameter/seriesParameter/...) explode to rows, keeping
parent-level columns and minting a position-derived id
(xml_extraction_helper.py:84-108; observation_mapper.py:1026-1082).

``posexplode_outer`` keeps empty/null arrays as a null row (parent survives),
matching the reference's explode_outer usage; position feeds the surrogate
key so ids are stable under re-runs — no monotonically_increasing_id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from impc_etl_spark.operators.keys import position_key


def explode_entities(
    df: DataFrame,
    entity_col: str,
    keep_cols: Sequence[str],
    type_tag: str | None = None,
    tag_col: str = "_type",
) -> DataFrame:
    """Select one entity array column, drop rows without it, explode to one
    row per entity, flatten the struct, and tag the entity type."""
    out = (
        df.where(F.col(entity_col).isNotNull())
        .select(*keep_cols, F.explode(entity_col).alias("__e"))
        .select(*keep_cols, "__e.*")
    )
    if type_tag is not None:
        out = out.withColumn(tag_col, F.lit(type_tag))
    return out


def explode_params(
    df: DataFrame,
    array_col: str,
    parent_key: str,
    keep_cols: Sequence[str],
    id_col: str = "observation_id",
    pos_col: str = "_pos",
    value_col: str | None = None,
) -> DataFrame:
    """posexplode a parameter array, mint a stable per-element id.

    id = md5(parent_key ‖ array_col ‖ position) — the observation-id scheme.
    ``value_col`` renames the exploded element (defaults to the array name).
    """
    value_col = value_col or array_col
    out = df.select(
        parent_key,
        *[c for c in keep_cols if c != parent_key],
        F.posexplode_outer(array_col).alias(pos_col, value_col),
    ).where(F.col(value_col).isNotNull())
    return position_key(out, id_col, parent_key, array_col, pos_col)
