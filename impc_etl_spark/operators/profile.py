"""Data profiling — per-column QA stats in one pass.

Release pipelines live or die on input QA (the reference's answer is the
release-diff report plus scattered null-drop counts). ``profile`` computes
per-column row/null/distinct counts over any frame in a single aggregation
job and returns them as rows — cheap enough to run per DAG stage and
store next to the stage parquet.

Scale: one aggregation, no shuffle of data rows (global agg = partials +
single merge). ``count_distinct`` over many columns multiplies the Expand
factor — pass ``approx=True`` at 100 TB to use HLL sketches instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct)."""
    cols = list(columns) if columns else df.columns
    distinct_fn = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(distinct_fn(F.col(c)).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("n_distinct"),
        )
        for c in cols
    ])
    return row.select(F.explode(entries).alias("p")).select("p.*")
