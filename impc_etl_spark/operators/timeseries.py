"""Time-window aggregation over event tables.

The reference has NO streaming (SURVEY.md §2.9) — its 'time series' are
batch array explosions. These operators are the north-star extension for the
`events` table: tumbling/sliding/session windows as batch `window()` groupBy
(semantically identical to Structured Streaming's windowed aggregation; the
streaming wrappers in impc_etl_spark.streaming reuse them verbatim).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    start_alias: str = "window_start",
) -> DataFrame:
    """Fixed, non-overlapping windows: groupBy(window(ts, d), keys).agg(...).

    The window struct is flattened to an epoch-seconds start so results are
    engine-portable (time_bucket in ANSI SQL). Partial aggregation happens
    map-side; the shuffle key is (window, keys) — naturally balanced unless
    one key floods one window (salt then re-merge if so).
    """
    w = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(w.alias("__w"), *keys)
        .agg(*aggs)
        .withColumn(start_alias, F.unix_timestamp(F.col("__w.start")))
        .drop("__w")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    start_alias: str = "window_start",
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows —
    input amplification is the cost knob at scale (prefer tumbling +
    post-hoc rolling sums over windows when slide ≪ duration)."""
    w = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(w.alias("__w"), *keys)
        .agg(*aggs)
        .withColumn(start_alias, F.unix_timestamp(F.col("__w.start")))
        .drop("__w")
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Session windows (gap-based) in batch: F.session_window groupBy.

    Equivalent SQL (the classic islands pattern): lag + cumulative sum of
    gap-breaks — used as the oracle since DuckDB has no session_window.
    """
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("__w"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.unix_timestamp(F.col("__w.start")))
        .withColumn("session_end", F.unix_timestamp(F.col("__w.end")))
        .drop("__w")
    )
