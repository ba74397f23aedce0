"""Structured Streaming wrappers (north-star; the reference has no streaming,
SURVEY.md §2.9).

The batch window operators in operators.timeseries define the semantics;
these wrappers run the same aggregations incrementally with watermarked
state. File-source based so they're testable against the parquet events
table with Trigger.AvailableNow (process-everything-then-stop).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema=None,
    fmt: str = "parquet",
) -> DataFrame:
    """File-based event stream. Schema is required by Structured Streaming;
    default to sampling it from the existing files."""
    if schema is None:
        schema = spark.read.format(fmt).load(path).schema
    return spark.readStream.format(fmt).schema(schema).load(path)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
    keys: Sequence[str] = ("event_type",),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the canonical stateful
    streaming op. Watermark bounds state: windows older than (max event time
    − watermark) are finalized and evicted, which is the streaming analogue
    of the batch tolerance bound in joins.asof_join."""
    aggs = list(aggs) or [F.count(F.lit(1)).alias("n_events")]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("__w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.unix_timestamp(F.col("__w.start")))
        .drop("__w")
    )


def run_available_now(stream_df: DataFrame, query_name: str = "events_agg"):
    """Run a streaming aggregation to completion over currently-available
    files into an in-memory sink; returns the terminated query. Use
    ``spark.sql(f"select * from {query_name}")`` to read results."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
