"""Partitioning control: fan narrow inputs out before CPU-dense stages.

A small parquet table arrives as ONE input split (`maxPartitionBytes`
sizing is byte-based), so a compute-dense row-local stage — signature
hashing, Pandas-UDF feature extraction, per-row vector math — runs on a
single core no matter how wide the cluster is. ``fan_out`` repartitions
such inputs up to the session's default parallelism.

Scale behavior: at 100 TB inputs already carry thousands of splits, the
guard sees `current >= target`, and this is a no-op — the repartition
only fires for the small-input/expensive-CPU corner where shuffling the
input is obviously cheaper than serializing the compute. (The check reads
the file listing; it launches no job.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to ``min_partitions`` (default: the
    session's default parallelism) iff the input has fewer partitions.

    The guard is tiered by cost: for file-backed plans with ≥ target
    files, each file is at least one split, so this is a no-op decided
    from the listing alone. Only narrow candidates (few/zero files) pay
    the exact ``.rdd.getNumPartitions()`` probe — that conversion forces
    plan analysis, which is fine for the small inputs it fires on but
    would be waste on every 100 TB scan."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:  # non-file-backed plan — fall through to exact probe
        pass
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
