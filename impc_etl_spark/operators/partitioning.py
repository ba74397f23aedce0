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


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Cut the lineage and materialize ``df`` once so multiple consumers
    (or iteration rounds) don't re-execute its plan — the in-plan
    equivalent of a pipeline runner's per-stage parquet.

    ``checkpoint_dir=None`` uses ``localCheckpoint`` (executor-local
    blocks: fast, but recomputation is impossible if an executor dies —
    the job fails). Passing a directory (HDFS/S3 on a cluster) switches to
    RELIABLE ``checkpoint()``: the 100 TB setting where losing an executor
    mid-iteration must not kill a multi-hour job."""
    if checkpoint_dir is not None:
        df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def assign_global_ids(
    df: DataFrame,
    order_by: list[str],
    out: str = "global_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense consecutive ids ``0..N-1`` in ``order_by`` order WITHOUT a
    global single-partition sort — the scalable replacement for
    ``zipWithIndex``/``row_number() OVER (ORDER BY ...)`` that training
    pipelines need for stable sample indexing and shard assignment.
    ``order_by`` must be a unique key (document it per call site): ties
    would make the assignment nondeterministic on any engine.

    Plan: range-repartition + sort on the key (the one unavoidable
    shuffle — identical to what a global sort would pay in its first
    phase); per-partition LOCAL ranks from an Arrow-batched
    ``mapInPandas`` that just counts rows per partition (no second
    shuffle, no pickled row loop); per-partition row counts aggregate to
    a numPartitions-row table whose exclusive prefix-sum window runs on
    that tiny table only; broadcast-join the offsets back on partition
    id. Nothing global ever sits on one task except the numPartitions-row
    cumsum.
    """
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(
        n_part, *[F.col(c) for c in order_by]
    ).sortWithinPartitions(*order_by)
    # a FRESH StructType — StructType.add would mutate the frame's cached
    # schema object and corrupt df.columns
    schema = StructType(
        list(ranged.schema.fields)
        + [StructField("__pid", IntegerType()), StructField("__lrank", LongType())]
    )

    def local_ranks(batches):
        pid = None
        seen = 0
        for pdf in batches:
            if pid is None:
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
            pdf = pdf.copy()
            pdf["__pid"] = pid
            pdf["__lrank"] = pd.RangeIndex(seen, seen + len(pdf))
            seen += len(pdf)
            yield pdf

    # checkpoint AFTER the rank pass: the shuffle+sort+Python stage runs
    # once, and both consumers (counts, final join) read the materialized
    # result (reliable ``checkpoint`` on a cluster)
    with_ranks = ranged.mapInPandas(local_ranks, schema=schema).localCheckpoint()
    counts = with_ranks.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(w), F.lit(0)).alias("__off")
    )
    return (
        with_ranks.join(F.broadcast(offsets), "__pid")
        .withColumn(out, F.col("__off") + F.col("__lrank"))
        .drop("__pid", "__lrank", "__off")
    )
