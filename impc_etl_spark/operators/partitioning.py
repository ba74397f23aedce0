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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def advisory_mb(spark) -> int:
    """The session's AQE advisory partition size in MB (floor 1) — the
    per-reducer byte target every derived-width call sites against.
    Centralized because five operators were carrying copy-pasted
    extraction blocks (r9 review)."""
    try:
        raw = int(spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(64 << 20)))
    except Exception:
        raw = 64 << 20
    return max(1, raw >> 20)


def shuffle_partitions_for(
    df: DataFrame,
    target_mb: int = 128,
    expansion: float = 1.0,
    min_partitions: int | None = None,
    max_partitions: int = 200_000,
) -> int:
    """Derive a shuffle-partition count from the MEASURED input bytes —
    the engine-computed replacement for hand-tuned constants (the
    reference hard-codes ``repartition(10000)`` per job,
    jobs/load/solr/stats_results_mapper.py:158).

    Reads the plan's file listing (no job launched): partition count =
    input bytes × ``expansion`` / ``target_mb``, floored at the session's
    default parallelism (or ``min_partitions``). ``expansion`` scales for
    operators whose shuffle is bigger than their input (an explode of
    k-token windows multiplies bytes ~k×). For non-file-backed plans the
    listing is empty and the floor is returned — AQE's
    initialPartitionNum + advisory coalesce (session.py) covers those.

    Sessions created by ``get_spark`` rarely need this: AQE starts wide
    and coalesces from measured map output. Use it for explicit
    ``repartition(n, cols)`` calls, which AQE must respect as-is.
    """
    sc = df.sparkSession.sparkContext
    floor = min_partitions or sc.defaultParallelism
    try:
        # Catalyst's size estimate: file-listing-based for scans (works on
        # any filesystem scheme), no job launched.
        total = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        total = 0
    if total > (1 << 50):
        # non-file plans (LogicalRDD from createDataFrame, some RDD-backed
        # scans) report spark.sql.defaultSizeInBytes = Long.MaxValue for
        # "unknown" — deriving from that would build a max_partitions-wide
        # shuffle on tiny data; treat anything over 1 PiB as unknown and
        # fall back to the floor.
        total = 0
    derived = int(total * float(expansion) // (target_mb * 1024 * 1024)) + 1
    width = max(floor, min(derived, max_partitions))
    # Snap widths landing JUST past the bypass-merge boundary back onto
    # it: at threshold+1 the map side switches from the bypass writer
    # (one buffered stream per reducer, no sort) to the sort writer,
    # which spills its ENTIRE output once — a cliff, not a slope
    # (measured: a 265-wide exchange spilled byte-for-byte its 1.25 GB
    # write; 200-wide bypassed with zero spill). Within (t, 2t] the snap
    # costs < 2× reducer size — cheaper than a full map-side sort pass —
    # while widths beyond 2t keep the sort writer, whose sequential
    # spill is the designed behavior for genuinely wide exchanges
    # (raising the threshold itself session-wide was a measured 2.5×
    # steady-state mistake; see session.py).
    try:
        t = int(df.sparkSession.conf.get(
            "spark.shuffle.sort.bypassMergeThreshold", "200"))
    except Exception:
        t = 200
    if floor <= t < width <= 2 * t:
        width = t
    return width


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


def ranged_prefix_sums(
    df: DataFrame,
    order_by: Sequence[str],
    sum_cols: Sequence[str],
    num_partitions: int | None = None,
    prefix: str = "__cum_",
) -> DataFrame:
    """EXCLUSIVE running totals of ``sum_cols`` in global ``order_by``
    order WITHOUT a single-partition window — the scalable prefix-sum
    every order-statistics operator needs (global ranks, ECDFs, rank-sum
    tests, weighted quantiles). ``Window.orderBy(...)`` with no
    PARTITION BY funnels the whole table through ONE task; this is the
    classic two-phase alternative, declarative end to end:

    1. range-repartition + sort on ``order_by`` (the same first phase a
       global sort pays), stamp ``spark_partition_id()`` and freeze it
       with ``localCheckpoint`` (pids must not float across recompute —
       the assign_global_ids precedent; pass a reliable checkpoint dir
       upstream for multi-hour cluster jobs);
    2. LOCAL exclusive cumsums per partition (window PARTITIONED by pid
       — never global);
    3. per-partition column totals aggregate to a numPartitions-row
       table whose own exclusive prefix-sum window runs on that tiny
       table only, broadcast-joined back as offsets.

    ``order_by`` must be a unique key (ties would make the running total
    nondeterministic). Output = input columns + ``<prefix><col>`` for
    each of ``sum_cols``, exclusive (row's own value NOT included).
    """
    from pyspark.sql import Window

    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_part, *[F.col(c) for c in order_by])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = ranged
    for c in sum_cols:
        out = out.withColumn(
            f"{prefix}{c}", F.coalesce(F.sum(c).over(local_w), F.lit(0))
        )
    totals = ranged.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__tot_{c}") for c in sum_cols]
    )
    off_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__tot_{c}").over(off_w), F.lit(0)).alias(
                f"__off_{c}"
            )
            for c in sum_cols
        ],
    )
    out = out.join(F.broadcast(offsets), "__pid")
    for c in sum_cols:
        out = out.withColumn(
            f"{prefix}{c}", F.col(f"{prefix}{c}") + F.col(f"__off_{c}")
        ).drop(f"__off_{c}")
    return out.drop("__pid")


def z_order_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out: str = "z_key",
) -> DataFrame:
    """Morton (Z-order) interleave key over numeric columns — the
    multi-dimensional clustering key behind Delta/Iceberg's OPTIMIZE
    ZORDER: sorting by the interleaved bits gives EVERY participating
    column locality within a file/row-group, so parquet min/max footer
    stats prune scans filtered on ANY of the dimensions (a plain
    lexicographic sort only prunes its leading column).

    Two steps, both cheap: (1) one tiny aggregate computes per-column
    min/max, broadcast back (the same 1-row pattern as value_histogram);
    (2) a row-local projection scales each value to a ``bits``-bit rank
    and interleaves with shift/mask Column algebra — whole-stage codegen,
    zero shuffle. ``bits``·len(cols) must fit 63 bits. Constant columns
    scale to 0. The bit interleave is integer-exact, so an engine-
    independent oracle can replay it.
    """
    ncols = len(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * ncols > 63:
        raise ValueError("bits × len(cols) must fit a signed 64-bit key")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs)
    scale_max = (1 << bits) - 1
    with_bounds = df.crossJoin(F.broadcast(bounds))
    scaled = {}
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        span = (hi - lo).cast("double")
        scaled[c] = F.when(
            span > 0,
            F.floor((F.col(c) - lo).cast("double") / span * scale_max),
        ).otherwise(F.lit(0)).cast("long")
    def interleave() -> Column:
        z = F.lit(0).cast("long")
        for i in range(bits):
            for j, c in enumerate(cols):
                bit = F.shiftright(scaled[c], i).bitwiseAND(F.lit(1))
                z = z + F.shiftleft(bit, i * ncols + j)
        return z
    return with_bounds.withColumn(out, interleave()).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )
