"""SparkSession factory with scale-oriented defaults.

The reference pipeline (mpi2/impc-etl, luigi.cfg.template_example [spark])
tunes executors/overhead per-task by hand and never enables AQE (Spark
3.0.2-era). Here every session gets adaptive execution, skew-join handling,
and Arrow transfer on by default — the settings a 1000-executor/100 TB run
needs are the same knobs, only sized differently by `profile`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for local[$SPARK_GRAFT_CPUS] test runs; on a real cluster the
# same keys scale (shuffle.partitions ≈ 2-3× total cores, maxPartitionBytes
# 128-256m so scan tasks stay balanced at 100 TB).
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: vectorized reader + pushdown are on by default; keep
    # them pinned so a config drift can't silently disable them.
    # ns-precision parquet timestamps (e.g. event streams) surface as long
    # nanos; loaders convert explicitly (see queries._events) — Spark has no
    # native ns timestamp type.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "impc_etl_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so tests and bench share sizing with the driver harness.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the star-schema tables as temp views — the SQL front door.

    After this, every engine capability is reachable from ``spark.sql``
    (SURVEY.md §4: no custom planner needed — Spark SQL over views IS the
    query API).
    """
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read the driver's parquet tables from ``sf_dir``; returns dict.

    Tables: region nation customer supplier part orders lineitem events
    documents embeddings (see TESTDATA.md).
    """
    if not names:
        names = (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
