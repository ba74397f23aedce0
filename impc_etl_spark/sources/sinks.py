"""Sinks (S9-S15): parquet boundaries, sized JSON marts, single-file CSV/text,
JDBC/Mongo wrappers.

The reference hand-picks ``repartition(10000/1000/500/100/1)`` per sink
(stats_results_mapper.py:158; impc_api_mapper.py:1303, 2081). Here output
sizing is a single helper driven by a target file count or AQE coalescing —
the number is a parameter, not folklore scattered across jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _sized(df: DataFrame, num_files: int | None) -> DataFrame:
    if num_files is None:
        return df  # let AQE coalesce post-shuffle partitions
    if num_files == 1:
        return df.coalesce(1)
    return df.repartition(num_files)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None,
                  num_files: int | None = None,
                  max_records_per_file: int | None = None) -> None:
    """Parquet sink. Sizing levers, in preference order at scale:
    ``max_records_per_file`` (rotates files inside each task — caps file
    size without any extra shuffle), AQE coalescing (num_files=None), and
    only then an explicit ``num_files`` repartition."""
    w = _sized(df, num_files).write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_sized_json(df: DataFrame, path: str, num_files: int,
                     ignore_null_fields: bool = False, mode: str = "overwrite") -> None:
    """JSON mart sink (S10) — explicit file-count sizing, nulls kept when the
    downstream consumer needs stable document shapes."""
    (_sized(df, num_files).write.mode(mode)
     .option("ignoreNullFields", str(ignore_null_fields).lower())
     .json(path))


def write_single_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single-file CSV report (S14 — dr_diff release report)."""
    df.coalesce(1).write.mode(mode).option("header", True).csv(path)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Compact a small-file parquet dataset into ~target-sized files.

    The 100 TB hygiene job: streaming/incremental writers leave thousands
    of KB-sized files that wreck scan planning (one task per file, driver
    listing cost). File count = ceil(total_bytes / target); returns it.
    Run per partition directory for partitioned stores.
    """
    import math

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def write_single_text(df: DataFrame, path: str, column: str, mode: str = "overwrite") -> None:
    """One text file from one string column (S15 — the mp_chooser JSON-blob
    sink, jobs/load/mp_chooser_mapper.py:138-143)."""
    df.select(column).coalesce(1).write.mode(mode).format("text").save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    Two facts bucketed on the same key with the same bucket count join
    WITHOUT a shuffle (and without even a sort when ``sort_cols`` match the
    join key) — this is how repeated 100 TB fact-fact joins amortize their
    exchange: pay the clustering once at write time, never again at read.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Range-partition + sort-within-partitions parquet sink — the
    data-skipping layout for append-heavy 100 TB tables.

    ``repartitionByRange`` makes the files globally disjoint on
    ``range_cols`` and ``sortWithinPartitions`` clusters rows inside each
    file, so parquet row-group min/max statistics become tight: a later
    ``WHERE key = x`` or ``BETWEEN`` scan prunes whole files/row-groups at
    the footer, never touching their bytes. This is the poor-man's
    Z-order — one extra shuffle at write time buys every future scan a
    pruned read.
    """
    out = (df.repartitionByRange(num_files, *range_cols) if num_files
           else df.repartitionByRange(*range_cols))
    out = out.sortWithinPartitions(*range_cols)
    w = out.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None,
              num_files: int | None = None) -> None:
    """ORC sink (native, same predicate-pushdown + column-pruning contract
    as parquet; useful when downstream consumers are Hive/Trino-side)."""
    w = _sized(df, num_files).write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    """ORC scan — pushdown/pruning verified in tests like the parquet path."""
    return spark.read.orc(path)


#: Solr schema numeric type names that the loader casts to double
#: (workflow/load.py:94-105 — plain and array ("pints"/"plongs"/…) variants).
SOLR_NUMERIC_TYPES = frozenset({
    "pint", "plong", "pfloat", "pdouble",
    "pints", "plongs", "pfloats", "pdoubles",
})


def shape_solr_documents(
    df: DataFrame,
    schema_fields: dict[str, str],
    unique_field: str,
    deterministic_ids: bool = False,
) -> DataFrame:
    """Project a frame onto a Solr core schema (S13 —
    workflow/load.py:66-122): keep only columns present in the schema's
    field list, cast Solr numeric field types to double (array-aware:
    ``array<…>`` columns become ``array<double>``), and fill the core's
    unique field with ``uuid()`` when the frame lacks it.

    ``schema_fields`` maps field name → Solr type (what the reference
    fetches from ``/solr/<core>/schema/fields``; here a plain dict so the
    shaping is testable without a Solr service). ``deterministic_ids``
    swaps ``uuid()`` for an md5 over the row's JSON — reproducible ids for
    tests/oracles (production keeps uuid, matching the reference).
    """
    from pyspark.sql import functions as F

    cols = [c for c in df.columns if c in schema_fields]
    out = df.select(*cols)
    dtypes = dict(out.dtypes)
    for name in cols:
        if schema_fields[name] in SOLR_NUMERIC_TYPES:
            target = "array<double>" if dtypes[name].startswith("array") else "double"
            out = out.withColumn(name, F.col(name).cast(target))
    if unique_field not in out.columns:
        id_col = (
            F.md5(F.to_json(F.struct(*[F.col(c) for c in out.columns])))
            if deterministic_ids
            else F.expr("uuid()")
        )
        out = out.withColumn(unique_field, id_col)
    return out


def shape_mongo_documents(df: DataFrame, class_name: str) -> DataFrame:
    """Mongo document shaping (S12 — impc_bulk_api_mongo_load.py:55-66):
    attach the Spring Data ``_class`` discriminator column. Kept separate
    from the connector write so the document shape is testable without a
    Mongo service."""
    from pyspark.sql import functions as F

    return df.withColumn("_class", F.lit(class_name))


def mongo_write_options(uri: str, database: str, collection: str) -> dict[str, str]:
    """The exact connector option map ``write_mongo`` passes to the
    spark-mongodb writer (S12 — impc_bulk_api_mongo_load.py:55-66: uri,
    database, collection, majority write concern). Factored out as a pure
    function so the option plumbing is pinned by a unit test even though
    no Mongo service exists in this environment."""
    return {
        "spark.mongodb.write.uri": uri,
        "database": database,
        "collection": collection,
        "writeConcern.w": "majority",
    }


def write_mongo(
    df: DataFrame,
    uri: str,
    database: str,
    collection: str,
    class_name: str,
    mode: str = "overwrite",
) -> None:
    """Mongo sink wrapper (S12 — impc_bulk_api_mongo_load.py:55-66):
    ``_class`` discriminator + majority write concern. Needs the
    spark-mongodb connector on the classpath at runtime (absent in this
    environment; the shaping + option map are the testable parts)."""
    (
        shape_mongo_documents(df, class_name)
        .write.format("mongodb").mode(mode)
        .options(**mongo_write_options(uri, database, collection))
        .save()
    )


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite",
               properties: dict[str, str] | None = None,
               create_table_column_types: str | None = None) -> None:
    """JDBC sink (S11 — impc_api_pg_loader.py:52-79). Needs a JDBC driver
    jar on the classpath at runtime; exercised end-to-end against embedded
    Derby (on Spark's default classpath) in test_sources.py, including
    ``createTableColumnTypes``."""
    w = df.write.mode(mode)
    if create_table_column_types:
        w = w.option("createTableColumnTypes", create_table_column_types)
    w.jdbc(url, table, properties=properties or {})


def read_jdbc_partitioned(spark, url: str, query: str, partition_column: str,
                          lower: int, upper: int, num_partitions: int = 10,
                          properties: dict[str, str] | None = None) -> DataFrame:
    """Partitioned JDBC scan (S5 — gene_ref_extractor.py:100-170): SQL
    pushdown via subquery-as-table, ranged on a numeric key so each executor
    reads a slice. Exercised end-to-end against embedded Derby in
    test_sources.py (4-way ranged split verified)."""
    return spark.read.jdbc(
        url,
        table=f"({query}) AS t",
        column=partition_column,
        lowerBound=lower,
        upperBound=upper,
        numPartitions=num_partitions,
        properties=properties or {},
    )


def write_shards_with_manifest(
    df: DataFrame,
    path: str,
    num_shards: int,
    key_cols: list[str],
    token_col: str | None = None,
    salt: str = "",
) -> dict:
    """Hash-sharded corpus export + manifest — the training-export shape
    (WebDataset/loader-planning): rows land in ``shard=K`` partition
    directories by the deterministic md5 key hash (same rows → same shard
    across runs, engines, partitionings — resumable exports), and
    ``_manifest.json`` (underscore prefix: ignored as hidden metadata by
    directory scans, like ``_SUCCESS``) records per-shard row/token counts so a training
    loader can plan epochs without listing data files.

    One repartition on the shard id co-locates writers (one file per
    shard, no small-file spray). The manifest aggregate is
    num_shards-sized — the only thing the driver ever sees.
    """
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from impc_etl_spark.operators.sampling import hash_bucket

    # hash straight into num_shards buckets: a second mod over the default
    # 10000-bucket space skews shard sizes whenever num_shards doesn't
    # divide 10000 (~11% at 1024 shards) and leaves shards permanently
    # EMPTY when num_shards exceeds it
    shard = hash_bucket(key_cols, salt=salt, num_buckets=num_shards).alias("shard")
    tagged = df.withColumn("shard", shard).repartition(num_shards, "shard")
    tagged.write.mode("overwrite").partitionBy("shard").parquet(path)

    # Manifest counts come from the files actually written (not from
    # re-aggregating `tagged`, which would re-execute the upstream plan —
    # double cost, and a nondeterministic upstream would make the manifest
    # disagree with what's on disk).
    written = tagged.sparkSession.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col:
        aggs.append(F.sum(token_col).alias("n_tokens"))
    stats = written.groupBy("shard").agg(*aggs).orderBy("shard").collect()
    manifest = {
        "num_shards": num_shards,
        "key_cols": key_cols,
        "shards": [r.asDict() for r in stats],
        "total_rows": int(sum(r["n_rows"] for r in stats)),
    }
    if token_col:
        manifest["total_tokens"] = int(sum(r["n_tokens"] for r in stats))
    # write through the Hadoop FileSystem API so object-store/HDFS paths
    # work — builtin open() only handles local paths and would strand the
    # export in the exact data-without-manifest state this function
    # exists to prevent
    spark = tagged.sparkSession
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(
        _os.path.join(path, "_manifest.json")
    )
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jvm_path, True)
    try:
        out.write(bytearray(_json.dumps(manifest, indent=1, default=int),
                            "utf-8"))
    finally:
        out.close()
    return manifest


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    z_cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet sink: range-partition + sort on the
    Morton interleave of ``z_cols`` (``partitioning.z_order_key``) so
    row-group min/max stats are tight on EVERY listed column — scans
    filtered on any dimension prune at the footer. The multi-dimensional
    upgrade of ``write_sorted_parquet`` (whose lexicographic sort only
    prunes its leading column); one extra shuffle at write time, same as
    any clustered write.
    """
    from impc_etl_spark.operators.partitioning import z_order_key

    keyed = z_order_key(df, z_cols, bits=bits, out="__z")
    out = (keyed.repartitionByRange(num_files, "__z") if num_files
           else keyed.repartitionByRange("__z"))
    out.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)
