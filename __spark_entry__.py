"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (plus north-star dedup /
similarity / text / windowing ops); ``oracle_sql()`` holds the DuckDB
equivalents (keys without an oracle are approximate ops checked rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the observation-mapping plan (nested experiment docs →
    flat observation fact table — the reference's semantic core) on
    sf0.001."""
    from impc_etl_spark.queries import observations_pipeline

    return observations_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from impc_etl_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from impc_etl_spark.queries import ORACLE

    return dict(ORACLE)
