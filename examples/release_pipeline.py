"""End-to-end release pipeline — the reference's ImpcPreStatisticalAnalysis
flow re-expressed on this engine (SURVEY.md §3 entry point 1).

Stage shape (each a checkpointed DAG task, parquet between stages):

  orders_raw / lineitem_raw      (extract: S9 parquet sources)
    → orders_clean               (clean: null-required drops + rewrite)
    → observations               (nested docs → fact table, fused mapping)
    → observations_final         (+ synthesized curve observations)
    → stats_input                (flatten to the R-pipeline input shape:
                                  '::'-joined metadata, one row per obs)
    → release_diff               (regression net vs the 'previous release')
    → mart                       (wide denormalized summary per experiment)
    → solr_docs / mongo_docs     (publication shaping: schema projection +
                                  casts; _class discriminator)

Run:  python examples/release_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build(spark, sf_dir: str, out_dir: str):
    from impc_etl_spark.operators.clean import drop_null_rows
    from impc_etl_spark.operators.joins import release_diff
    from impc_etl_spark.plans.observations import observations, synthesize_curve_observations
    from impc_etl_spark.plans.runner import Pipeline
    from impc_etl_spark.operators.conform import union_conform

    p = Pipeline(spark, out_dir)

    @p.task("orders_raw")
    def orders_raw(s):
        return s.read.parquet(f"{sf_dir}/orders.parquet")

    @p.task("lineitem_raw")
    def lineitem_raw(s):
        return s.read.parquet(f"{sf_dir}/lineitem.parquet")

    @p.task("orders_clean", inputs=["orders_raw"])
    def orders_clean(s, orders):
        return drop_null_rows(orders, ["o_orderkey", "o_custkey", "o_orderdate"])

    @p.task("observations", inputs=["orders_clean", "lineitem_raw"])
    def obs(s, orders, lineitem):
        return observations(orders, lineitem)

    @p.task("observations_final", inputs=["observations"])
    def obs_final(s, obs_df):
        return union_conform([obs_df, synthesize_curve_observations(obs_df)])

    @p.task("stats_input", inputs=["observations_final"])
    def stats_input(s, obs_df):
        # the R-pipeline input shape: scalar columns only, arrays flattened
        # to '::'-joined strings (stats_pipeline_input_mapper.py:45-66)
        return obs_df.select(
            "observation_id",
            "experiment_id",
            F.concat_ws("::", "parameter_family", "observation_type").alias("parameter_key"),
            "data_point",
            "category",
            "metadata_group",
        )

    @p.task("release_diff", inputs=["observations_final"])
    def diff(s, obs_df):
        previous = obs_df.where(F.col("parameter_family") != "derivedCurve")
        return release_diff(obs_df, previous, ["observation_id"])

    @p.task("mart", inputs=["observations_final"])
    def mart(s, obs_df):
        return obs_df.groupBy("experiment_id").agg(
            F.count(F.lit(1)).alias("n_observations"),
            F.sum(F.when(F.col("observation_type") == "unidimensional", 1).otherwise(0)).alias("n_numeric"),
            F.max(F.when(F.col("parameter_family") == "derivedCurve", F.col("data_point"))).alias("curve_auc"),
        )

    @p.task("solr_docs", inputs=["mart"])
    def solr_docs(s, mart_df):
        from impc_etl_spark.sources.sinks import shape_solr_documents

        return shape_solr_documents(
            mart_df,
            schema_fields={
                "experiment_id": "string",
                "n_observations": "plong",
                "curve_auc": "pdouble",
                "doc_id": "string",
            },
            unique_field="doc_id",
            deterministic_ids=True,
        )

    @p.task("mongo_docs", inputs=["mart"])
    def mongo_docs(s, mart_df):
        from impc_etl_spark.sources.sinks import shape_mongo_documents

        return shape_mongo_documents(mart_df, "org.impc.api.ExperimentSummary")

    return p


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/impc_release_demo"
    from impc_etl_spark.session import get_spark

    spark = get_spark("release-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    p = build(spark, sf_dir, out_dir)
    statuses = p.run("stats_input", "release_diff", "solr_docs", "mongo_docs")
    for task, st in statuses.items():
        print(f"{task:20s} {st:6s} rows={p.read(task).count()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
