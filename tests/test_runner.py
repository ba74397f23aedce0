"""DAG runner: topological execution, parquet-target memoization, forced
reruns, cycle detection — a reference-shaped mini-pipeline end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _build(spark, root):
    from impc_etl_spark.plans.runner import Pipeline

    p = Pipeline(spark, root)
    calls = []

    @p.task("orders_clean")
    def orders_clean(s):
        calls.append("orders_clean")
        return (
            s.read.parquet(f"{SF_SMOKE}/orders.parquet")
            .where(F.col("o_custkey").isNotNull())
        )

    @p.task("lineitem_clean")
    def lineitem_clean(s):
        calls.append("lineitem_clean")
        return s.read.parquet(f"{SF_SMOKE}/lineitem.parquet")

    @p.task("observations", inputs=["orders_clean", "lineitem_clean"])
    def observations(s, orders, lineitem):
        calls.append("observations")
        from impc_etl_spark.plans.observations import observations as obs

        return obs(orders, lineitem)

    @p.task("obs_summary", inputs=["observations"])
    def obs_summary(s, obs):
        calls.append("obs_summary")
        return obs.groupBy("parameter_family", "observation_type").agg(
            F.count(F.lit(1)).alias("n")
        )

    return p, calls


def test_runner_end_to_end_and_memoization(spark, tmp_path):
    root = str(tmp_path / "dag")
    p, calls = _build(spark, root)
    st = p.run("obs_summary")
    assert st == {
        "orders_clean": "ran", "lineitem_clean": "ran",
        "observations": "ran", "obs_summary": "ran",
    }
    rows = {(r["parameter_family"], r["observation_type"]): r["n"]
            for r in p.read("obs_summary").collect()}
    assert sum(rows.values()) == p.read("observations").count()
    assert ("seriesParameter", "time_series") in rows

    # second run: everything cached, no task bodies re-invoked
    calls.clear()
    st2 = p.run("obs_summary")
    assert set(st2.values()) == {"cached"} and calls == []

    # force one mid-DAG task: only it reruns (downstream still cached —
    # the operator model leaves invalidation policy to the caller)
    st3 = p.run("obs_summary", force=["observations"])
    assert st3["observations"] == "ran" and st3["obs_summary"] == "cached"


def test_runner_cycle_detection(spark, tmp_path):
    from impc_etl_spark.plans.runner import Pipeline

    p = Pipeline(spark, str(tmp_path / "dag2"))

    @p.task("a", inputs=["b"])
    def a(s, b):  # pragma: no cover
        return None

    @p.task("b", inputs=["a"])
    def b(s, a):  # pragma: no cover
        return None

    with pytest.raises(ValueError, match="cycle"):
        p.run("a")


def test_pipeline_from_spec_sql_tasks(spark, tmp_path):
    import json

    from impc_etl_spark.plans.runner import pipeline_from_spec

    spec = json.loads(json.dumps({  # round-trip: spec is plain JSON data
        "tasks": [
            {"name": "orders", "source": f"{SF_SMOKE}/orders.parquet"},
            {"name": "customer", "source": f"{SF_SMOKE}/customer.parquet"},
            {"name": "clean_orders",
             "sql": "SELECT * FROM orders WHERE o_custkey IS NOT NULL",
             "inputs": ["orders"]},
            {"name": "seg_rollup",
             "sql": """
               SELECT c_mktsegment, count(*) AS n
               FROM clean_orders JOIN customer ON o_custkey = c_custkey
               GROUP BY c_mktsegment
             """,
             "inputs": ["clean_orders", "customer"]},
        ]
    }))
    p = pipeline_from_spec(spark, str(tmp_path / "dag3"), spec)
    st = p.run("seg_rollup")
    assert st["seg_rollup"] == "ran"
    got = {r["c_mktsegment"]: r["n"] for r in p.read("seg_rollup").collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    want = {
        r["c_mktsegment"]: r["n"]
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_sql_front_door(spark):
    from impc_etl_spark.session import register_views

    register_views(spark, SF_SMOKE, "region", "nation")
    got = spark.sql(
        "SELECT r_name, count(*) AS n FROM region JOIN nation "
        "ON r_regionkey = n_regionkey GROUP BY r_name"
    ).collect()
    assert sum(r["n"] for r in got) == spark.table("nation").count()


def test_release_pipeline_example(spark, tmp_path):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "release_pipeline",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "examples", "release_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    p = mod.build(spark, SF_SMOKE, str(tmp_path / "rel"))
    st = p.run("stats_input", "release_diff", "solr_docs", "mongo_docs")
    assert all(v == "ran" for v in st.values())
    obs = p.read("observations_final")
    assert p.read("stats_input").count() == obs.count()
    # diff picks out exactly the synthesized curve rows
    assert (p.read("release_diff").count()
            == obs.where(F.col("parameter_family") == "derivedCurve").count())
    # publication shaping: schema projection + casts + filled unique field
    solr = p.read("solr_docs")
    dt = dict(solr.dtypes)
    assert dt == {"experiment_id": "string", "n_observations": "double",
                  "curve_auc": "double", "doc_id": "string"}
    assert solr.where(F.col("doc_id").isNull()).count() == 0
    mongo = p.read("mongo_docs")
    assert mongo.select("_class").distinct().collect()[0][0] == "org.impc.api.ExperimentSummary"


def test_training_corpus_pipeline_example(spark, tmp_path):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "training_corpus_pipeline",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "examples", "training_corpus_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    p = mod.build(spark, SF_SMOKE, str(tmp_path / "corpus"))
    st = p.run("profile", "packed", "features", "tokenizer", "splits")
    assert all(v == "ran" for v in st.values())
    clean = p.read("clean_corpus").count()
    decon = p.read("decontaminated").count()
    selected = p.read("selected").count()
    assert 0 < selected <= decon <= clean          # each stage only filters
    assert p.read("packed").count() == selected
    assert p.read("features").count() == selected
    # packing conserves tokens and shards by language
    packed = p.read("packed")
    assert (packed.agg(F.sum("n_tokens")).collect()[0][0]
            == p.read("selected").agg(F.sum("n_tokens")).collect()[0][0])
    assert packed.where(~F.col("pack_id").startswith(F.col("lang"))).count() == 0
    # tokenizer stage: 8 merges, ranked 1..8
    merges = p.read("tokenizer").orderBy("merge_rank").collect()
    assert [m["merge_rank"] for m in merges] == list(range(1, 9))
    # splits stage: covers the cleaned corpus, same group => same split
    splits = p.read("splits")
    assert splits.count() == clean
    assert splits.groupBy("group_id").agg(
        F.countDistinct("split").alias("n")).where("n > 1").count() == 0


def test_example_pipelines_run_end_to_end(spark, tmp_path):
    """The three shipped example pipelines must build AND execute against
    the smoke-SF data — the guard that keeps examples from bitrotting as
    operator APIs evolve (r5: resize_media/audio schema changes would
    otherwise only surface for users)."""
    import importlib
    import os
    import sys

    sf = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
    examples_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    )
    sys.path.insert(0, examples_dir)
    try:
        for name in ("training_corpus_pipeline", "release_pipeline"):
            mod = importlib.import_module(name)
            statuses = mod.build(spark, sf, str(tmp_path / name)).run()
            assert statuses and all(v == "ran" for v in statuses.values()), (
                name, statuses)
        crawl = importlib.import_module("incremental_crawl_pipeline")
        summary = crawl.build(spark, sf, str(tmp_path / "crawl"))
        assert summary["batches"] == 2 and summary["store_deduped"] > 0
    finally:
        sys.path.remove(examples_dir)
