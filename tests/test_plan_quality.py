"""Plan-quality guardrails over EVERY registered query.

Encodes the engine's performance discipline as tests: no Cartesian
products, no row-at-a-time Python UDFs (BatchEvalPython), and parquet
filter pushdown wherever a query filters a base table. A regression that
slips a Python UDF into a hot path or degrades a join to a cross product
fails CI — not a code review.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

# Queries whose plans legitimately contain a broadcast nested-loop join:
# non-equi predicates against a BROADCAST side (array membership, pair
# generation over a fanned-out small table). A BNL against a broadcast dim
# is bounded work; a CartesianProduct is never allowed.
BNL_ALLOWED = {
    "array_membership_join",
    "emb_batch_topk",  # corpus × broadcast query table (scoring is the point)
    "emb_hard_negatives",  # corpus × broadcast anchor table, label-mismatch predicate
    "emb_positive_pairs",  # corpus × broadcast anchor table, same-label predicate
    "docs_tfidf_terms",  # cross join with a broadcast 1-ROW scalar (corpus N)
    "docs_bm25_search",  # cross join with a broadcast 1-ROW stats row (N, avgdl, dfs)
    "docs_hybrid_rrf_search",  # same 1-ROW BM25 stats broadcast inside the lexical arm
    "docs_lsh_recall",  # cross join of three 1-ROW count frames (the measurement row)
    "emb_ivf_store_topk",  # cross join with a broadcast 1-ROW scanned-partitions frame
    "docs_unigram_logprob",  # cross join with a broadcast 1-ROW scalar (N, V)
    "docs_bigram_logprob",  # cross join with a broadcast 1-ROW scalar (V)
    "docs_kn_bigram_logprob",  # cross join with a broadcast 1-ROW scalar (T)
    "customer_urgent_bh_fdr",  # three broadcast 1-ROW scalars (p0, m, BH cutoff)
    "docs_backoff_trigram_logprob",  # broadcast 1-ROW scalar (model N, V)
    "docs_ndcg_eval",  # bm25_topk's 1-ROW stats broadcast, once per probe
    "orders_seasonal_decompose",  # 1-ROW center broadcast x <=period-row grid
    "docs_collocations",  # cross join with a broadcast 1-ROW scalar (N, B)
    "orders_skew_report",  # cross join of two 1-ROW stat frames per column
    "part_association_rules",  # cross join with a broadcast 1-ROW basket total (lift's N)
    "orders_price_histogram",  # cross join with a broadcast 1-ROW min/max bounds
    "orders_zorder_key",  # cross join with a broadcast 1-ROW per-column bounds frame
    "corpus_vocab",  # cross join with a broadcast 1-ROW total token mass
    "docs_dup_rate",  # cross join of two 1-ROW summary frames
    "docs_strip_boilerplate",  # cross join with a broadcast 1-ROW corpus-docs count
    "nation_trade_pagerank",  # cross joins with broadcast 1-ROW N / dangling-mass frames
    "docs_importance_resample",  # cross join with a broadcast 1-ROW (N_raw, N_target) totals frame
    "orders_status_overlap_hll",  # cross join of two 1-ROW aggregate frames (exact × HLL)
    "emb_covariance",  # cross join with a broadcast 1-ROW total-count frame
    "emb_pca_whiten",  # cross join of 1-ROW count × 1-ROW invariant-checks frames
    "orders_ks_yearly_drift",  # cross joins with broadcast 1-ROW bounds/totals frames
    "docs_zipf_fit",  # cross join with a broadcast 1-ROW (n_tokens, vocab_size) frame
    "customer_survival_km",  # cross join with a broadcast 1-ROW total-subjects frame
    "orders_trend_mann_kendall",  # month-grid pair join against a broadcast copy of the grid
    "orders_revenue_bootstrap_ci",  # cross join with a broadcast 1-ROW replicate-quantiles frame
    "orders_trend_sen_slope",  # month-grid pair join + two 1-ROW slope/intercept broadcasts
    "docs_textrank_keywords",  # pagerank's 1-ROW N / dangling-mass broadcasts over the word graph
    "docs_lang_unigram_divergence",  # cross join with a broadcast 1-ROW totals frame (Na, Nb, V)
}


def _plan(spark, name: str) -> str:
    from impc_etl_spark import queries as q

    df = q.QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def _all_names():
    from impc_etl_spark import queries as q

    return sorted(q.QUERIES)


# Fast mode compiles every 4th plan plus every BNL-allowlisted name (so
# the allowlist itself stays exercised); SPARK_GRAFT_TEST_FULL=1 compiles
# all of them, plus the full-registry scan audit at the bottom.
from tests.conftest import fast_subset  # noqa: E402


@pytest.mark.parametrize("name", fast_subset(_all_names(), always=BNL_ALLOWED))
def test_no_cartesian_and_no_python_row_udf(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    # ArrowEvalPython (pandas_udf) and MapInPandas/FlatMapGroupsInPandas are
    # the sanctioned Python surfaces; BatchEvalPython is the row-at-a-time
    # pickling path and must never appear.
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNL_ALLOWED, f"{name}: unexpected nested-loop join"


def test_column_pruning_reaches_scan(spark):
    """Projection pruning must reach the parquet ReadSchema: a scan that
    reads every column for a 2-column query ships the whole table at
    100 TB. Checked on representative queries per table."""
    import re

    from impc_etl_spark import queries as q

    # query -> (table file, exact column set the scan may read)
    expectations = {
        "docs_lang_id": ("documents.parquet", {"doc_id", "text"}),
        "docs_token_stats": ("documents.parquet", {"doc_id", "text"}),
        "emb_cosine_topk": ("embeddings.parquet", {"vec_id", "embedding"}),
        "top_customers_per_nation": ("orders.parquet", {"o_custkey", "o_totalprice"}),
    }
    for name, (table, want) in expectations.items():
        plan = q.QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().toString()
        scans = re.findall(
            r"FileScan parquet \[([^\]]*)\][^\n]*" + re.escape(table), plan
        )
        assert scans, f"{name}: no parquet scan of {table} found in plan"
        for cols in scans:
            got = {c.split("#")[0] for c in cols.split(",") if c}
            assert got <= want, (
                f"{name}: scan of {table} reads {got}, expected subset of {want}"
            )


def test_filter_pushdown_reaches_scan(spark):
    from impc_etl_spark import queries as q

    plan = q.QUERIES["pricing_summary"](spark, SF_SMOKE)._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_ivf_store_probe_prunes_partitions(spark):
    """The IVF store read must carry the cluster predicate as a PARTITION
    filter (directory pruning), not a post-scan data filter — the
    property that makes the on-disk IVF store a real index."""
    from impc_etl_spark import queries as q

    plan = (
        q.QUERIES["emb_ivf_store_topk"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*ivf_cluster", plan)
    assert m, f"no partition filter on ivf_cluster in plan:\n{plan[:2000]}"


def test_explain_summary_shapes(spark):
    from impc_etl_spark import queries as q
    from impc_etl_spark.plans.inspect import explain_summary

    s = explain_summary(q.QUERIES["region_revenue"](spark, SF_SMOKE))
    assert s["broadcast_joins"] >= 3      # all dims broadcast
    assert s["cartesian_products"] == 0 and s["python_row_udfs"] == 0
    assert any("l_orderkey" in f for f in s["pushed_filters"])

    s2 = explain_summary(q.QUERIES["observations_pipeline"](spark, SF_SMOKE))
    assert s2["generates"] >= 1           # fused single explode
    assert s2["exchanges"] <= 2           # one nest shuffle (+AQE reads)


def test_pack_sequences_window_is_sharded(spark):
    """The registered packing query must not plan a global (single
    partition) window — the cumsum runs one task per shard."""
    plan = _plan(spark, "corpus_pack_sequences")
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(shard" in plan


def test_asof_window_partitions_by_left_key(spark):
    """asof queries shuffle the dedup window on the narrow left key, not
    the whole left row."""
    for name in ("purchase_attribution_asof", "purchase_attribution_windowed"):
        plan = _plan(spark, name)
        assert "windowspecdefinition(event_id" in plan, name


def test_registered_lsh_queries_cap_mega_buckets(spark, tmp_path):
    """The REGISTERED dedup queries (not just the operator) must survive a
    boilerplate corpus: 200 identical docs put all ids in one band bucket;
    with LSH_MAX_BUCKET wired in, expansion is O(n) star edges (199 pairs),
    not O(n²) = 19900."""
    from pyspark.sql import functions as F

    from impc_etl_spark import queries as q

    n = 200
    boiler = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate license header text repeated verbatim").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
    )
    sf_dir = str(tmp_path)
    boiler.write.parquet(f"{sf_dir}/documents.parquet")
    pairs = q.QUERIES["docs_minhash_lsh"](spark, sf_dir)
    assert pairs.count() == n - 1  # star: min id ↔ every other id
    # and group assignment is unaffected by the cap: one component of 200
    groups = q.QUERIES["docs_dup_groups"](spark, sf_dir)
    assert groups.count() == n
    assert groups.select("group_id").distinct().count() == 1


def test_driver_window_outputs_are_hashable(spark):
    """The external driver hashes result cells through pandas factorize,
    which raises on list/dict values. Every query inside the driver's
    50-entry window must therefore emit only atomic top-level columns
    (complex payloads get array_join/to_json projections; the typed
    operators stay covered by unit tests)."""
    from pyspark.sql import types as T

    from impc_etl_spark import queries as q

    complex_types = (T.ArrayType, T.MapType, T.StructType)
    offenders = []
    for name in list(q.QUERIES)[:50]:
        df = q.QUERIES[name](spark, SF_SMOKE)
        for field in df.schema.fields:
            if isinstance(field.dataType, complex_types):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, f"driver-unhashable outputs in window: {offenders}"


def test_max_records_per_file(spark, tmp_path):
    import glob

    from impc_etl_spark.sources.sinks import write_parquet

    df = spark.range(1000).coalesce(1)
    out = str(tmp_path / "rot")
    write_parquet(df, out, max_records_per_file=250)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 4                # rotated inside the single task
    assert spark.read.parquet(out).count() == 1000


SKETCH_PROBES = [
    "orders_customer_cms",
    "customers_bloom_membership",
    "orders_heavy_customers_cms",
]


@pytest.mark.parametrize("name", SKETCH_PROBES)
def test_sketch_probe_joins_broadcast(spark, name):
    """Sketch probes must join the KB-sized sketch via broadcast — a
    SortMergeJoin here would shuffle the DATA side on sketch keys, which
    defeats the whole point of a sketch at 100 TB."""
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name}: sketch join not broadcast"
    assert "SortMergeJoin" not in plan, f"{name}: data side shuffled for sketch"


def test_aqe_skew_join_splits_hot_partition(spark):
    """The 100 TB skew story, EXECUTED (r5 verdict item 6): a planted hot
    key whose reduce partition dwarfs the median must make AQE's
    OptimizeSkewedJoin split it at runtime — the final adaptive plan
    shows SortMergeJoin(skew=true) with a skewed AQEShuffleRead — and
    the explicit `salted_join` fallback must return the identical
    result. Thresholds are lowered so a unit-test-sized hot key crosses
    the same code path a 100 TB run does."""
    from pyspark.sql import functions as F

    from impc_etl_spark.operators.joins import salted_join

    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    saved = {}
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(60000).select(
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000)
                                .cast("string"))).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(2000).select(
            F.when(F.col("id") == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 1000)
                                .cast("string"))).alias("k"),
            F.col("id").alias("rv"),
        )
        j = left.join(right, "k")
        n_aqe = len(j.collect())
        # final ADAPTIVE plan, inspected after execution of this same
        # QueryExecution — the skew split happens at runtime
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan, plan[:2000]
        n_salted = salted_join(left, right, ["k"], buckets=8).count()
        # 54000 hot-key matches (one right row) + 6000 non-hot left rows
        # x 2 right occurrences of each kNN9 key
        assert n_aqe == n_salted == 54000 + 12000
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_data_sized_aggregate_joins_never_broadcast(spark):
    """Regression (r6 sf10-equivalent rehearsal): joins whose build side
    is a DATA-SIZED aggregate (per-hash doc counts, term document
    frequencies, n-gram count tables, distinct-token vocabs) must pin
    sort-merge. Catalyst's static size estimate for such an aggregate —
    propagated through explode chains or a localCheckpoint's carried
    stats — can land under autoBroadcastJoinThreshold while the real
    table is GBs; the resulting broadcast OOMed the driver at 100x
    (dup_spans: 'Not enough memory to build and broadcast'), and the
    shuffle-hash fallback then died building per-partition maps. These
    operators' derived-aggregate joins must therefore plan
    SortMergeJoin, never BroadcastHashJoin, regardless of estimates."""
    import re

    from impc_etl_spark.operators import dedup as dedup_ops
    from impc_etl_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta doc{i % 7} "
              f"iota kappa lam mu nu xi omicron pi rho sigma tau")
         for i in range(40)],
        "doc_id bigint, text string",
    )
    plans = {
        "dup_spans": dedup_ops.dup_spans(docs, "text", "doc_id", k=8),
        "tfidf": text_ops.tfidf_top_terms(docs, "text", "doc_id", k=3),
        "bigram_lm": text_ops.bigram_logprob(
            docs, "text", "doc_id", broadcast_model=False),
        "unigram_lm": text_ops.unigram_logprob(
            docs, "text", "doc_id", broadcast_vocab=False),
        "collocations": text_ops.bigram_pmi(docs, "text", min_count=1, top_k=5),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the 1-row corpus-stats crossJoins legitimately broadcast; the
        # equi-joins against the derived aggregates must all be SMJ
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        assert n_smj >= 1, f"{name}: expected sort-merge join\n{plan[:1500]}"
        for line in plan.splitlines():
            if "BroadcastHashJoin" in line:
                raise AssertionError(
                    f"{name}: data-sized aggregate join planned as "
                    f"broadcast: {line}"
                )


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """The second half of the 100 TB pruning story (static footer-stat
    pruning is covered by the z-order/sorted-write tests): a fact table
    PARTITIONED on the join key must get a runtime `dynamicpruning`
    subquery in its PartitionFilters when joined to a selectively
    filtered dim — Spark then lists and scans ONLY the partitions the
    dim survives, instead of the whole fact. Guards the layout contract
    `sinks.write_bucketed`'s sibling pattern relies on."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    fact_path = str(tmp_path / "fact")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("F", "closed"), ("O", "open"), ("P", "pending")], ["st", "label"]
    )
    j = fact.join(
        dim.where(F.col("label") == "closed"), fact.o_orderstatus == dim.st
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the pruned plan still computes the right answer
    expected = orders.where(F.col("o_orderstatus") == "F").count()
    assert j.count() == expected


def test_lm_scoring_single_corpus_pass(spark):
    """unigram/bigram/BM25 scoring must evaluate the corpus scan+tokenize
    subtree at most ONCE in the final plan (r10 optimization): the model /
    stats side is materialized (localCheckpoint) and re-read as an
    ExistingRDD, never re-derived from parquet. Without the
    materialization Catalyst clones the whole explode→groupBy subtree per
    consumer (no cross-tree CSE) — docs_unigram_logprob planned THREE
    full tokenize passes over documents.parquet, bm25 two."""
    import re

    from impc_etl_spark import queries as q

    for name, max_scans in [
        ("docs_unigram_logprob", 1),
        ("docs_bigram_logprob", 2),  # scoring pass + the distinct-V pass
        ("docs_bm25_search", 0),  # stats AND scoring read the checkpoint
    ]:
        plan = q.QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().toString()
        n = len(re.findall(r"FileScan parquet [^\n]*documents\.parquet", plan))
        assert n <= max_scans, (
            f"{name}: {n} documents.parquet scans in final plan "
            f"(expected <= {max_scans} — duplicate corpus pass regressed)"
        )


def test_shared_subtree_scan_caps(spark):
    """r10 duplicate-scan elimination pins: each restructured query's
    FINAL plan must not regress to cloning shared subtrees (Catalyst has
    no cross-tree CSE — every extra consumer of an unmaterialized frame
    re-scans the base table). Caps = the audited post-fix scan counts."""
    import re

    from impc_etl_spark import queries as q

    for name, table, max_scans in [
        ("orders_release_diff", "orders", 2),      # was 4: NULL path folded
        ("orders_cdc_apply", "orders", 2),         # was 3: anti join folded
        ("orders_skew_report", "orders", 2),       # was 4: counts checkpointed
        ("orders_price_outliers", "orders", 3),    # was 4: median checkpointed
        ("orders_seasonal_decompose", "orders", 0),  # was 3: grid checkpointed
        ("part_fuzzy_entities", "part", 2),        # was 3: passthru folded
        ("docs_minhash_jaccard_est", "documents", 0),  # was 3: ONE sig pass
        ("docs_split_leakage", "documents", 2),    # was 3: splits ckpt
        ("emb_pq_codes", "embeddings", 1),         # was 3: row-local codes
        ("emb_pq_adc_topk", "embeddings", 1),      # was 3: row-local codes
        ("emb_pca_whiten", "embeddings", 2),       # was 3: pw derived from p
    ]:
        plan = q.QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().toString()
        n = len(re.findall(rf"FileScan parquet [^\n]*{table}\.parquet", plan))
        assert n <= max_scans, (
            f"{name}: {n} {table}.parquet scans in final plan "
            f"(expected <= {max_scans} — duplicate-subtree clone regressed)"
        )


def test_triangle_plan_builds_degree_table_once(spark):
    """r11: triangle_count's degree aggregate (a Union + groupBy over the
    edge list) must appear at most once in the final plan — before the
    deg checkpoint Catalyst cloned it FOUR times (twice per oriented-edge
    consumer; no cross-tree CSE). The checkpoint hides it from the final
    plan entirely, so any Union here is a regression to the clone."""
    plan = _plan(spark, "part_copurchase_triangles")
    assert "Union" not in plan, (
        "degree-aggregate Union reappeared in the triangles plan — the "
        "deg materialization regressed (subtree now cloned per consumer)"
    )


def test_cosine_banded_verifies_before_distinct(spark):
    """r11: cosine_banded_pairs must run the exact-cosine filter BELOW the
    pair-dedup aggregate (verify-before-distinct — the dedup exchange then
    carries only true matches, not every cross-band candidate). In the
    final plan that means no HashAggregate sits between the candidate
    Generate (pair explosion) and the cos_sim Filter."""
    import re

    from impc_etl_spark import queries as q

    plan = (
        q.QUERIES["emb_near_dup_pairs"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the surviving dedup aggregate must carry cos_sim in its keys (it
    # dedups VERIFIED rows); a HashAggregate keyed on the bare id pair is
    # the old pre-verify candidate distinct sneaking back
    keysets = re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", plan)
    assert any("cos_sim" in k for k in keysets), plan[:1500]
    for k in keysets:
        cols = {c.split("#")[0].strip() for c in k.split(",")}
        assert cols != {"vec_a", "vec_b"} and cols != {"doc_a", "doc_b"}, (
            f"candidate distinct (pre-verify) reappeared: keys [{k}]"
        )


@pytest.mark.skipif(
    not __import__("tests.conftest", fromlist=["TEST_FULL"]).TEST_FULL,
    reason="full-registry scan audit only under SPARK_GRAFT_TEST_FULL=1",
)
def test_full_registry_scan_audit(spark):
    """r10 verdict item 7: no registered query may scan any base table
    ≥3 times in its final plan, except the six documented deliberate
    multi-pass designs. Regression on ANY query's scan count fails CI."""
    import re
    from collections import Counter

    from impc_etl_spark import queries as q

    DELIBERATE = {
        "orders_heavy_customers_cms",      # sketch-then-verify: 3 passes by design
        "docs_backoff_trigram_logprob",    # c3 build + trigram distinct + scoring
        "docs_strip_boilerplate",          # measured recompute-over-materialize
        "docs_substring_dedup_cut",        # skew-safe recompute + text join-back
        "media_lossy_audio_deadletter",    # three independent Arrow synth branches
        "docs_decontaminate",              # full scan + pushed-filter + id-only scans
    }
    flagged = {}
    for name, fn in q.QUERIES.items():
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().toString()
        tables = Counter(
            m.group(1)
            for m in re.finditer(r"FileScan parquet [^\n]*?(\w+)\.parquet", plan)
        )
        hot = {t: c for t, c in tables.items() if c >= 3}
        if hot and name not in DELIBERATE:
            flagged[name] = hot
    assert not flagged, f"duplicate-subtree scans regressed: {flagged}"


def test_pq_and_cdc_plans_join_free(spark):
    """pq codes are row-local assignments against codebook literals
    (never a join back to the data); cdc_apply's delete rides the
    priority-merge window (never a separate anti join)."""
    from impc_etl_spark import queries as q

    plan = q.QUERIES["emb_pq_codes"](spark, SF_SMOKE)._jdf.queryExecution().toString()
    for smell in ("Join", "Exchange"):
        assert smell not in plan, f"emb_pq_codes plan contains {smell}"
    plan = q.QUERIES["orders_cdc_apply"](spark, SF_SMOKE)._jdf.queryExecution().toString()
    assert "Join" not in plan, "orders_cdc_apply reintroduced a join"
