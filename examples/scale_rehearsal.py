#!/usr/bin/env python
"""Scale rehearsal (r5 verdict item 5): measure the headline queries on an
sfN-EQUIVALENT dataset synthesized locally, and record shuffle/spill
metrics so the 100 TB plan arguments have an executed data point above
sf0.1.

Usage:
    python3 examples/scale_rehearsal.py [K] [src_dir] [work_dir]

K (default 10) is the replication factor over sf0.1: each table is
replicated K times with SHIFTED KEYS so referential integrity holds
(replica i adds i * (max_key + 1) to every PK/FK pair consistently) —
the result has the same join fan-outs, key cardinality ratios, and dup
density per replica as the source, i.e. an sf(0.1*K)-equivalent workload,
not K copies of the same keys.

Content is perturbed deterministically so data-dependent operators see
fresh values rather than exact clones:
  - documents.text: replica i>0 rotates vowels (translate) — every
    shingle changes, so MinHash/LSH dup structure scales by K instead of
    every document acquiring K-1 artificial near-duplicates; length (and
    n_chars) is preserved.
  - embeddings.embedding: replica i rolls the vector by i positions —
    norms preserved, neighbor structure reshuffled.
  - region/nation: true dimensions, NOT scaled (as at 100 TB).

Metrics come from the Spark REST status API (/api/v1): per-query deltas
of cumulative completed-stage shuffle read/write, memory/disk spill and
input bytes. One timed pass per query (this is a rehearsal for plan
behavior at scale, not a microbenchmark — bench.py owns steady-state
timing). Prints one JSON line per query plus a trailing summary line;
paste the summary into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# PK/FK shift groups: every column listed for a table shifts by
# i * (max(base_key) + 1) of its GROUP, keeping joins intact across
# replicas. Group anchor = (table, column) the max is taken from.
SHIFTS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}

VOWELS = "aeiou"


def scale_tables(spark, src: str, dst: str, k: int) -> None:
    from pyspark.sql import functions as F

    anchors: dict[tuple[str, str], int] = {}
    for tbl, cols in SHIFTS.items():
        for anchor in cols.values():
            if anchor not in anchors:
                atbl, acol = anchor
                mx = (
                    spark.read.parquet(f"{src}/{atbl}.parquet")
                    .agg(F.max(acol)).collect()[0][0]
                )
                anchors[anchor] = int(mx) + 1

    replicas = spark.range(k).withColumnRenamed("id", "__r")
    for tbl in TABLES:
        base = spark.read.parquet(f"{src}/{tbl}.parquet")
        out = f"{dst}/{tbl}.parquet"
        if tbl in ("region", "nation"):
            base.write.mode("overwrite").parquet(out)
            continue
        # broadcast k-row replica frame: k copies without reading the
        # source k times from the driver
        df = base.crossJoin(F.broadcast(replicas))
        for col, anchor in SHIFTS[tbl].items():
            df = df.withColumn(
                col, (F.col(col) + F.col("__r") * F.lit(anchors[anchor]))
                .cast(dict(base.dtypes)[col])
            )
        if tbl == "part":
            # p_name gets the same per-replica consonant rotation as
            # documents.text (r10): replicas otherwise carry VERBATIM
            # name copies, so any edit-distance/fuzzy query's TRUE
            # answer grows as K² exact-duplicate pairs (20k names ×
            # C(300,2) ≈ 10⁹ d=0 pairs at K=300) — an artifact of the
            # replication scheme, not a workload property. Rotation is
            # length-preserving and deterministic, so name structure
            # (5 color words) and near-dup density per replica survive.
            cons = "bcdfghjklmnpqrstvwxyz"
            crot = F.pmod(F.col("__r"), F.lit(len(cons))).cast("int")
            nexpr = F.col("p_name")
            for r in range(1, min(k, len(cons))):
                tgt = cons[r:] + cons[:r]
                nexpr = F.when(
                    crot == r, F.translate(F.col("p_name"), cons, tgt)
                ).otherwise(nexpr)
            df = df.withColumn("p_name", nexpr)
        if tbl == "documents":
            # per-replica vowel x consonant rotations: length-preserving,
            # changes every shingle for i>0 (replica 0 stays the
            # original), and 5 x 21 = 105 distinct variants so replicas
            # up to k=105 are not exact text clones of each other
            cons = "bcdfghjklmnpqrstvwxyz"
            vrot = F.pmod(F.col("__r"), F.lit(len(VOWELS))).cast("int")
            crot = F.pmod(
                (F.col("__r") / F.lit(len(VOWELS))).cast("long"),
                F.lit(len(cons)),
            ).cast("int")
            # two SEQUENTIAL withColumn stages, each a flat when-chain
            # whose translate branches reference the PREVIOUS column —
            # never the accumulating expression — so the tree stays
            # linear (nesting the accumulator inside translate AND
            # otherwise doubles the tree per level: 2^25 nodes, JVM
            # StackOverflow at plan conversion)
            vexpr = F.col("text")
            for r in range(1, min(k, len(VOWELS))):
                tgt = VOWELS[r:] + VOWELS[:r]
                vexpr = F.when(
                    vrot == r, F.translate(F.col("text"), VOWELS, tgt)
                ).otherwise(vexpr)
            df = df.withColumn("__vtext", vexpr)
            cexpr = F.col("__vtext")
            for r in range(1, min((k + len(VOWELS) - 1) // len(VOWELS),
                                  len(cons))):
                tgt = cons[r:] + cons[:r]
                cexpr = F.when(
                    crot == r, F.translate(F.col("__vtext"), cons, tgt)
                ).otherwise(cexpr)
            df = df.withColumn("text", cexpr).drop("__vtext")
        elif tbl == "embeddings":
            # roll the vector by __r positions, negating alternate
            # elements every full roll cycle: norm-preserving, and
            # 2*dim distinct variants so k past the dimensionality
            # still yields fresh neighbor structure
            dim = F.size("embedding")
            off = F.pmod(F.col("__r"), dim).cast("int")
            rolled = F.when(off == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.slice("embedding", off + 1, dim - off),
                    F.slice("embedding", 1, off),
                )
            )
            flip = F.pmod((F.col("__r") / dim).cast("long"), F.lit(2))
            df = df.withColumn(
                "embedding",
                F.when(flip == 0, rolled).otherwise(
                    F.zip_with(
                        rolled,
                        F.sequence(F.lit(1), dim),
                        lambda x, i: F.when(
                            i % 2 == 0, -x
                        ).otherwise(x),
                    )
                ),
            )
        df.drop("__r").repartition(32).write.mode("overwrite").parquet(out)


_METRIC_KEYS = (
    "shuffleReadBytes", "shuffleWriteBytes", "memoryBytesSpilled",
    "diskBytesSpilled", "inputBytes", "executorRunTime",
)


def _stage_totals(ui: str | None, app: str) -> dict[str, int]:
    out = {kk: 0 for kk in _METRIC_KEYS}
    if not ui:
        return out
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as resp:
        stages = json.loads(resp.read())
    for st in stages:
        for kk in _METRIC_KEYS:
            out[kk] += int(st.get(kk, 0) or 0)
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sfscale_x{k}"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from impc_etl_spark.queries import QUERIES
    from impc_etl_spark.session import get_spark

    # the engine default disables the UI (tests don't need it); the
    # rehearsal needs the REST status API for stage-level shuffle/spill
    spark = get_spark(
        "impc-etl-spark-scale", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{dst}/lineitem.parquet"):
        t0 = time.time()
        scale_tables(spark, src, dst, k)
        print(json.dumps({"scaled": dst, "k": k,
                          "gen_sec": round(time.time() - t0, 1)}))

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    headline = [
        "pricing_summary", "region_revenue", "top_customers_per_nation",
        "supplier_lineitem_window", "purchase_attribution_asof",
        "user_sessions", "customer_order_rollup",
        "campaign_order_attribution", "observations_pipeline",
        "docs_minhash_lsh", "docs_verified_near_dups", "docs_dup_groups",
        "docs_quality", "docs_unigram_logprob", "docs_chunks",
        "docs_line_dedup", "corpus_prepare", "media_feature_extract",
        "emb_cosine_topk", "emb_batch_topk", "docs_dup_spans",
        "docs_bm25_search",
    ]
    # optional 4th arg: extra comma-separated query names (e.g. the
    # round's new operators) measured after the standard headline set;
    # prefix with "only:" to run JUST the listed names (targeted
    # re-confirmation runs, r6 verdict item 4)
    if len(sys.argv) > 4 and sys.argv[4]:
        extra = sys.argv[4]
        if extra.startswith("only:"):
            headline = [n for n in extra[5:].split(",") if n]
        else:
            headline += [n for n in extra.split(",") if n]

    spark.read.parquet(f"{dst}/region.parquet").count()  # session warm
    results = {}
    total = 0.0
    for name in headline:
        before = _stage_totals(ui, app)
        t0 = time.time()
        n = QUERIES[name](spark, dst).count()
        dt = time.time() - t0
        after = _stage_totals(ui, app)
        delta = {kk: after[kk] - before[kk] for kk in before}
        rec = {
            "query": name, "rows": n, "sec": round(dt, 2),
            "shuffle_read_mb": round(delta["shuffleReadBytes"] / 1e6, 1),
            "shuffle_write_mb": round(delta["shuffleWriteBytes"] / 1e6, 1),
            "spill_mem_mb": round(delta["memoryBytesSpilled"] / 1e6, 1),
            "spill_disk_mb": round(delta["diskBytesSpilled"] / 1e6, 1),
            "input_mb": round(delta["inputBytes"] / 1e6, 1),
        }
        results[name] = rec
        total += dt
        print(json.dumps(rec), flush=True)

    print(json.dumps({
        "metric": "scale_rehearsal_total_sec",
        "value": round(total, 1),
        "k": k,
        "equivalent_sf": 0.1 * k,
        "queries_sec": {q: r["sec"] for q, r in results.items()},
        "total_shuffle_write_mb": round(
            sum(r["shuffle_write_mb"] for r in results.values()), 1),
        "total_spill_disk_mb": round(
            sum(r["spill_disk_mb"] for r in results.values()), 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
