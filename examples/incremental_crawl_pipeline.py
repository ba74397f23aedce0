"""Incremental crawl-refresh pipeline — the recurring-ingest flow wired
from the round-3 operators.

  yesterday ──┐
              ├─ diff (snapshot_diff: NEW / CHANGED / REMOVED / UNCHANGED)
  today ──────┘
      NEW+CHANGED ─ extract (strip_html: crawl shells → text)
                  ─ quality gate (top_fraction_per_key: best 70% per lang)
                  ─ domain targeting (importance_resample toward English)
                  ─ store dedup (near_dup_against_store vs yesterday's corpus)
                  ─ batching (length_buckets for the scoring pass)

Only the changed slice of the crawl flows through the expensive stages;
the store side of every probe is a persistable index (fingerprints, band
keys), so at production scale history is never re-tokenized.

Run:  python examples/incremental_crawl_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build(spark, sf_dir: str, out_dir: str):
    from impc_etl_spark.operators.dedup import near_dup_against_store
    from impc_etl_spark.operators.history import snapshot_diff
    from impc_etl_spark.operators.sampling import (
        importance_resample,
        top_fraction_per_key,
    )
    from impc_etl_spark.operators.text import (
        fingerprint,
        length_buckets,
        strip_html,
        token_count,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # Simulated crawls: yesterday misses every 10th doc and has stale text
    # for every 7th; today is the full corpus.
    yesterday = docs.where(F.col("doc_id") % 10 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit("stale "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    today = docs

    diff = snapshot_diff(
        yesterday.select("doc_id", fingerprint("text").alias("fp")),
        today.select("doc_id", fingerprint("text").alias("fp")),
        ["doc_id"], "fp",
    )
    refresh_ids = diff.where(F.col("status").isin("NEW", "CHANGED")).select("doc_id")

    # The changed slice, arriving as crawl HTML shells
    slice_df = today.join(refresh_ids, "doc_id").withColumn(
        "html", F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>"))
    )
    extracted = slice_df.select(
        "doc_id", "lang", strip_html(F.col("html")).alias("text")
    )

    scored = extracted.withColumn(
        "q_score",
        token_count("text").cast("double")
        * F.length("text") / (F.length("text") + F.lit(100.0)),
    )
    gated = top_fraction_per_key(
        scored, ["lang"], "q_score", 0.7, tiebreak_cols=["doc_id"]
    )

    targeted = importance_resample(
        gated.select("doc_id", "lang", "text"),
        gated.where(F.col("lang") == "en"),
        buckets=256, temperature=1.5, salt="crawl",
    )

    fresh = near_dup_against_store(
        targeted, yesterday, "text", "doc_id", threshold=0.6, mode="drop"
    )

    batched = length_buckets(fresh, "text", batch_size=32, id_col="doc_id")

    os.makedirs(out_dir, exist_ok=True)
    batched.write.mode("overwrite").parquet(os.path.join(out_dir, "refresh_batches"))
    counts = {
        "diff": {r["status"]: r["n"] for r in
                 diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()},
        "refresh_slice": slice_df.count(),
        "quality_gated": gated.count(),
        "domain_targeted": targeted.count(),
        "store_deduped": fresh.count(),
        "batches": batched.select("bucket", "batch_id").distinct().count(),
    }
    return counts


if __name__ == "__main__":
    from impc_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/crawl_refresh"
    spark = get_spark("incremental-crawl")
    print(build(spark, sf_dir, out_dir))
