"""Capture .explain("formatted") for named registry queries to files.

Usage: python examples/capture_plans.py OUT_DIR SUFFIX [name,name,...|headline] [SF_DIR]

Writes OUT_DIR/<name>_<SUFFIX>.txt for each query (r10 optimization-round
deliverable: plans/r10/<query>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "pricing_summary", "region_revenue", "top_customers_per_nation",
    "supplier_lineitem_window", "purchase_attribution_asof", "user_sessions",
    "customer_order_rollup", "campaign_order_attribution",
    "observations_pipeline", "docs_minhash_lsh", "docs_verified_near_dups",
    "docs_dup_groups", "docs_quality", "docs_unigram_logprob", "docs_chunks",
    "docs_line_dedup", "corpus_prepare", "media_feature_extract",
    "emb_cosine_topk", "emb_batch_topk", "docs_dup_spans", "docs_bm25_search",
]


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sel = sys.argv[3] if len(sys.argv) > 3 else "headline"
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"

    from impc_etl_spark.queries import QUERIES
    from impc_etl_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    names = HEADLINE if sel == "headline" else sel.split(",")
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        n_ex = txt.count("Exchange")
        joins = [k for k in (
            "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
            "BroadcastNestedLoopJoin", "CartesianProduct") if k in txt]
        py = [k for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                          "MapInArrow", "FlatMapGroupsInPandas") if k in txt]
        print(f"{name}: Exchange={n_ex} joins={joins} python={py}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
