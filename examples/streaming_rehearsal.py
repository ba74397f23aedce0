#!/usr/bin/env python
"""Streaming-sink rehearsal (r10 verdict item 6): the five stateful sinks
(upsert / scd2 / dedup-ingest / sketch / incremental-agg, plus moments)
had never appeared in any bench — this drives each one end-to-end with
Trigger.AvailableNow over a multi-wave file stream and records wall
time, rows/sec, and shuffle/spill deltas from the REST status API.

Usage:
    python3 examples/streaming_rehearsal.py [K] [src_dir] [waves]

K (default 1) reuses scale_rehearsal's key-shifted replica generator, so
K=10 rehearses an sf1-equivalent stream. ``waves`` (default 8) is the
number of source files; with maxFilesPerTrigger=1 each wave becomes its
own micro-batch, so the versioned stores execute their per-batch merge
path ``waves`` times (the continuous-ingestion shape, not one giant
batch). Prints one JSON line per sink plus a trailing summary; paste the
summary into SCALE.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(ui: str, app: str) -> dict:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    keys = ("shuffleReadBytes", "shuffleWriteBytes", "memoryBytesSpilled",
            "diskBytesSpilled", "inputBytes")
    return {k: sum(s.get(k, 0) for s in stages) for k in keys}


def _stage_waves(spark, df, dst: str, waves: int) -> str:
    """Write df as exactly ``waves`` parquet files under dst/ (one file
    per micro-batch for a maxFilesPerTrigger=1 stream)."""
    tmp = dst + "_tmp"
    df.repartition(waves).write.mode("overwrite").parquet(tmp)
    os.makedirs(dst, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(f"{tmp}/part-*.parquet"))):
        shutil.copy(f, os.path.join(dst, f"wave-{i:03d}.parquet"))
    shutil.rmtree(tmp)
    return dst


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    waves = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from impc_etl_spark.session import get_spark
    from impc_etl_spark.streaming import jobs as J

    spark = get_spark(
        "impc-etl-spark-streaming-rehearsal",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    data = src
    if k > 1:
        data = f"/tmp/sfscale_x{k}"
        if not os.path.exists(f"{data}/lineitem.parquet"):
            from examples.scale_rehearsal import scale_tables

            t0 = time.time()
            scale_tables(spark, src, data, k)
            print(json.dumps({"scaled": data, "k": k,
                              "gen_sec": round(time.time() - t0, 1)}))

    work = tempfile.mkdtemp(prefix="stream_rehearsal_")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    # --- stage the three stream sources as N-wave file dirs -------------
    from impc_etl_spark.queries import _events

    events = _events(spark, data)
    n_events = events.count()
    docs = spark.read.parquet(f"{data}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()
    emb = spark.read.parquet(f"{data}/embeddings.parquet").select("vec_id", "embedding")
    n_emb = emb.count()
    ev_dir = _stage_waves(spark, events, f"{work}/events_src", waves)
    doc_dir = _stage_waves(spark, docs, f"{work}/docs_src", waves)
    emb_dir = _stage_waves(spark, emb, f"{work}/emb_src", waves)

    def ev_stream():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1").parquet(ev_dir)
        )

    def doc_stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1").parquet(doc_dir)
        )

    def emb_stream():
        return (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", "1").parquet(emb_dir)
        )

    sinks = {
        "upsert_sink": (n_events, lambda d: J.upsert_sink(
            ev_stream(), f"{d}/store", ["user_id"], f"{d}/ckpt",
            dedup_order=["ts", "event_id"])),
        "scd2_sink": (n_events, lambda d: J.scd2_sink(
            ev_stream(), f"{d}/store", ["user_id"], "ts",
            ["event_type"], f"{d}/ckpt")),
        "dedup_ingest_sink": (n_docs, lambda d: J.dedup_ingest_sink(
            doc_stream(), f"{d}/store", f"{d}/ckpt")),
        "dedup_ingest_sink_near": (n_docs, lambda d: J.dedup_ingest_sink(
            doc_stream(), f"{d}/store", f"{d}/ckpt", near=True)),
        "sketch_sink": (n_events, lambda d: J.sketch_sink(
            ev_stream(), f"{d}/store", f"{d}/ckpt", "user_id")),
        "incremental_agg_sink": (n_events, lambda d: J.incremental_agg_sink(
            ev_stream(), f"{d}/store", f"{d}/ckpt", ["event_type"],
            {"n": ("count", "event_id"), "sum_value": ("sum", "value"),
             "max_value": ("max", "value")})),
        "moments_sink": (n_emb, lambda d: J.moments_sink(
            emb_stream(), f"{d}/store", f"{d}/ckpt")),
    }

    results = {}
    total = 0.0
    for name, (n_rows, run) in sinks.items():
        d = f"{work}/{name}"
        os.makedirs(d, exist_ok=True)
        before = _stage_totals(ui, app)
        t0 = time.time()
        run(d)
        dt = time.time() - t0
        after = _stage_totals(ui, app)
        delta = {kk: after[kk] - before[kk] for kk in before}
        store = J.current_store_path(f"{d}/store")
        out_rows = spark.read.parquet(store).count() if store else 0
        rec = {
            "sink": name, "sec": round(dt, 2),
            "in_rows": n_rows, "out_rows": out_rows,
            "rows_per_sec": round(n_rows / dt, 1),
            "waves": waves,
            "shuffle_write_mb": round(delta["shuffleWriteBytes"] / 1e6, 1),
            "spill_disk_mb": round(delta["diskBytesSpilled"] / 1e6, 1),
        }
        results[name] = rec
        total += dt
        print(json.dumps(rec), flush=True)

    print(json.dumps({
        "metric": "streaming_rehearsal_total_sec",
        "value": round(total, 1),
        "k": k,
        "waves": waves,
        "sinks_sec": {s: r["sec"] for s, r in results.items()},
        "total_spill_disk_mb": round(
            sum(r["spill_disk_mb"] for r in results.values()), 1),
    }))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
