#!/usr/bin/env python
"""End-to-end pipeline rehearsal above sf0.1 (r7 verdict item 6).

Per-query scale evidence lives in scale_rehearsal.py; what it can't see
is a full MULTI-STAGE run — parquet checkpoints between tasks, each
stage reading the previous stage's output — the Luigi-DAG shape of the
reference's real workload (workflow/main.py:75-127). This script runs
BOTH example pipelines (examples/release_pipeline.py, the
ImpcPreStatisticalAnalysis flow; examples/training_corpus_pipeline.py,
the LLM-corpus flow) against a K× replica of sf0.1 and records
per-task wall / shuffle / spill / input from the REST status API.

Usage: python3 examples/pipeline_rehearsal.py [K] [src_sf_dir]
Prints one JSON line per task plus a one-line summary per pipeline.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.scale_rehearsal import _stage_totals, scale_tables  # noqa: E402


def run_instrumented(p, goals, ui, app, reap: bool = True) -> list[dict]:
    """Run the pipeline task-by-task in topological order (each task's
    parents already materialized by the previous iterations) and measure
    REST stage-metric deltas around each parquet-to-parquet stage.

    ``reap`` (r10): delete a parent task's parquet once EVERY consumer
    in this run has completed (goals are never reaped) — the retention
    policy any production DAG store applies. Without it a K=300 release
    run accumulates >50 GB of dead interior checkpoints alongside the
    live shuffle dirs and exhausts this box's disk; peak footprint with
    reaping is the live frontier, which is also the honest 100 TB
    posture (nobody keeps every interior stage of a petabyte DAG)."""
    order = p._toposort(goals)
    consumers: dict[str, set] = {}
    for name in order:
        for dep in p._tasks[name].inputs:
            consumers.setdefault(dep, set()).add(name)
    goal_set = set(goals)
    done: set = set()
    rows = []
    for name in order:
        before = _stage_totals(ui, app)
        t0 = time.time()
        # execute the task body DIRECTLY (not p.run(name), whose full
        # ancestry walk would silently re-materialize reaped
        # grandparents): parents are guaranteed live here because a
        # task's parents always count it as a not-yet-done consumer
        t = p._tasks[name]
        parents = [p.spark.read.parquet(p.target(i)) for i in t.inputs]
        t.fn(p.spark, *parents).write.mode("overwrite").parquet(
            p.target(name))
        status = "ran"
        dt = time.time() - t0
        after = _stage_totals(ui, app)
        delta = {k: after[k] - before[k] for k in before}
        rec = {
            "task": name,
            "status": status,
            "sec": round(dt, 2),
            "rows": p.read(name).count(),
            "shuffle_write_mb": round(delta["shuffleWriteBytes"] / 1e6, 1),
            "spill_disk_mb": round(delta["diskBytesSpilled"] / 1e6, 1),
            "input_mb": round(delta["inputBytes"] / 1e6, 1),
        }
        done.add(name)
        if reap:
            for dep in p._tasks[name].inputs:
                if dep not in goal_set and consumers.get(dep, set()) <= done:
                    shutil.rmtree(p.target(dep), ignore_errors=True)
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    return rows


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = f"/tmp/sfscale_x{k}"

    from examples.release_pipeline import build as build_release
    from examples.training_corpus_pipeline import build as build_corpus
    from impc_etl_spark.session import get_spark

    spark = get_spark(
        "pipeline-rehearsal", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{dst}/lineitem.parquet"):
        scale_tables(spark, src, dst, k)
        print(json.dumps({"scaled": dst, "k": k}), flush=True)

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    pipelines = [
        ("release", build_release,
         ["stats_input", "release_diff", "solr_docs", "mongo_docs"]),
        ("corpus", build_corpus,
         ["profile", "indexed", "packed", "features", "tokenizer",
          "splits", "extracted", "gopher_gate", "quality_model", "mixed",
          "curriculum"]),
    ]
    for label, build, goals in pipelines:
        out_dir = f"/tmp/pipe_rehearsal_{label}_x{k}"
        shutil.rmtree(out_dir, ignore_errors=True)
        p = build(spark, dst, out_dir)
        t0 = time.time()
        rows = run_instrumented(p, goals, ui, app)
        print(json.dumps({
            "pipeline": label,
            "k": k,
            "equivalent_sf": 0.1 * k,
            "tasks": len(rows),
            "total_sec": round(time.time() - t0, 1),
            "total_shuffle_write_mb": round(
                sum(r["shuffle_write_mb"] for r in rows), 1),
            "total_spill_disk_mb": round(
                sum(r["spill_disk_mb"] for r in rows), 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
