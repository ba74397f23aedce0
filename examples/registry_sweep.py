"""Full-registry timing sweep: one noop-forced execution per registered
query, sorted slowest-first (guide §1: measure before touching anything).

Usage: python examples/registry_sweep.py [SF_DIR] [START:END]

Single-shot cold-ish timings (one shared session, queries run in registry
order) — this is a RANKING tool to find the outliers worth a careful
bench_isolate A/B, not a benchmark. Prints one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    span = sys.argv[2] if len(sys.argv) > 2 else ":"
    lo_s, _, hi_s = span.partition(":")

    from impc_etl_spark.queries import QUERIES
    from impc_etl_spark.session import get_spark

    names = list(QUERIES)
    lo = int(lo_s) if lo_s else 0
    hi = int(hi_s) if hi_s else len(names)
    names = names[lo:hi]

    spark = get_spark("registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for i, name in enumerate(names):
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}"[:200], flush=True)
            timings[name] = -1.0
            continue
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"[{lo + i + 1}/{lo + len(names)}] {name}: {dt:.3f}s", flush=True)

    ranked = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"metric": "registry_sweep_noop_sec", "sf_dir": sf_dir,
                      "total": round(sum(v for v in timings.values() if v > 0), 3),
                      "queries": ranked}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
