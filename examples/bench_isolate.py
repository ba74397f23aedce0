"""Isolation bench: time named queries with the noop sink (guide §1.4).

Usage: python examples/bench_isolate.py [name,name,...|headline] [SF_DIR] [REPS]

Unlike bench.py (the driver contract, count()-forced), this forces EVERY
column of every row through the plan with the noop data source, which is
the honest cost of the computation; used for before/after isolation
measurements inside the optimization rounds. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.capture_plans import HEADLINE  # noqa: E402


def main() -> int:
    sel = sys.argv[1] if len(sys.argv) > 1 else "headline"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from impc_etl_spark.queries import QUERIES
    from impc_etl_spark.session import get_spark

    spark = get_spark("bench-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    names = HEADLINE if sel == "headline" else sel.split(",")

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        # warm (JIT, python workers)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        done = 0
        measured = 0.0
        while done < reps or (reps > 1 and measured < 2.0 and done < 15):
            spark.sparkContext.setJobDescription(f"bench:{name}:{done}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = min(best, dt)
            measured += dt
            done += 1
        timings[name] = round(best, 3)
        print(f"{name}: {best:.3f}s ({done} reps)", flush=True)
    print(json.dumps({"metric": "isolate_noop_sec", "queries": timings,
                      "sf_dir": sf_dir, "total": round(sum(timings.values()), 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
