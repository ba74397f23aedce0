"""Audit every registered query's FINAL plan for repeated base-table scans
and join/python shapes.

Usage: python examples/scan_audit.py [SF_DIR] [min_repeat]

For each query, counts `FileScan parquet .../<table>.parquet` occurrences
per table in the analyzed plan; prints queries where any table is scanned
>= min_repeat times (default 3) — the duplicate-subtree smell (Catalyst
has no cross-tree CSE, so N consumers of one derived frame = N scans
unless the frame is materialized). 2 scans are often legitimate
(skew-safe recompute in dup_spans, decided by measurement), 3+ rarely are.
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    min_repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from impc_etl_spark.queries import QUERIES
    from impc_etl_spark.session import get_spark

    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = {}
    for name, fn in QUERIES.items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}"[:200], flush=True)
            continue
        tables = Counter(
            m.group(1)
            for m in re.finditer(r"FileScan parquet [^\n]*?(\w+)\.parquet", plan)
        )
        hot = {t: c for t, c in tables.items() if c >= min_repeat}
        if hot:
            flagged[name] = hot
            print(f"{name}: {hot}", flush=True)
    print(json.dumps({"flagged": flagged, "n": len(flagged)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
