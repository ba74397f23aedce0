#!/usr/bin/env python
"""Hostile-input oracle parity sweep (r7; generalizes r6 ADVICE item 3).

The driver's correctness gate runs on clean synthetic testdata — columns
the generator never NULLs stay non-NULL, so an engine/oracle semantic
divergence on NULL handling is invisible to the gate (r6 ADVICE found
exactly this in events_psi_drift: Spark's sum(bool.cast) drops NULL-ts
rows, the oracle's CASE WHEN counted them). This sweep re-runs EVERY
registered query+oracle pair on a PERTURBED copy of sf0.001:

- events: 3% NULL ts, 3% NULL value, 2% NULL user_id (disjoint rows)
- documents: 3% NULL lang, 1% empty text, 1% whitespace-only text
- orders: 2% NULL o_comment
- lineitem: 2% NULL l_comment

Primary keys and join keys stay intact (NULL PKs are not a contract any
pipeline accepts). A pair that disagrees here has a LATENT divergence
that clean data can't show — each finding is either a real bug (fix the
engine/oracle pair) or an intentional semantic choice (document it in
the query docstring and align both sides).

Usage: python3 examples/hostile_parity.py [N|name,name,...] [src_sf_dir]
Prints per-query OK/FAIL and a one-line JSON summary, mimic-style.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

WORK = "/tmp/hostile_sf0.001"


def build_hostile(spark, src: str, dst: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t == "events":
            # disjoint deterministic row slices keyed on the PK
            m = F.pmod(F.col("event_id"), F.lit(100))
            df = df.withColumn(
                "ts", F.when(m < 3, F.lit(None)).otherwise(F.col("ts"))
            ).withColumn(
                "value",
                F.when((m >= 3) & (m < 6), F.lit(None)).otherwise(F.col("value")),
            ).withColumn(
                "user_id",
                F.when((m >= 6) & (m < 8), F.lit(None)).otherwise(F.col("user_id")),
            )
        elif t == "documents":
            m = F.pmod(F.col("doc_id"), F.lit(100))
            df = df.withColumn(
                "lang", F.when(m < 3, F.lit(None)).otherwise(F.col("lang"))
            ).withColumn(
                "text",
                F.when((m >= 3) & (m < 4), F.lit(""))
                .when((m >= 4) & (m < 5), F.lit("   \t  "))
                .otherwise(F.col("text")),
            )
        elif t == "orders":
            m = F.pmod(F.col("o_orderkey"), F.lit(100))
            df = df.withColumn(
                "o_comment", F.when(m < 2, F.lit(None)).otherwise(F.col("o_comment"))
            )
        elif t == "lineitem":
            m = F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"), F.lit(100))
            df = df.withColumn(
                "l_comment", F.when(m < 2, F.lit(None)).otherwise(F.col("l_comment"))
            )
        df.coalesce(1).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def main() -> int:
    sel = sys.argv[1] if len(sys.argv) > 1 else "all"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from impc_etl_spark.session import get_spark
    from impc_etl_spark import queries as q
    from examples.driver_mimic import _canon, _pandas_rows

    spark = get_spark()
    if not os.path.exists(f"{WORK}/events.parquet"):
        build_hostile(spark, src, WORK)
        print(json.dumps({"built": WORK}), flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{WORK}/{t}.parquet')"
        )

    if sel == "all":
        names = list(q.QUERIES)
    elif sel.isdigit():
        names = list(q.QUERIES)[: int(sel)]
    else:
        names = sel.split(",")

    results = {}
    for name in names:
        try:
            sdf = q.QUERIES[name](spark, WORK)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
            pdf = con.sql(q.ORACLE[name]).df()
            duck_cols = list(pdf.columns)
            duck_rows = _pandas_rows(pdf)
            rows_match = len(spark_rows) == len(duck_rows)
            schema_match = sorted(spark_cols) == sorted(duck_cols)
            hash_match = False
            if rows_match and schema_match:
                hash_match = _canon(spark_rows, spark_cols) == _canon(
                    duck_rows, duck_cols
                )
            ok = rows_match and schema_match and hash_match
            results[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(spark_rows),
                "oracle_rows": len(duck_rows),
            }
            print(
                f"{name}: {'OK' if ok else 'FAIL'} "
                f"spark={len(spark_rows)} duck={len(duck_rows)}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:160]}", flush=True)

    bad = [k for k, v in results.items() if v.get("err") or not v.get("hash_match")]
    print(json.dumps({"checked": len(names), "bad": bad}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
