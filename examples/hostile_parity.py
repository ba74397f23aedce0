#!/usr/bin/env python
"""Hostile-input oracle parity sweep (r7; generalizes r6 ADVICE item 3).

The driver's correctness gate runs on clean synthetic testdata — columns
the generator never NULLs stay non-NULL, so an engine/oracle semantic
divergence on NULL handling is invisible to the gate (r6 ADVICE found
exactly this in events_psi_drift: Spark's sum(bool.cast) drops NULL-ts
rows, the oracle's CASE WHEN counted them). This sweep re-runs EVERY
registered query+oracle pair on a PERTURBED copy of sf0.001:

- events: 3% NULL ts, 3% NULL value, 2% NULL user_id, 2% malformed
  props JSON + 1% NULL props (disjoint rows)
- documents: 3% NULL lang, 1% empty text, 1% whitespace-only text
- orders: 2% NULL o_orderpriority
- lineitem: 2% NULL l_returnflag
- customer: 2% NULL c_name, 2% NULL c_mktsegment (disjoint)
- part: 2% NULL p_type

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



def build_hostile(src: str, dst: str) -> None:
    """Write the perturbed copy with DuckDB so each table lands as ONE
    file named exactly {t}.parquet, like the driver's testdata —
    input_file_name()-based queries (provenance stamps) must see the
    same basename the oracle hardcodes."""
    os.makedirs(dst, exist_ok=True)
    mutate = {
        "events": """
            SELECT event_id,
                   CASE WHEN event_id % 100 < 3 THEN NULL ELSE ts END AS ts,
                   CASE WHEN event_id % 100 BETWEEN 6 AND 7
                        THEN NULL ELSE user_id END AS user_id,
                   event_type,
                   CASE WHEN event_id % 100 BETWEEN 3 AND 5 THEN NULL
                        WHEN event_id % 100 = 11 THEN CAST('NaN' AS DOUBLE)
                        ELSE value END AS value,
                   CASE WHEN event_id % 100 BETWEEN 8 AND 9 THEN '{bad json'
                        WHEN event_id % 100 = 10 THEN NULL
                        ELSE props END AS props""",
        "documents": """
            SELECT doc_id,
                   CASE WHEN doc_id % 100 = 3 THEN ''
                        WHEN doc_id % 100 = 4 THEN '   \t  '
                        ELSE text END AS text,
                   CASE WHEN doc_id % 100 < 3 THEN NULL ELSE lang END AS lang,
                   source, n_chars""",
        "orders": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate,
                   CASE WHEN o_orderkey % 100 < 2
                        THEN NULL ELSE o_orderpriority END AS o_orderpriority""",
        "customer": """
            SELECT c_custkey,
                   CASE WHEN c_custkey % 100 < 2 THEN NULL ELSE c_name END
                     AS c_name,
                   c_nationkey, c_acctbal,
                   CASE WHEN c_custkey % 100 BETWEEN 2 AND 3
                        THEN NULL ELSE c_mktsegment END AS c_mktsegment""",
        "part": """
            SELECT p_partkey, p_name, p_brand,
                   CASE WHEN p_partkey % 100 < 2 THEN NULL ELSE p_type END
                     AS p_type,
                   p_size, p_retailprice""",
        "lineitem": """
            SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
                   l_quantity, l_extendedprice, l_discount, l_tax,
                   CASE WHEN (l_orderkey * 7 + l_linenumber) % 100 < 2
                        THEN NULL ELSE l_returnflag END AS l_returnflag,
                   l_linestatus, l_shipdate""",
    }
    con = duckdb.connect()
    for t in TABLES:
        body = mutate.get(t, "SELECT *")
        con.sql(
            f"COPY ({body} FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )


def _mutate_fingerprint() -> str:
    """Hash of build_hostile's source so the work dir is keyed to the
    CURRENT mutate rules — editing them invalidates the cached copy
    instead of silently sweeping stale perturbations (r7 ADVICE)."""
    import hashlib
    import inspect

    return hashlib.sha256(
        inspect.getsource(build_hostile).encode()
    ).hexdigest()[:12]


def main() -> int:
    sel = sys.argv[1] if len(sys.argv) > 1 else "all"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    work = (
        "/tmp/hostile_"
        + os.path.basename(src.rstrip("/"))
        + "_"
        + _mutate_fingerprint()
    )

    from impc_etl_spark.session import get_spark
    from impc_etl_spark import queries as q
    from examples.driver_mimic import _canon, _pandas_rows

    spark = get_spark()
    if not os.path.exists(f"{work}/events.parquet"):
        build_hostile(src, work)
        print(json.dumps({"built": work}), flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{work}/{t}.parquet')"
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
            sdf = q.QUERIES[name](spark, work)
            # toPandas on BOTH sides, like the driver (see driver_mimic)
            spdf = sdf.toPandas()
            spark_rows = _pandas_rows(spdf)
            spark_cols = list(spdf.columns)
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
