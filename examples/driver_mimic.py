"""Mimic the driver's correctness gate at sf0.01 over the first N registry
entries (the driver's checked window): run each queries() entry on Spark and
its oracle_sql() on DuckDB, compare rows / columns / order-insensitive values.

Usage: python examples/driver_mimic.py [N] [SF_DIR]
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


def _norm(v):
    # The real driver loads cells into pandas and factorizes them for the
    # hash-compare; list/dict cells make PyObjectHashTable raise
    # "unhashable type". Reproduce that rejection here so an array-typed
    # output column fails the mimic BEFORE it fails the driver.
    hash(v)
    # pandas renders missing cells as NaN/NaT/None depending on dtype;
    # collapse all of them to None like the driver's factorizer does
    if v is None or v != v:  # NaN/NaT are not equal to themselves
        return None
    if isinstance(v, float):
        return f"{v + 0.0:.6f}"
    return v


def _pandas_rows(pdf):
    """Flatten a pandas frame to plain-Python row tuples the way the
    driver's canonicalizer sees them: dtype-preserving (an int64 column
    yields ints, a float64 column yields floats — so a DuckDB HUGEINT
    that pandas renders as float64 DIFFERS from Spark's int64, exactly
    as in the driver; r6's docs_sized_json_roundtrip red row)."""
    cols = [pdf[c].tolist() for c in pdf.columns]
    return list(zip(*cols)) if cols else [()] * len(pdf)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def main() -> int:
    sel = sys.argv[1] if len(sys.argv) > 1 else "50"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from impc_etl_spark.session import get_spark
    from impc_etl_spark import queries as q

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results = {}
    # first-N window (digits) or an explicit comma-separated name list
    names = list(q.QUERIES)[: int(sel)] if sel.isdigit() else sel.split(",")
    for name in names:
        try:
            sdf = q.QUERIES[name](spark, sf_dir)
            # toPandas, NOT collect: the driver canonicalizes BOTH sides
            # through pandas, so an int column WITH nulls upcasts to
            # float64 on both sides and matches (driver-green precedent:
            # purchase_attribution_asof), while a no-null int64 against a
            # HUGEINT-induced float64 mismatches (r6's red row). collect()
            # would get both cases wrong.
            spdf = sdf.toPandas()
            spark_rows = _pandas_rows(spdf)
            spark_cols = list(spdf.columns)
            if name not in q.ORACLE:
                results[name] = {"rows": len(spark_rows), "oracle": None}
                print(f"{name}: NO-ORACLE rows={len(spark_rows)}", flush=True)
                continue
            # .df(): go through pandas like the real driver does —
            # fetchall() yields Python ints for HUGEINT and hides the
            # int-vs-float rendering divergence that cost r6 a red row
            pdf = con.sql(q.ORACLE[name]).df()
            duck_cols = list(pdf.columns)
            duck_rows = _pandas_rows(pdf)
            rows_match = len(spark_rows) == len(duck_rows)
            schema_match = sorted(spark_cols) == sorted(duck_cols)
            hash_match = False
            if rows_match and schema_match:
                hash_match = _canon(spark_rows, spark_cols) == _canon(duck_rows, duck_cols)
            results[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(spark_rows),
                "oracle_rows": len(duck_rows),
            }
            flag = "OK" if (rows_match and schema_match and hash_match) else "FAIL"
            print(f"{name}: {flag} spark={len(spark_rows)} duck={len(duck_rows)}", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)

    bad = [k for k, v in results.items() if v.get("err") or v.get("hash_match") is False]
    print(json.dumps({"checked": len(names), "bad": bad}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
