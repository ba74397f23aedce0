"""Mirror of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.001 (fast), compare row count,
column names, and order-insensitive values.

This is the engine's golden-output harness (SURVEY.md §5 implication): if
this passes at sf0.001 it should pass the driver's sf0.01 check identically.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    # reject unhashable cells (lists/dicts) the way the driver's pandas
    # factorizer does
    hash(v)
    # pandas renders missing cells as NaN/NaT/None depending on dtype;
    # collapse them all to None
    if v is None or v != v:
        return None
    if isinstance(v, float):
        # collapse -0.0/0.0 and represent at fixed precision
        return f"{v + 0.0:.6f}"
    return v


def _pandas_rows(pdf):
    """Flatten a pandas frame to plain-Python row tuples the way the
    driver's canonicalizer sees them — dtype-preserving, so a DuckDB
    HUGEINT rendered as float64 DIFFERS from Spark's int64 exactly as
    it does in the driver (r6's docs_sized_json_roundtrip red row)."""
    cols = [pdf[c].tolist() for c in pdf.columns]
    return list(zip(*cols)) if cols else [()] * len(pdf)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def _all_pairs():
    from impc_etl_spark import queries as q

    for name in q.QUERIES:
        if name in q.ORACLE:
            yield name


# Queries whose operators have nondeterminism POTENTIAL (set collection,
# iterative convergence, sampling of plan-dependent state): always in the
# fast-mode oracle subset, and additionally pinned run-stable below.
RISK_PRONE = [
    "nation_segments_bundle", "customer_order_bundle", "salted_segment_bundles",
    "nation_bounded_segments", "docs_minhash_lsh", "docs_dup_groups",
    "emb_ivf_topk", "customer_key_ancestry",
    # round-3 iterative / sketch ops: Lloyd trajectories, BPE merge loops,
    # CC-keyed splits, counter grids — all must be run-stable
    "corpus_bpe_merges", "docs_group_safe_split", "emb_kmeans_assign",
    "emb_pq_codes", "orders_customer_cms", "part_copurchase_triangles",
]


def _gate_pairs():
    """Fast mode: every 4th registry entry (insertion order) + the whole
    headline bench set + the determinism-risk subset — ~90 queries, so the
    default `pytest tests/` replay fits the external gate's budget. Full
    298-query replay under SPARK_GRAFT_TEST_FULL=1 (builder sessions) or
    via examples/driver_mimic.py."""
    from examples.capture_plans import HEADLINE

    from tests.conftest import fast_subset

    return fast_subset(_all_pairs(), always=set(HEADLINE) | set(RISK_PRONE))


@pytest.mark.parametrize("name", list(_gate_pairs()))
def test_query_matches_oracle(spark, name):
    from impc_etl_spark import queries as q

    sdf = q.QUERIES[name](spark, SF_SMOKE)
    # toPandas, NOT collect: the driver canonicalizes BOTH sides through
    # pandas — an int column WITH nulls upcasts to float64 on both sides
    # and matches (driver-green precedent: purchase_attribution_asof),
    # while a no-null int64 against a HUGEINT-induced float64 mismatches
    # (r6's red row). collect() would get both cases wrong.
    spdf = sdf.toPandas()
    spark_rows = _pandas_rows(spdf)
    spark_cols = list(spdf.columns)

    con = _duck(SF_SMOKE)
    # .df(): go through pandas like the real driver — fetchall() yields
    # Python ints for HUGEINT and hides int-vs-float rendering bugs
    pdf = con.sql(q.ORACLE[name]).df()
    duck_cols = list(pdf.columns)
    duck_rows = _pandas_rows(pdf)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sc = _canon(spark_rows, spark_cols)
    dc = _canon(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
    assert sc == dc, f"{name}: value mismatch, first diffs: {mismatches}"


def test_every_query_has_entry_or_documented_exception():
    from impc_etl_spark import queries as q

    no_oracle = set(q.QUERIES) - set(q.ORACLE)
    # r4: zero exceptions — the gz bundle round-trips to a comparable
    # string inside the plan, and the HLL query self-checks its bound
    assert not no_oracle, no_oracle


# RISK_PRONE (defined above): assert two executions in one session agree.
# A full-registry audit at sf0.01 found zero nondeterministic queries;
# this keeps the risky subset pinned in CI.
@pytest.mark.parametrize("name", RISK_PRONE)
def test_deterministic_across_runs(spark, name):
    from impc_etl_spark import queries as q

    def canon(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    assert canon(q.QUERIES[name](spark, SF_SMOKE)) == canon(q.QUERIES[name](spark, SF_SMOKE))
