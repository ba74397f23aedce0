"""Hostile-input parity regression (r7).

The full-registry sweep lives in examples/hostile_parity.py (257/257
green as of r7). This test pins the NULL/empty-input-sensitive subset —
every pair the r7 sweep found divergent plus the NULL-int rendering
representatives — against a freshly built perturbed copy of sf0.001, so
a future edit cannot silently reintroduce one of the three systematic
divergence classes:

- Spark ORDER BY is NULLS FIRST, DuckDB is NULLS LAST
- oracle equi-joins / recursive CTEs drop NULL keys that Spark's
  PARTITION BY groups together
- DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
- DuckDB json_extract throws on malformed JSON, Spark parses to NULL

The comparison path is the driver-faithful one (both sides through
pandas — see tests/test_oracle_parity.py).
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tests.test_oracle_parity import _canon, _pandas_rows

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Every pair the r7 hostile sweep flagged (now fixed), plus NULL-int
# rendering representatives that exercise the pandas float64 upcast.
SENSITIVE = [
    "docs_xml_roundtrip", "docs_tsv_roundtrip", "docs_csv_roundtrip",
    "docs_single_csv_roundtrip", "docs_single_text_roundtrip",
    "docs_sized_json_roundtrip",
    "events_value_zscore", "events_funnel", "events_holt_linear",
    "events_value_ewma", "user_sessions", "user_session_conversion",
    "hourly_event_stats", "sliding_event_counts", "events_psi_drift",
    "purchase_attribution_asof", "purchase_attribution_windowed",
    "docs_incremental_dedup", "docs_fingerprint", "docs_winnowing",
    "docs_crawl_diff", "docs_c4_clean", "docs_boilerplate_extract",
    "docs_priority_sample", "stats_results_mart",
    "docs_corrupt_json_ingest", "media_binaryfile_ingest",
    "docs_hybrid_rrf_search", "docs_provenance_stamp",
    "docs_schema_evolution_roundtrip", "null_tolerant_join",
    "customer_order_gaps",
    # malformed-JSON props: Spark parses to NULL, DuckDB's extractor
    # throws — oracles carry a json_valid guard
    "events_json_extract", "statpacket_restructure",
    # NULL dimension strings: match-level join priority (a matched row's
    # NULL value must not fall through), NULL-in vs no-match regex
    # extraction, concat_ws NULL-skip
    "priority_customer_lookup", "clerk_string_surface",
    # r9: NULL-ts/value recurrence state carry (the ewma contract) and
    # the NULL-int alarm rendering
    "events_cusum_changepoints",
    # r10: the hostile fixture now injects real NaN into events.value
    # (event_id % 100 == 11) — the pairs the NaN sweep flagged are fixed
    # by the NaN-as-NULL bad-point contract (nanvl / NOT isnan on both
    # engines) and mostly already pinned above; trend_slope is the one
    # NaN-sensitive pair not previously in this list
    "events_trend_slope",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    from examples.hostile_parity import build_hostile

    dst = str(tmp_path_factory.mktemp("hostile"))
    build_hostile(SF_SMOKE, dst)
    return dst


@pytest.fixture(scope="module")
def hostile_con(hostile_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{hostile_dir}/{t}.parquet')"
        )
    return con


# Fast mode replays every 3rd sensitive pair (the list interleaves the
# divergence classes, so a stride keeps one+ representative per class);
# SPARK_GRAFT_TEST_FULL=1 replays all of them. The full-registry hostile
# sweep stays in examples/hostile_parity.py for builder sessions.
from tests.conftest import fast_subset  # noqa: E402


@pytest.mark.parametrize("name", fast_subset(SENSITIVE, stride=3))
def test_hostile_parity(spark, hostile_dir, hostile_con, name):
    from impc_etl_spark import queries as q

    spdf = q.QUERIES[name](spark, hostile_dir).toPandas()
    spark_rows = _pandas_rows(spdf)
    spark_cols = list(spdf.columns)

    pdf = hostile_con.sql(q.ORACLE[name]).df()
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
    assert sc == dc, f"{name}: value mismatch on hostile input: {mismatches}"
