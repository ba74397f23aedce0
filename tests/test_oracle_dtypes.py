"""Oracle output-type audit (r6 verdict items 1 and 7).

The driver canonicalizes BOTH engines' results through pandas before
hashing. DuckDB types that pandas renders differently from any Spark
output type are therefore hash-poison even when the VALUES are equal:

- HUGEINT (what an uncast ``sum(BIGINT)`` returns) → pandas float64,
  so Spark's int64 ``149174`` hashes against ``149174.0`` and the row
  goes red with rows+schema green (r6's only driver failure,
  ``docs_sized_json_roundtrip``).
- DECIMAL → pandas object-of-Decimal, which stringifies differently
  from Spark's double.

This test runs every registered oracle through DuckDB at sf0.001 and
asserts no output column carries one of those types — the commit-time
guard that would have caught r6's red row (and DID catch two more
latent ones when first written: ``events_dau_mau_stickiness.dau_sum``
and ``docs_contamination_score.n_hits``). Fix is always the same:
``CAST(sum(...) AS BIGINT)`` (or ``::DOUBLE`` when the Spark side is
floating).

No Spark session needed — this is pure-DuckDB and runs in seconds.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB logical types whose pandas rendering can NEVER match a Spark
# result hashed through the same pandas path.
FORBIDDEN_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def _names():
    from impc_etl_spark import queries as q

    return [n for n in q.QUERIES if n in q.ORACLE]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", _names())
def test_oracle_dtypes_hash_compatible(con, name):
    from impc_etl_spark import queries as q

    rel = con.sql(q.ORACLE[name])
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper().startswith(FORBIDDEN_PREFIXES)
    ]
    assert not offenders, (
        f"{name}: oracle output column(s) {offenders} would render as "
        f"float64/Decimal in the driver's pandas canonicalizer and can "
        f"never hash-match Spark — wrap in CAST(... AS BIGINT/DOUBLE)"
    )
