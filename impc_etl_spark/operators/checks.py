"""Declarative data-quality checks (Deequ/dbt-test shape).

The reference's correctness net is release-diff jobs plus manual
``show()`` inspection (SURVEY.md §5 — `jobs/compare/dr_diff.py`, the
stats-loader cross-check); this module turns that pattern into
first-class, composable expectations that run INSIDE a pipeline:
each check contributes ONE conditional aggregate, so a whole suite is a
single scan + single reduce over the table — no per-check job, no
collect of violating rows unless explicitly sampled.

At 100 TB that property is the whole design: `run_checks` over N
expectations is one map-side-combined aggregation pass; `violations`
(row-level debugging) is a filter you run on demand, not as the gate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: ``name`` + a boolean row ``predicate`` that must
    hold on every row (nulls count as violations)."""

    name: str
    predicate: Column

    def violation(self) -> Column:
        return (~F.coalesce(self.predicate, F.lit(False))).cast("long")


def not_null(*cols: str) -> list[Check]:
    return [Check(f"not_null_{c}", F.col(c).isNotNull()) for c in cols]


def unique_key(*cols: str) -> Check:
    """Key uniqueness — the one check that needs a shuffle, expressed as a
    window count so it still composes into the single aggregation pass
    (the exchange is on the key being checked)."""
    from pyspark.sql import Window

    n = F.count(F.lit(1)).over(Window.partitionBy(*[F.col(c) for c in cols]))
    return Check("unique_" + "_".join(cols), n == 1)


def accepted_values(col: str, values: list) -> Check:
    return Check(
        f"accepted_{col}", F.col(col).isin(values) | F.col(col).isNull()
    )


def in_range(col: str, lo=None, hi=None) -> Check:
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(col) >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(col) <= F.lit(hi))
    return Check(f"range_{col}", cond | F.col(col).isNull())


def matches(col: str, pattern: str) -> Check:
    return Check(
        f"matches_{col}", F.col(col).rlike(pattern) | F.col(col).isNull()
    )


def bind_referential(
    df: DataFrame, col: str, dim: DataFrame, dim_key: str, name: str | None = None
) -> tuple[DataFrame, Check]:
    """Attach a ``__fk_ok_<col>`` flag via a broadcast left-semi-style
    join and return (df', Check) — the fact table never shuffles."""
    flag = f"__fk_ok_{col}"
    marked = df.join(
        F.broadcast(
            dim.select(F.col(dim_key).alias(col)).distinct()
            .withColumn(flag, F.lit(True))
        ),
        col,
        "left",
    ).withColumn(flag, F.coalesce(F.col(flag), F.lit(False)))
    return marked, Check(name or f"referential_{col}", F.col(flag))


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate ALL checks in one aggregation pass: returns one row per
    check — (check_name, n_rows, n_violations, pass). Map-side combine makes
    this a single scan + single tiny reduce regardless of how many
    expectations are registered."""
    if not checks:
        raise ValueError("run_checks needs at least one Check")
    # violation flags materialize in a projection first: window-backed
    # checks (unique_key) may not appear inside an aggregate expression
    tagged = df.select(
        *[c.violation().alias(f"__f_{i}") for i, c in enumerate(checks)]
    )
    agg = tagged.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(f"__f_{i}").alias(f"__v_{i}") for i in range(len(checks))],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v_{i}").alias("n_violations"),
                (F.col(f"__v_{i}") == 0).alias("pass"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


def violations(df: DataFrame, checks: list[Check], limit: int | None = 100) -> DataFrame:
    """Row-level debugging view: rows failing ANY check, tagged with the
    list of failed check names. Run on demand — not part of the gate."""
    failed = F.filter(
        F.array(
            *[
                F.when(c.violation() == 1, F.lit(c.name))
                for c in checks
            ]
        ),
        lambda x: x.isNotNull(),
    )
    out = df.withColumn("failed_checks", failed).where(F.size("failed_checks") > 0)
    return out.limit(limit) if limit else out
