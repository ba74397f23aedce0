"""Mart assembly: dimension enrichment + rule-based annotation.

Two reference patterns generalized:

- ``enrich`` — the reference's ``map_to_stats`` (jobs/load/solr/
  stats_results_mapper.py:1053+) repeated per dimension: join a fact to a
  dimension on a key, project a renamed/prefixed column subset into the
  widening mart. Here it is one operator with explicit broadcast for small
  dims (the reference lets Catalyst guess; at 100 TB the dims — impress,
  ontology, colonies — are always broadcast-able and the fact never is).

- ``rule_calls`` — the reference's manual-statistics family (fertility /
  viability / embryo / histopath, stats_results_mapper.py:1465-2638):
  threshold counts per group + a first-match-wins rule ladder producing
  (call, p_value, effect_size)-style annotations. Declarative rule rows
  compile to ONE when/otherwise chain — a single aggregation shuffle, no
  UDFs, no driver logic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    mapping: dict[str, str],
    how: str = "left_outer",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join ``dim`` onto ``fact`` and add ``mapping`` columns
    ({mart_name: dim_expr}); all other dim columns are dropped.

    ``broadcast_dim=True`` forces a broadcast hash join — dimension tables
    in this engine are small by contract and must never shuffle the fact.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    joined = fact.join(d, on, how)
    keep = [fact[c] for c in fact.columns]
    adds = [F.expr(src).alias(dst) for dst, src in mapping.items()]
    return joined.select(*keep, *adds)


def rule_calls(
    df: DataFrame,
    group_keys: Sequence[str],
    measures: dict[str, Column],
    rules: Sequence[tuple[Column, dict[str, Column]]],
    defaults: dict[str, Column],
) -> DataFrame:
    """Grouped rule ladder: aggregate ``measures`` per ``group_keys``, then
    emit one annotation column set via first-match-wins ``rules``.

    ``rules`` rows are (condition_over_measures, {out_col: value}); every
    out_col must appear in ``defaults``. Compiles to a single
    groupBy().agg() + one projection of when-chains.
    """
    agg = df.groupBy(*group_keys).agg(*[c.alias(n) for n, c in measures.items()])
    out_cols = []
    for name, default in defaults.items():
        expr = None
        for cond, outs in rules:
            val = outs.get(name, default)
            expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        out_cols.append((expr.otherwise(default) if expr is not None else default).alias(name))
    return agg.select(*group_keys, *[F.col(n) for n in measures], *out_cols)
