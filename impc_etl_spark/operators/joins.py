"""Join operators: multi-key, null-safe, priority lookup, as-of nearest.

Shapes from SURVEY.md §2.3:

- J1 multi-key equi joins — thin helpers, Catalyst plans them.
- J2 null-tolerant equality — ``eqNullSafe``.
- J3 disjunctive (OR-key) lookup — the reference joins on
  ``a==x OR b==y OR c==z`` (observation_mapper.py:1293-1309), which forces
  a nested-loop-ish plan; its own TODO (:1328-1330) asks for what
  ``priority_lookup_join`` does: one equi join per key, first match wins.
- J8 as-of / nearest join — the body-weight association
  (experiment_bw_age_calculator.py:113-396) collects candidate structs and
  picks the closest in a Python UDF; ``asof_join`` re-expresses it as a
  range equi-join + window row_number: fully distributed, no UDF, and the
  range predicate keeps the join selective at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def equi_join(left: DataFrame, right: DataFrame, on: Sequence[str], how: str = "left_outer",
              broadcast_right: bool = False) -> DataFrame:
    """Multi-key equi join; ``broadcast_right=True`` hints a map-side join
    for small dimensions (impress/ontology/colony-sized inputs)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list(on), how=how)


def null_safe_condition(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> Column:
    """Build an ``eqNullSafe`` conjunction over shared key names — replaces
    the reference's hand-rolled ``isNull() & isNull() | a==b`` sequences
    (observation_mapper.py:909-924)."""
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else (cond & c)
    return cond


def priority_lookup_join(
    left: DataFrame,
    right: DataFrame,
    key_pairs: Sequence[tuple[str, str]],
    value_cols: Sequence[str],
    broadcast_right: bool = True,
) -> DataFrame:
    """Disjunctive lookup as N priority-ordered equi joins + coalesce.

    For each ``(left_key, right_key)`` pair, in priority order, attempt an
    equi join; the first successful match supplies ``value_cols``. This is
    the scalable replacement for OR-condition joins (J3): every probe is a
    hash join on one key (broadcastable when the lookup side is a dim),
    instead of one non-equi join that degenerates to nested loops.
    """
    out = left
    staged: list[list[str]] = []
    for i, (lk, rk) in enumerate(key_pairs):
        alias_cols = [F.col(rk).alias(f"__pk_{i}")] + [
            F.col(v).alias(f"__v{i}_{v}") for v in value_cols
        ]
        dim = right.select(*alias_cols).dropDuplicates([f"__pk_{i}"])
        if broadcast_right:
            dim = F.broadcast(dim)
        out = out.join(dim, out[lk] == dim[f"__pk_{i}"], "left_outer").drop(f"__pk_{i}")
        staged.append([f"__v{i}_{v}" for v in value_cols])
    for j, v in enumerate(value_cols):
        out = out.withColumn(v, F.coalesce(*[F.col(stage[j]) for stage in staged]))
    drop_cols = [c for stage in staged for c in stage]
    return out.drop(*drop_cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance: Column | None = None,
    tie_breakers: Sequence[Column] = (),
    how: str = "left_outer",
    left_key: Sequence[str] | None = None,
) -> DataFrame:
    """Nearest-match join: for each left row, the best right row sharing
    ``on`` keys, ordered by time proximity.

    direction: 'backward' (right_time <= left_time, latest wins),
    'forward' (right_time >= left_time, earliest wins), or 'nearest'
    (min |Δt|, ``tie_breakers`` then decide).

    ``left_key`` names columns that UNIQUELY identify each left row (a
    primary key). The best-candidate dedup window partitions by it, so the
    shuffle key is a few narrow columns. When omitted, the window falls
    back to partitioning by EVERY left column — correct only when left rows
    are distinct (byte-identical duplicate left rows collapse to one output
    row), and the shuffle key is the whole row: always pass ``left_key`` at
    scale.

    Implementation: equi join on ``on`` (+ optional ``tolerance`` range
    predicate, e.g. ``F.expr("abs(datediff(l_t, r_t)) <= 5")`` — the ±5-day
    body-weight window) then ``row_number`` over ``left_key``.
    The range predicate is applied as a join condition so Catalyst can use
    it for pruning; the window dedup shuffles once on the left key.

    At 100 TB: both sides shuffle on ``on`` (or the right side broadcasts if
    it's small); the candidate fan-out is bounded by the tolerance window —
    always set a tolerance for unbounded histories, exactly like watermarks
    bound stream state.
    """
    lt, rt = F.col(f"__l.{left_time}"), F.col(f"__r.{right_time}")
    l, r = left.alias("__l"), right.alias("__r")
    cond = None
    for k in on:
        c = F.col(f"__l.{k}") == F.col(f"__r.{k}")
        cond = c if cond is None else (cond & c)
    if direction == "backward":
        time_pred, order = rt <= lt, [rt.desc()]
    elif direction == "forward":
        time_pred, order = rt >= lt, [rt.asc()]
    elif direction == "nearest":
        delta = F.abs(lt.cast("double") - rt.cast("double"))
        time_pred, order = F.lit(True), [delta.asc()]
    else:
        raise ValueError(f"unknown direction {direction!r}")
    cond = time_pred if cond is None else (cond & time_pred)
    if tolerance is not None:
        cond = cond & tolerance
    joined = l.join(r, cond, how)
    part_cols = [F.col(f"__l.{c}") for c in (left_key or left.columns)]
    w = Window.partitionBy(*part_cols).orderBy(*order, *tie_breakers)
    out = joined.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(c) for c in right.columns if c not in set(left.columns)],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi join: salt the (big, skewed) left side into
    ``buckets`` sub-keys and replicate each right row once per bucket, so
    a hot key ('baseline' colony, a common strain — the reference's risk
    register) spreads over ``buckets`` reducers instead of one straggler
    task.

    Semantically identical to ``left.join(right, on, how)`` for inner and
    left_outer (the salt is internal). Cost: the right side is written
    ``buckets``× into the shuffle — use when the right is the smaller side
    but too big to broadcast and AQE's skew split doesn't apply (e.g. the
    shuffle feeds a bucketed/sorted write, or the skew is in a
    sort-merge join AQE already planned around). Prefer plain broadcast
    for dim-sized rights and AQE skew-join first; this is the explicit
    fallback.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("salted_join supports how='inner'|'left_outer'")
    salted_l = left.withColumn(
        "__salt", (F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(buckets)))
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_l.join(salted_r, [*on, "__salt"], how)
    return out.drop("__salt")


def subset_join(
    left: DataFrame,
    right: DataFrame,
    left_arr: str,
    right_arr: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
    strategy: str = "broadcast",
) -> DataFrame:
    """J6 subset-containment join: pair (l, r) matches when r's array is
    fully contained in l's array — the reference's parent-phenotype rollup
    condition ``size(array_intersect(child_ids, mp_term_id_options)) ==
    size(mp_term_id_options)`` (impc_api_mapper.py:1078-1083).

    ``strategy='broadcast'`` keeps the reference's non-equi condition
    against a BROADCAST right side — bounded work when the right is a dim
    (ontology-sized); the plan is a BroadcastNestedLoopJoin, never a
    cartesian.

    ``strategy='explode'`` is the big-right path: explode both arrays to
    distinct (key, element) rows, equi-join on element, and keep (l, r)
    pairs whose match count equals size(r.arr) — all hash joins and one
    aggregation, no nested loop. ``left_key``/``right_key`` must uniquely
    identify rows. Skewed common elements dominate the element join at
    scale — pre-filter stop-elements or salt.

    Matching semantics mirror the reference exactly: a right array with
    duplicates can never match (its size exceeds the distinct
    intersection). Divergence: an EMPTY right array matches everything
    under 'broadcast' (0 == 0, vacuous subset) but nothing under 'explode'
    (no rows to join); the reference guards size > 0 upstream — do the
    same.
    """
    if strategy == "broadcast":
        cond = (
            F.size(F.array_intersect(left[left_arr], right[right_arr]))
            == F.size(right[right_arr])
        )
        return left.join(F.broadcast(right), cond, how)
    if strategy != "explode":
        raise ValueError(f"unknown strategy {strategy!r}")
    if how not in ("inner", "left_outer"):
        raise ValueError("explode strategy supports how='inner'|'left_outer'")
    l_ex = left.select(
        F.col(left_key), F.explode(F.array_distinct(F.col(left_arr))).alias("__e")
    )
    r_ex = right.select(
        F.col(right_key),
        F.size(F.col(right_arr)).alias("__need"),
        F.explode(F.array_distinct(F.col(right_arr))).alias("__e"),
    )
    matched = (
        l_ex.join(r_ex, "__e")
        .groupBy(left_key, right_key)
        .agg(F.count(F.lit(1)).alias("__got"), F.first("__need").alias("__need"))
        .where(F.col("__got") == F.col("__need"))
        .select(left_key, right_key)
    )
    enriched = matched.join(right, right_key)
    return left.join(enriched, left_key, how)


def release_diff(
    current: DataFrame,
    previous: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Release regression diff (jobs/compare/dr_diff.py:57-167): key tuples
    added/removed between two releases, tagged with a ``change`` column.

    Implemented with left_anti joins on the key projection (explicit and
    broadcast-able) rather than the reference's ``subtract`` of whole
    frames — anti joins shuffle only the keys and skip the full-row
    distinct EXCEPT requires.
    """
    cur = current.select(*keys).distinct()
    prev = previous.select(*keys).distinct()
    added = anti_join(cur, prev, list(keys)).withColumn("change", F.lit("added"))
    removed = anti_join(prev, cur, list(keys)).withColumn("change", F.lit("removed"))
    return added.unionByName(removed)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Explicit left_semi — the reference approximates this with inner joins
    on key-only frames (mp_mapper tested-terms join)."""
    return left.join(right, on=list(on), how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Explicit left_anti — replaces `subtract`-of-key-tuples (dr_diff.py:118)
    when only key membership matters (anti join avoids the full-row
    distinct-compare shuffle of EXCEPT)."""
    return left.join(right, on=list(on), how="left_anti")
