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
    staged: list[str] = []
    for i, (lk, rk) in enumerate(key_pairs):
        # bundle the value columns into ONE struct per priority level so
        # the first MATCHING ROW supplies every value column together — a
        # per-column coalesce would let a matched-but-NULL value fall
        # through to a lower-priority row, mixing fields of two different
        # lookup rows into one output row
        # deterministic pick for duplicate lookup keys: min over the value
        # struct (field-lexicographic), not dropDuplicates — which keeps
        # whichever row a partition happened to deliver first and breaks
        # the module's run/partitioning-stability contract
        dim = (
            right.select(
                F.col(rk).alias(f"__pk_{i}"),
                F.struct(*[F.col(v).alias(v) for v in value_cols]).alias(f"__s{i}"),
            )
            .groupBy(f"__pk_{i}")
            .agg(F.min(f"__s{i}").alias(f"__s{i}"))
        )
        if broadcast_right:
            dim = F.broadcast(dim)
        out = out.join(dim, out[lk] == dim[f"__pk_{i}"], "left_outer").drop(f"__pk_{i}")
        staged.append(f"__s{i}")
    picked = F.coalesce(*[F.col(c) for c in staged])
    for v in value_cols:
        out = out.withColumn(v, picked[v])
    return out.drop(*staged)


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
        def as_num(c: Column, dtype: str) -> Column:
            # date→double is an ANSI-mode AnalysisException and the two
            # temporal types number in different units; epoch MICROS puts
            # dates and (sub-second) timestamps on one comparable axis
            if dtype == "date":
                return (F.unix_date(c).cast("double")) * F.lit(86_400_000_000.0)
            if dtype.startswith("timestamp"):
                return F.unix_micros(c.cast("timestamp")).cast("double")
            return c.cast("double")

        l_dt = dict(left.dtypes)[left_time]
        r_dt = dict(right.dtypes)[right_time]
        delta = F.abs(as_num(lt, l_dt) - as_num(rt, r_dt))
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
    position_col=None,
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
    # same salt construction as aggregate.salted_agg: a DETERMINISTIC
    # content hash (maps excluded — F.hash raises on MapType), optionally
    # plus a caller-supplied per-row unique key so a hot key of
    # exact-duplicate rows still spreads across buckets. A pure function
    # of row content survives task reattempts after shuffle fetch
    # failures without row duplication/loss (no nondeterministic ids).
    from impc_etl_spark.operators.aggregate import _salt_expr

    salted_l = left.withColumn("__salt", _salt_expr(left, buckets, position_col))
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


def _bin_of(df: DataFrame, col_name: str, bin_width: int) -> Column:
    """Map a time/numeric column to a long bin id, monotonically.

    date → epoch SECONDS (days × 86400); timestamp → epoch seconds;
    numeric → trunc to long — ONE unit for every temporal type, so
    ``bin_width`` always means seconds, a date side and a timestamp side
    bin onto the same grid, and the repo's own '7*86400' callers get the
    one-week buckets they intend (a per-type unit made date columns bin
    in DAYS, collapsing every row into bucket 0 — a correct but
    single-key join, i.e. the quadratic blowup this operator exists to
    avoid). Only used for the equi-join bucketing — the exact range
    predicate always re-checks the ORIGINAL columns, so bin granularity
    can never change results, only candidate fan-out.
    """
    dt = dict(df.dtypes)[col_name]
    c = F.col(col_name)
    if dt == "date":
        longs = F.datediff(c, F.to_date(F.lit("1970-01-01"))).cast("long") * F.lit(86400)
    elif dt.startswith("timestamp"):
        # NTZ values are interpreted in the session timezone (pinned UTC by
        # the engine session) — consistent with oracles treating naive
        # timestamps as UTC.
        longs = F.unix_seconds(c.cast("timestamp"))
    else:
        longs = c.cast("long")
    return F.floor(longs / F.lit(bin_width)).cast("long")


def _point_pred(point: Column, start: Column, end: Column, closed: str) -> Column:
    if closed == "both":
        return (start <= point) & (point <= end)
    if closed == "left":
        return (start <= point) & (point < end)
    if closed == "right":
        return (start < point) & (point <= end)
    if closed == "neither":
        return (start < point) & (point < end)
    raise ValueError(f"unknown closed mode {closed!r}")


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bin_width: int = 86400,
    closed: str = "both",
    how: str = "inner",
    max_per_bin: int | None = None,
    report_overflow: bool = False,
) -> DataFrame:
    """Point-in-interval join WITHOUT a nested loop: bin both sides onto a
    shared time grid so Catalyst plans a hash join on ``(on…, bin)``, then
    re-check the exact range predicate.

    A pure range join (``i.start <= p.t AND p.t <= i.end`` with no equi
    key) degenerates to BroadcastNestedLoopJoin — O(|points|·|intervals|)
    comparisons, a scale-killer. Instead each interval is exploded into the
    ``bin_width``-sized buckets it spans (``sequence(bin(start),
    bin(end))``) and each point lands in exactly ONE bucket, so every
    matching (point, interval) pair meets in exactly one bucket: no
    post-join dedup, and the join is an ordinary shuffled/broadcast hash
    join.

    ``bin_width`` is in SECONDS for date and timestamp columns alike,
    value units for numerics. Pick it near the TYPICAL interval length:
    cost per interval row is ``len/bin_width + 1`` exploded rows, cost per
    bucket is the candidate fan-in. ``closed`` picks boundary semantics
    ('both'|'left'|'right'|'neither').

    At 100 TB: both sides shuffle on (on…, bin) — time-local, so a day's
    data co-locates; hot buckets (flash-sale days) are ordinary key skew,
    handled by AQE skew-join. Unbounded intervals must be clamped upstream,
    exactly like watermarking bounds stream state.

    ``max_per_bin`` (default None = exact) is the dense-bin guard, the
    interval-join analog of LSH's mega-bucket cap: per-point work is the
    interval fan-in of its bin, so a hostile/skewed distribution piling
    intervals onto one bin makes the join quadratic at 100×. With the cap
    set, each (on…, bin) keeps only the first ``max_per_bin`` interval
    copies by a DETERMINISTIC priority (earliest start, then end, then a
    content hash) and drops the rest — points in an overflowing bin can
    miss matches (bounded loss, like LSH's star degradation), which is
    why the default is off. ``report_overflow=True`` adds a
    ``bin_dropped`` column (interval copies dropped from that point's
    bin; 0 elsewhere) so the loss is visible in-plan, the same
    self-diagnosing shape as the IVF store's scanned-cluster twin.
    """
    if how not in ("inner", "left_outer", "left_semi", "left_anti"):
        # the intervals side is exploded: interval-preserving outer joins
        # would emit one row per unmatched bucket — disallow them.
        raise ValueError("interval_point_join supports inner/left_outer/left_semi/left_anti")
    if report_overflow and max_per_bin is None:
        raise ValueError("report_overflow requires max_per_bin")
    p_bin = _bin_of(points, point_col, bin_width)
    s_bin = _bin_of(intervals, start_col, bin_width)
    e_bin = _bin_of(intervals, end_col, bin_width)
    p = points.withColumn("__bin", p_bin).alias("__p")
    iv = intervals.withColumn("__bin", F.explode(F.sequence(s_bin, e_bin)))
    if max_per_bin is not None:
        from pyspark.sql import Window

        # deterministic keep-priority; the window shuffles on the same
        # (on…, bin) key the join exchanges on anyway
        wcap = Window.partitionBy(*on, "__bin").orderBy(
            F.col(start_col), F.col(end_col),
            F.xxhash64(*[F.col(c) for c in intervals.columns]),
        )
        ranked = iv.withColumn("__rn", F.row_number().over(wcap))
        if report_overflow:
            overflow = (
                ranked.where(F.col("__rn") > max_per_bin)
                .groupBy(*on, "__bin")
                .agg(F.count(F.lit(1)).alias("bin_dropped"))
            )
            p = (
                p.join(overflow.hint("merge"), [*on, "__bin"], "left")
                .withColumn(
                    "bin_dropped",
                    F.coalesce(F.col("bin_dropped"), F.lit(0)),
                )
                .alias("__p")
            )
        iv = ranked.where(F.col("__rn") <= max_per_bin).drop("__rn")
    iv = iv.alias("__i")
    cond = F.col("__p.__bin") == F.col("__i.__bin")
    for k in on:
        cond = cond & (F.col(f"__p.{k}") == F.col(f"__i.{k}"))
    cond = cond & _point_pred(
        F.col(f"__p.{point_col}"), F.col(f"__i.{start_col}"), F.col(f"__i.{end_col}"), closed
    )
    joined = p.join(iv, cond, how)
    p_cols = list(points.columns) + (["bin_dropped"] if report_overflow else [])
    if how in ("left_semi", "left_anti"):
        return joined.select(*[F.col(f"__p.{c}").alias(c) for c in p_cols])
    return joined.select(
        *[F.col(f"__p.{c}").alias(c) for c in p_cols],
        *[F.col(f"__i.{c}").alias(c) for c in intervals.columns if c not in set(points.columns)],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] = (),
    bin_width: int = 86400,
    how: str = "inner",
    max_per_bin: int | None = None,
) -> DataFrame:
    """Interval-overlap join (closed intervals: ``l.start <= r.end AND
    r.start <= l.end``) on the same binned-grid plan as
    ``interval_point_join``.

    Both sides explode into the buckets they span, join on ``(on…, bin)``,
    and — since two overlapping intervals share EVERY bucket in their
    overlap — each pair is kept only in the FIRST common bucket
    (``bin == greatest(bin(l.start), bin(r.start))``), which both sides are
    guaranteed to contain. One hash join, no dedup shuffle, no nested loop.

    ``max_per_bin`` (default None = exact) caps EACH side's copies per
    (on…, bin) by the same deterministic priority as
    ``interval_point_join``'s dense-bin guard — a dense bin otherwise
    produces |l|·|r| candidate pairs, workload-inherent quadratic growth
    (campaign_order_attribution at the sf10-equivalent rehearsal). Pairs
    whose first-common-bucket copy is dropped are lost (bounded loss;
    default off preserves exact semantics).
    """
    if how != "inner":
        # both sides are exploded: any outer variant would emit one row per
        # unmatched bucket, not per unmatched interval.
        raise ValueError("interval_overlap_join supports how='inner' only")
    ls_bin, le_bin = _bin_of(left, left_start, bin_width), _bin_of(left, left_end, bin_width)
    rs_bin, re_bin = _bin_of(right, right_start, bin_width), _bin_of(right, right_end, bin_width)

    def _cap(df: DataFrame, start: str, end: str, cols: list[str]) -> DataFrame:
        if max_per_bin is None:
            return df
        from pyspark.sql import Window

        wcap = Window.partitionBy(*on, "__bin").orderBy(
            F.col(start), F.col(end), F.xxhash64(*[F.col(c) for c in cols])
        )
        return (
            df.withColumn("__rn", F.row_number().over(wcap))
            .where(F.col("__rn") <= max_per_bin)
            .drop("__rn")
        )

    l = _cap(
        left.withColumn("__sbin", ls_bin)
        .withColumn("__bin", F.explode(F.sequence(F.col("__sbin"), le_bin))),
        left_start, left_end, list(left.columns),
    ).alias("__l")
    r = _cap(
        right.withColumn("__sbin", rs_bin)
        .withColumn("__bin", F.explode(F.sequence(F.col("__sbin"), re_bin))),
        right_start, right_end, list(right.columns),
    ).alias("__r")
    cond = F.col("__l.__bin") == F.col("__r.__bin")
    for k in on:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    cond = cond & (
        F.col("__l.__bin") == F.greatest(F.col("__l.__sbin"), F.col("__r.__sbin"))
    )
    cond = cond & (F.col(f"__l.{left_start}") <= F.col(f"__r.{right_end}"))
    cond = cond & (F.col(f"__r.{right_start}") <= F.col(f"__l.{left_end}"))
    joined = l.join(r, cond, how)
    return joined.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(c) for c in right.columns if c not in set(left.columns)],
    )


def fuzzy_blocked_pairs(
    df: DataFrame,
    block_cols: Sequence[str],
    text_col: str,
    id_col: str,
    max_distance: int = 3,
    max_block_size: int | None = None,
) -> DataFrame:
    """Blocked fuzzy record linkage: candidate pairs meet only inside a
    blocking key, then survive an edit-distance bar — the classic
    blocking+comparison design (Fellegi-Sunter style) that makes
    approximate string matching tractable: an unblocked fuzzy join is
    O(n²) string comparisons, a scale-killer no cluster survives.

    Emits one row per unordered pair ``(id_a < id_b)`` sharing every
    ``block_cols`` value with ``levenshtein(text_a, text_b) <=
    max_distance``, plus the distance. The Spark side evaluates the
    BANDED form (``F.levenshtein(..., threshold)``): the DP matrix walk
    abandons a pair the moment its distance provably exceeds the bar, so
    the common non-match case costs O(d·len) not O(len²).

    Scale shape: one shuffle of each (projected) side on the block key;
    pair growth is quadratic IN THE BLOCK, which is the point — the
    block key is the operator's contract (pick one selective enough that
    blocks stay small; name-prefix + category is the standard recipe).
    ``max_block_size`` is the guard for hostile/skewed keys, same family
    as LSH's mega-bucket cap and the interval joins' dense-bin guard:
    blocks larger than it are EXCLUDED entirely (count them upstream if
    you need the audit; a partial block would silently bias the linkage).
    """
    if max_block_size is not None:
        sizes = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("__bsz"))
        keep = sizes.where(F.col("__bsz") <= max_block_size).select(*block_cols)
        # block-key tables are data-sized aggregates: merge, never broadcast
        df = df.join(keep.hint("merge"), list(block_cols), "left_semi")
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
    )
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
    )
    pairs = a.join(b, list(block_cols)).where(F.col("id_a") < F.col("id_b"))
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"), int(max_distance))
    return (
        pairs.withColumn("edit_dist", dist)
        # banded levenshtein returns -1 when the bar is exceeded
        .where((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_distance))
    )


def passjoin_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 3,
    block_cols: Sequence[str] = (),
    min_seg_len: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Edit-distance similarity self-join via pigeonhole segment
    signatures (the PassJoin family, Li/Deng/Feng ICDE 2012) — the
    SUB-QUADRATIC replacement for block-then-all-pairs fuzzy linkage:
    ``fuzzy_blocked_pairs`` compares every pair inside a block, so its
    candidate stream grows as (rows-per-block)² — quadratic in scale
    factor unless the block key's cardinality grows with the data,
    which dimension-like keys (brand, category) never do.

    Emits one row per unordered pair ``(id_a < id_b)`` sharing every
    ``block_cols`` value with ``levenshtein(text_a, text_b) <=
    max_distance`` — the SAME output contract as ``fuzzy_blocked_pairs``
    (complete, no approximation), different candidate generation:

    - Each string of length L is cut into ``d+1`` contiguous segments
      (d = max_distance), boundaries a pure function of L. By
      PIGEONHOLE, <= d edits leave at least one segment untouched, and
      an untouched segment of the SHORTER string appears verbatim in
      the other string shifted by at most d (net indels before it
      can't exceed the edit budget). So every true pair shares at
      least one (segment-index, target-length, substring) signature.
    - INDEX role: every row emits its d+1 own segments keyed
      (block…, L, j, segment).
    - PROBE role: every row emits, for each candidate partner length
      Lt in [L-d, L], each segment slot j, each shift in [-d, d], the
      substring of ITSELF at the partner's expected segment position —
      <= (d+1)²(2d+1) keys per row (112 at d=3), deduplicated per row
      before the explode. Equal-length pairs match in both directions;
      the canonical (least, greatest) id ordering + distinct collapses
      them.
    - Candidates join on the exact signature (an equi hash join — the
      whole point), then the banded ``levenshtein(…, threshold)``
      verifies; its DP walk abandons a pair the moment the bar is
      provably exceeded.

    Strings shorter than ``(d+1)*min_seg_len`` would cut into segments
    so short every bucket collides; they route to a SHORT POOL compared
    all-pairs against strings within d of that bound — bounded work on
    natural text (few very-short keys), but a hostile corpus of
    millions of near-empty strings per block degrades it; keep
    ``block_cols`` selective for such data.

    ``max_bucket`` is the low-entropy guard (same family as LSH's
    mega-bucket cap): template corpora where thousands of strings share
    a segment create quadratic signature buckets; with the cap set,
    larger buckets are EXCLUDED entirely (bounded loss — a pair can
    still meet in its other untouched segments' buckets). Default off:
    exact.

    Scale shape: explode-factor-bounded key streams (4 index + <=112
    probe keys/row at d=3), one signature hash join, one candidate-pair
    distinct, two id-keyed text lookups, verify. All shuffles are
    linear in rows x constant; pair work is linear in TRUE near-matches
    plus signature false positives (substring entropy-bounded), never
    in block size. NULL texts drop. The pruned (blocks, id, text, len)
    base frame is MATERIALIZED once (localCheckpoint): SIX consumers
    (index keys, probe keys, the two short-pool sides, both text
    lookups) would otherwise each re-scan the base table — 6 parquet
    scans measured in the r10 plan audit, 1 after.
    """
    d = int(max_distance)
    if d < 1:
        raise ValueError(f"max_distance must be >= 1, got {d}")
    nseg = d + 1
    short_min = nseg * int(min_seg_len)
    blocks = list(block_cols)
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(
            *blocks,
            F.col(id_col).alias("__id"),
            F.col(text_col).alias("__t"),
            F.length(text_col).alias("__L"),
        )
        .localCheckpoint(eager=True)
    )

    def seg_start(L: Column, j: int) -> Column:
        # 1-based start of segment j (1..nseg) of a length-L string:
        # even partition via floor((j-1)*L/nseg)+1 — exact integer math
        return (L * F.lit(j - 1) - (L * F.lit(j - 1)) % nseg) / nseg + 1

    def seg_len(L: Column, j: int) -> Column:
        return seg_start(L, j + 1) - seg_start(L, j)

    long_side = base.where(F.col("__L") >= short_min)
    L = F.col("__L")

    index_keys = long_side.select(
        *blocks,
        F.col("__id"),
        F.col("__L").alias("__kL"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    F.substring(
                        "__t", seg_start(L, j).cast("int"), seg_len(L, j).cast("int")
                    ).alias("s"),
                )
                for j in range(1, nseg + 1)
            ])
        ).alias("__k"),
    ).select(*blocks, "__id", "__kL", F.col("__k.j").alias("__kj"),
             F.col("__k.s").alias("__ks"))
    if max_bucket is not None:
        sizes = index_keys.groupBy(*blocks, "__kL", "__kj", "__ks").agg(
            F.count(F.lit(1)).alias("__bsz"))
        keep = sizes.where(F.col("__bsz") <= int(max_bucket)).drop("__bsz")
        # signature-bucket tables are data-sized aggregates: never broadcast
        index_keys = index_keys.join(
            keep.hint("merge"), [*blocks, "__kL", "__kj", "__ks"], "left_semi")

    # Probe keys as ONE transform over a literal (dl, j, delta) spec
    # array instead of (d+1)²(2d+1) unrolled when(valid, struct(...))
    # expressions (112 at d=3, ~6,000 expression nodes): the unrolled
    # tree cost 16-32 s of driver-side analysis+codegen PER CONSTRUCTION
    # and pushed the fused stage past JIT limits (r10 measurement);
    # the lambda is evaluated per spec element with identical integer
    # arithmetic, same element order, same NULL-filter and dedup — the
    # emitted key multiset is unchanged.
    spec_sql = ", ".join(
        f"struct({dl} AS dl, {j} AS j, {delta} AS delta)"
        for dl in range(0, d + 1)       # partner length Lt = L - dl
        for j in range(1, nseg + 1)
        for delta in range(-d, d + 1)
    )

    def _probe_key(x: Column) -> Column:
        lt = L - x["dl"]
        st = (lt * (x["j"] - F.lit(1)) - (lt * (x["j"] - F.lit(1))) % nseg) / nseg + 1
        nxt = (lt * x["j"] - (lt * x["j"]) % nseg) / nseg + 1
        ln = nxt - st
        pos = st + x["delta"]
        valid = (
            (lt >= F.lit(short_min))
            & (pos >= F.lit(1))
            & (pos + ln - 1 <= L)
        )
        return F.when(
            valid,
            F.struct(
                lt.cast("int").alias("kL"),
                x["j"].alias("j"),
                F.substring(
                    F.col("__t"), pos.cast("int"), ln.cast("int")
                ).alias("s"),
            ),
        )

    probe_keys = long_side.select(
        *blocks,
        F.col("__id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.transform(F.expr(f"array({spec_sql})"), _probe_key),
                    lambda x: x.isNotNull(),
                )
            )
        ).alias("__k"),
    ).select(*blocks, "__id", F.col("__k.kL").alias("__kL"),
             F.col("__k.j").alias("__kj"), F.col("__k.s").alias("__ks"))

    p = probe_keys.alias("__p")
    i = index_keys.alias("__i")
    cond = (
        (F.col("__p.__kL") == F.col("__i.__kL"))
        & (F.col("__p.__kj") == F.col("__i.__kj"))
        & (F.col("__p.__ks") == F.col("__i.__ks"))
        & (F.col("__p.__id") != F.col("__i.__id"))
    )
    for b in blocks:
        cond = cond & (F.col(f"__p.{b}") == F.col(f"__i.{b}"))
    sig_cand = p.join(i, cond).select(
        *[F.col(f"__p.{b}").alias(b) for b in blocks],
        F.least(F.col("__p.__id"), F.col("__i.__id")).alias("id_a"),
        F.greatest(F.col("__p.__id"), F.col("__i.__id")).alias("id_b"),
    )

    # short pool: strings too short to cut — all-pairs against partners
    # within d of the bound (|len diff| > d can never pass the verify)
    shorts = base.where(F.col("__L") < short_min).alias("__s")
    nears = base.where(F.col("__L") < short_min + d).alias("__n")
    scond = F.col("__s.__id") != F.col("__n.__id")
    for b in blocks:
        scond = scond & (F.col(f"__s.{b}") == F.col(f"__n.{b}"))
    short_cand = shorts.join(nears, scond).select(
        *[F.col(f"__s.{b}").alias(b) for b in blocks],
        F.least(F.col("__s.__id"), F.col("__n.__id")).alias("id_a"),
        F.greatest(F.col("__s.__id"), F.col("__n.__id")).alias("id_b"),
    )

    cand = sig_cand.unionByName(short_cand).distinct()
    texts = base.select(F.col("__id"), F.col("__t"))
    pairs = (
        cand.join(texts.select(F.col("__id").alias("id_a"),
                               F.col("__t").alias("text_a")), "id_a")
        .join(texts.select(F.col("__id").alias("id_b"),
                           F.col("__t").alias("text_b")), "id_b")
    )
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"), d)
    return (
        pairs.withColumn("edit_dist", dist)
        # banded levenshtein returns -1 when the bar is exceeded
        .where((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= d))
        .select(*blocks, "id_a", "id_b", "text_a", "text_b", "edit_dist")
    )


def release_diff(
    current: DataFrame,
    previous: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Release regression diff (jobs/compare/dr_diff.py:57-167): key tuples
    added/removed between two releases, tagged with a ``change`` column.

    One-pass tag-and-aggregate, not EXCEPT and not anti joins: both key
    projections union with a side tag, ONE derived-width hash aggregate
    takes max() per side (which also absorbs within-release duplicate
    keys — no separate distinct), and a row-local CASE labels keys
    present on exactly one side. Each key crosses exactly ONE exchange
    and there is no sort anywhere. The previous form (two distincts +
    two anti joins) computed each distinct TWICE — Spark does not reuse
    a shared exchange across the added/removed consumers — and its
    sort-merge anti joins spilled their sorts: measured at the
    sf10-equivalent pipeline rehearsal (134.7 M rows/side) at 16.8 GB
    shuffle / 30.7 GB disk spill / 206 s; the one-pass form carries the
    same keys once and hash-aggregates. expansion=4 keeps the width past
    2× the bypass boundary ON PURPOSE: the measured key bytes (8.7 GB vs
    a 5.4 GB scan estimate, ratio 1.6) would derive a bypass-eligible
    ~170-wide exchange, but 32 concurrent scan tasks × 170 open
    compressed streams OOM'd the 8 GB rehearsal heap in the parquet read
    — wide-row map tasks can't afford the bypass writer's buffer fan-out
    on top of the vectorized reader, so the sort writer's sequential
    graceful spill is the right trade here (measured 63 s / 7.8 GB
    spill / zero OOM at K=100).
    """
    from impc_etl_spark.operators.partitioning import (
        advisory_mb, shuffle_partitions_for,
    )

    tag = lambda df, c, p: df.select(*keys).withColumn(  # noqa: E731
        "__cur", F.lit(c)).withColumn("__prev", F.lit(p))
    tagged = tag(current, 1, 0).unionByName(tag(previous, 0, 1))
    # NULL-key rows must keep anti-join semantics: groupBy treats NULLs
    # as equal, but the anti joins this op replaces (and the NOT-EXISTS
    # oracle) never match on NULL — a NULL key tuple present in BOTH
    # releases must still emit BOTH an added and a removed row. r9
    # routed them around the aggregate with per-side distincts, which
    # re-scanned BOTH inputs (4 base scans in the r10 plan audit).
    # r10: fold the routing INTO the one aggregate — NULL-key rows get
    # a side-unique group disambiguator (1=current, 2=previous), so the
    # same exchange performs the per-side distinct and a CASE on the
    # disambiguator labels them unconditionally. Non-NULL rows keep
    # __side 0 and the exact r9 semantics. 4 scans -> 2, 3 exchanges
    # (agg + 2 distincts) -> 1.
    any_null = None
    for k in keys:
        c = F.col(k).isNull()
        any_null = c if any_null is None else (any_null | c)
    side = F.when(~any_null, F.lit(0)).otherwise(
        F.when(F.col("__cur") == 1, F.lit(1)).otherwise(F.lit(2))
    )
    # width derived from the UNION (both sides cross the exchange), not
    # current alone — a small-current/huge-previous diff would otherwise
    # undersize it (r9 review finding)
    width = shuffle_partitions_for(
        tagged, target_mb=advisory_mb(current.sparkSession), expansion=4.0)
    agg = (
        tagged.withColumn("__side", side)
        .repartition(width, *[F.col(k) for k in keys], F.col("__side"))
        .groupBy(*keys, "__side")
        .agg(F.max("__cur").alias("__c"), F.max("__prev").alias("__p"))
    )
    return (
        agg.withColumn(
            "change",
            F.when(F.col("__side") == 1, F.lit("added"))
            .when(F.col("__side") == 2, F.lit("removed"))
            .when((F.col("__c") == 1) & (F.col("__p") == 0), F.lit("added"))
            .when((F.col("__c") == 0) & (F.col("__p") == 1), F.lit("removed")),
        )
        .where(F.col("change").isNotNull())
        .select(*keys, "change")
    )


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Explicit left_semi — the reference approximates this with inner joins
    on key-only frames (mp_mapper tested-terms join)."""
    return left.join(right, on=list(on), how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Explicit left_anti — replaces `subtract`-of-key-tuples (dr_diff.py:118)
    when only key membership matters (anti join avoids the full-row
    distinct-compare shuffle of EXCEPT)."""
    return left.join(right, on=list(on), how="left_anti")


def interval_agg_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    interval_key: Sequence[str],
    value_cols: Sequence[str] = (),
    on: Sequence[str] = (),
    bin_width: int = 86400,
    closed: str = "both",
    assume_aligned: bool = False,
) -> DataFrame:
    """Per-interval point AGGREGATES (count + sums) via hierarchical
    binning — the aggregation-pushdown form of ``interval_point_join``
    for the common "count/sum the points in each window" query.

    The flat form joins every (point, interval) candidate pair and then
    aggregates: per-pair work, quadratic in dense bins (a K=300
    rehearsal measured the flat campaign-attribution join dominated by
    a handful of straggler bins). This operator exploits that count/sum
    are DECOMPOSABLE: any bin lying STRICTLY inside an interval's bin
    span contributes a whole per-bin pre-aggregate (one row per (on…,
    bin) — computed once for all intervals), and only the two EDGE bins
    (the interval's first and last, where the exact predicate can cut a
    bin in half) touch point rows. For w-bin windows the point-level
    work drops from w bins to 2 — the segment-tree idea flattened to
    one level, sized by ``bin_width``.

    Correctness of the split needs no predicate on full bins: every
    point in bin b with s_bin < b < e_bin satisfies start <= p <= end
    for ANY ``closed`` mode (start lives in bin s_bin <= b-1, so
    start < bin_start(b) <= p, strictly — boundary values only ever
    live in edge bins). The exact ``closed`` predicate is re-checked on
    edge-bin pairs, identical to ``interval_point_join``.

    Returns one row per interval WITH >= 1 matching point (inner-join
    semantics, matching the flat form + groupBy): ``interval_key`` +
    ``n_points`` + ``sum_<col>`` per value column. ``interval_key``
    must uniquely identify interval rows. NULL point/start/end rows
    drop on both paths (explode of a NULL sequence emits nothing; the
    per-bin pre-agg keys on the non-NULL bin).

    Scale shape: ONE scan of the points feeding a (on…, bin, exact
    value) pre-aggregate (the edge side — pair work bounded by DISTINCT
    values per bin, r10) re-aggregated to the (on…, bin) grid (the
    interior/aligned side), one explode of intervals over their
    INTERIOR bins joined to the grid, one edge join against the
    per-value pre-agg, one final per-interval combine. Every join is an
    equi hash/merge join; AQE skew handling applies to the edge join
    exactly as to the flat form.

    ``assume_aligned=True`` is the degenerate-and-fastest case: the
    CALLER asserts every interval endpoint lies exactly on a bin
    boundary span (date columns on a day grid with closed='both' — the
    campaign/retention/cohort shape). Then EVERY bin in [s_bin, e_bin]
    is fully covered, the edge phase disappears, and the whole answer
    is intervals × bins-per-interval rows joined against the grid-sized
    pre-agg — zero point-row pair work, the prefix-sum regime. The
    K=300 rehearsal made the difference brutal: the flat pair join ran
    >60 min on one straggler bin; the aligned form is seconds. Passing
    it when endpoints do NOT align silently miscounts the edge bins —
    it is a caller contract, not an inference.
    """
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"unknown closed mode {closed!r}")
    keys = list(interval_key)
    vals = list(value_cols)
    p_bin = _bin_of(points, point_col, bin_width)
    s_bin = _bin_of(intervals, start_col, bin_width)
    e_bin = _bin_of(intervals, end_col, bin_width)

    # phase 0: per-(on…, bin, EXACT point value) pre-aggregate — the
    # r10 fix for the edge phase's own dense-bin wall: when interval
    # density grows but the time range doesn't (the K=300 campaign
    # rehearsal: 300× campaigns over the same ~360 weekly bins), edge
    # pair work = points-per-bin × edge-bin-rows-per-bin exploded to
    # ~10¹¹ CPU-bound SMJ pairs (measured: >20 min, aborted). The edge
    # predicate only reads the point VALUE, and count/sum are
    # decomposable at any granularity — so collapsing equal-valued
    # points first bounds edge pair work by DISTINCT values per bin
    # (≤7 dates per weekly bin on date data) instead of rows. The
    # per-bin table (interior/aligned phases) re-aggregates from this
    # one, so points are still scanned exactly once; worst case
    # (all-distinct timestamps) costs one extra exchange and removes
    # nothing — never worse than a constant, and the dense case drops
    # from quadratic to grid-sized.
    pts = points.where(F.col(point_col).isNotNull()).withColumn("__bin", p_bin)
    ptagg = pts.groupBy(*on, "__bin", F.col(point_col).alias("__pt")).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.col(v)).alias(f"__s_{v}") for v in vals],
    )
    binagg = ptagg.groupBy(*on, "__bin").agg(
        F.sum("__n").alias("n_points"),
        *[F.sum(f"__s_{v}").alias(f"sum_{v}") for v in vals],
    )
    iv = intervals.withColumn("__sbin", s_bin).withColumn("__ebin", e_bin)
    if assume_aligned:
        # every bin fully covered: one explode + one grid join, done
        aligned = (
            iv.select(
                *keys, *on,
                F.explode(
                    F.when(
                        F.col("__ebin") >= F.col("__sbin"),
                        F.sequence(F.col("__sbin"), F.col("__ebin")),
                    ).otherwise(F.array().cast("array<long>"))
                ).alias("__bin"),
            )
            .join(binagg, [*on, "__bin"])
        )
        return aligned.groupBy(*keys).agg(
            F.sum("n_points").alias("n_points"),
            *[F.sum(f"sum_{v}").alias(f"sum_{v}") for v in vals],
        )
    # r10: in the interior+edge decomposition, ptagg feeds TWO consumers
    # (the interior's per-bin re-aggregate and the edge join) and iv
    # feeds two (interior explode + edge-bin explode) — without
    # materialization Catalyst clones each subtree per consumer and the
    # POINTS and INTERVALS sides are both scanned twice
    # (campaign_window_totals audited at 4 orders scans, 2 after: one
    # per side). The checkpoints are the collapsed per-(bin, value)
    # table and the stamped interval table — both no wider than their
    # pruned inputs. binagg is rebuilt ON the checkpoint so the interior
    # phase reads it too. (The aligned fast path above has one consumer
    # per side — no checkpoint there.)
    ptagg = ptagg.localCheckpoint(eager=True)
    binagg = ptagg.groupBy(*on, "__bin").agg(
        F.sum("__n").alias("n_points"),
        *[F.sum(f"__s_{v}").alias(f"sum_{v}") for v in vals],
    )
    iv = iv.localCheckpoint(eager=True)
    # phase 1: interior bins take whole pre-aggregates (no predicate).
    # The when-guard matters: sequence(a, b) auto-steps BACKWARD when
    # a > b, so a 0/1-bin interval would fabricate descending "interior"
    # bins and double-count its edges; an empty array explodes to nothing.
    interior = (
        iv.select(
            *keys, *on,
            F.explode(
                F.when(
                    F.col("__ebin") - 1 >= F.col("__sbin") + 1,
                    F.sequence(F.col("__sbin") + 1, F.col("__ebin") - 1),
                ).otherwise(F.array().cast("array<long>"))
            ).alias("__bin"),
        )
        .join(binagg, [*on, "__bin"])
        .select(*keys, "n_points", *[f"sum_{v}" for v in vals])
    )
    # phase 2: edge bins re-check the exact predicate on point rows
    edge_bins = iv.select(
        *keys, *on, "__sbin", "__ebin",
        F.col(start_col).alias("__s"), F.col(end_col).alias("__e"),
        F.explode(
            F.array_distinct(F.array(F.col("__sbin"), F.col("__ebin")))
        ).alias("__bin"),
    )
    e = edge_bins.alias("__i")
    p = ptagg.alias("__p")
    cond = F.col("__p.__bin") == F.col("__i.__bin")
    for k in on:
        cond = cond & (F.col(f"__p.{k}") == F.col(f"__i.{k}"))
    cond = cond & _point_pred(
        F.col("__p.__pt"), F.col("__i.__s"), F.col("__i.__e"), closed
    )
    edge = (
        p.join(e, cond)
        .groupBy(*[F.col(f"__i.{k}").alias(k) for k in keys])
        .agg(
            F.sum(F.col("__p.__n")).alias("n_points"),
            *[F.sum(F.col(f"__p.__s_{v}")).alias(f"sum_{v}") for v in vals],
        )
    )
    # phase 3: combine partials per interval
    return (
        interior.unionByName(edge)
        .groupBy(*keys)
        .agg(
            F.sum("n_points").alias("n_points"),
            *[F.sum(f"sum_{v}").alias(f"sum_{v}") for v in vals],
        )
    )
