"""Aggregation operators (SURVEY.md §2.4).

The reference's dominant aggregate is ``groupBy().agg(collect_set(...))``
(A1), with conditional distinct counts (A2), post-agg array algebra (A4),
one pivot (A5), mode-by-count (A6) and two-level re-aggregation (A7). All are
built-in Spark; the engine adds determinism (sorted sets) and scale notes.

Scale: ``collect_set``/``collect_list`` materialize the whole group in one
task — at 100 TB, bound group cardinality first (pre-aggregate, or cap with
``slice(sort_array(...), 1, k)``); ``bounded_collect`` below does exactly
that. Conditional counts use ``count_distinct(when(...))`` which plans as a
partial/final aggregate (map-side combine) — no extra shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sorted_set(col: str | Column) -> Column:
    """Deterministic collect_set: sorted on collection. The reference relies
    on unordered ``collect_set`` + post-hoc ``sort_array`` in some places
    and nondeterministic ordering in others (SURVEY §7 risk register)."""
    return F.sort_array(F.collect_set(col))


def bounded_collect(col: str | Column, k: int, ascending: bool = True) -> Column:
    """collect_set capped at k elements after sorting — bounds per-group
    state so a skewed key can't OOM an executor."""
    arr = F.sort_array(F.collect_set(col), asc=ascending)
    return F.slice(arr, 1, k)


def conditional_count_distinct(cond: Column, col: str | Column) -> Column:
    """``size(collect_set(when(cond, col)))`` from the reference
    (stats_results_mapper.py:315-341), expressed as count_distinct over a
    conditional — identical semantics (when() yields null on false, and
    both collect_set and count_distinct drop nulls), but keeps map-side
    partial aggregation instead of shipping full sets."""
    c = F.col(col) if isinstance(col, str) else col
    # resolve a str argument to a COLUMN — F.when lifts plain values to
    # literals, so passing 'v' by name would count the distinct literal
    # string 'v' (always 1) instead of the column
    return F.count_distinct(F.when(cond, c))


def mode_by_count(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    out: str = "mode_value",
    tie_breaker_desc: bool = False,
) -> DataFrame:
    """Most frequent ``value`` per key group (A6 — the 'normal category'
    pattern, stats_results_mapper.py:1699-1709). Two shuffles: count by
    (keys, value), then window top-1 by (count desc, value) — value in the
    ordering makes ties deterministic, which the reference's bare
    ``first over (order by count desc)`` is not."""
    counted = df.groupBy(*keys, value).agg(F.count(F.lit(1)).alias("__cnt"))
    value_order = F.col(value).desc() if tie_breaker_desc else F.col(value).asc()
    w = Window.partitionBy(*keys).orderBy(F.col("__cnt").desc(), value_order)
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*keys, F.col(value).alias(out))
    )


def two_level_agg(
    df: DataFrame,
    inner_keys: Sequence[str],
    inner_aggs: Sequence[Column],
    outer_keys: Sequence[str],
    outer_aggs: Sequence[Column],
) -> DataFrame:
    """Chained groupBy (A7): dedupe/bundle at a fine grain, then re-aggregate
    to a coarser key (stats_results_mapper.py:315-381 observation-metadata
    pattern). When ``outer_keys ⊆ inner_keys`` the second aggregation reuses
    the first shuffle's partitioning (no second exchange)."""
    inner = df.groupBy(*inner_keys).agg(*inner_aggs)
    return inner.groupBy(*outer_keys).agg(*outer_aggs)


def pivot_agg(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    values: Sequence[str] | None,
    agg: Column,
) -> DataFrame:
    """groupBy().pivot().agg() (A5 — mp_mapper search-index property table).
    Always pass ``values`` at scale: without them Spark runs an extra
    distinct job over 100 TB just to discover the pivot domain."""
    g = df.groupBy(*keys)
    # `is not None`, not truthiness: an explicitly EMPTY value list means
    # "pivot over nothing", not "run the full-domain discovery scan the
    # docstring warns about"
    p = g.pivot(pivot_col, list(values)) if values is not None else g.pivot(pivot_col)
    return p.agg(agg)


def _contains_map(dt) -> bool:
    """True if the type tree contains a MapType anywhere — such columns
    cannot feed F.hash (Spark raises on map hashing)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _salt_expr(df: DataFrame, buckets: int, position_col=None) -> Column:
    """Deterministic salt shared by salted_agg / joins.salted_join.

    Salt = pmod(hash(all hashable columns [, position_col]), buckets) — a
    pure function of row content, so a task reattempt after a shuffle
    fetch failure recomputes the SAME salt for every row (the r5 ADVICE
    finding: monotonically_increasing_id() is nondeterministic across
    attempts and risked row duplication/loss under recomputation, and
    contradicted the repo's own stability convention in operators/explode).

    ``position_col`` (a per-row unique key the caller supplies, e.g. an
    order id) additionally spreads hot keys whose non-key columns are
    exact DUPLICATES — where a pure content hash is constant. Without it,
    duplicate hot rows share one bucket: still correct, just less spread
    for that (rare) shape. Map-typed columns are excluded from the hash
    (F.hash raises on MapType).
    """
    hashable = [
        F.col(f.name) for f in df.schema.fields if not _contains_map(f.dataType)
    ]
    if position_col is not None:
        hashable.append(
            F.col(position_col) if isinstance(position_col, str) else position_col
        )
    if not hashable:
        # every column is map-typed and no position key given: the salt
        # would be the CONSTANT 0 — silently disabling the skew spreading
        # this operator exists for. Fail loud instead of no-op quiet.
        raise ValueError(
            "salting needs at least one non-map column or an explicit "
            "position_col to derive a deterministic per-row salt "
            "(all columns are map-typed)"
        )
    return F.pmod(F.hash(*hashable).cast("long"), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
    position_col: str | Column | None = None,
) -> DataFrame:
    """Two-stage skew-proof aggregation: shuffle on (keys, salt) first, then
    merge per key.

    ``aggs`` maps output name → (partial_agg, merge_agg over the partial
    column), e.g. ``{"n": (F.count(F.lit(1)), F.sum("n"))}``. A hot key
    (the reference's 'baseline' colony; a boilerplate shingle) splits
    across ``buckets`` reducers in stage 1 instead of landing on one task;
    stage 2 shuffles only ``buckets`` rows per hot key. AQE's skew handling
    covers joins but NOT single-key aggregation blowups — this does.

    ``position_col``: optional per-row unique key; see _salt_expr for the
    determinism contract (content-hash salt, no nondeterministic ids).
    """
    # Algebraic aggregates (sum/count/min/max) already combine map-side;
    # salting matters for HOLISTIC aggregates (collect_set/list, exact
    # distinct bundles) whose per-key state must otherwise fit one reducer.
    # Salt = content hash (+ optional caller-supplied position key), not
    # spark_partition_id() alone: after an upstream shuffle/join on these
    # same keys a hot key sits in ONE partition, where a partition-id salt
    # is constant for exactly the rows that need spreading.
    salt = _salt_expr(df, buckets, position_col).alias("__salt")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[p.alias(name) for name, (p, _) in aggs.items()])
    )
    return stage1.groupBy(*keys).agg(
        *[m.alias(name) for name, (_, m) in aggs.items()]
    )


def json_bundle(cols: Sequence[str | Column], sort: bool = True) -> Column:
    """``to_json(collect_set(struct(...)))`` (A8 — gene datasets_raw_data,
    gene_mapper.py:649-668) with deterministic ordering."""
    s = F.collect_set(F.struct(*cols))
    if sort:
        s = F.sort_array(s)
    return F.to_json(s)


def basket_sets(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_basket: int | None = None,
) -> DataFrame:
    """(group, __items): each group's DISTINCT sorted item array, capped
    to the ``max_basket`` SMALLEST items (a deterministic slice — the
    same set as a row_number()-over-distinct cap ordered by item).

    The shared base of co-occurrence mining: pair generation AND
    per-item support counts both derive from the capped baskets. When
    one query needs both, build this frame once, ``localCheckpoint`` it,
    and pass it to ``co_occurrence_pairs(baskets_df=...)`` — otherwise
    Catalyst clones the whole distinct+cap shuffle per consumer (no
    cross-tree CSE; the r10 plan audit caught part_item_item_cf running
    it three times). NULL items are dropped (collect_set semantics —
    matches the DuckDB NULLS LAST row_number cap, which never lets a
    NULL displace a real item from the basket)."""
    items = F.array_sort(F.collect_set(item_col))
    if max_basket is not None:
        items = F.slice(items, 1, max_basket)
    return df.groupBy(group_col).agg(items.alias("__items"))


def co_occurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_basket: int | None = None,
    top_k: int | None = None,
    baskets_df: DataFrame | None = None,
) -> DataFrame:
    """Market-basket co-occurrence mining: count how often each UNORDERED
    item pair appears in the same group (order, session, document) →
    (item_a, item_b, n_groups), item_a < item_b, one count per group no
    matter how often either item repeats inside it.

    Plan: one groupBy collects each group's DISTINCT sorted item set,
    then pairs are generated ROW-LOCALLY (nested `transform` over the
    array — no self-join, so the exploded table and its shuffle are the
    pair list itself, not two copies of the input), then one counting
    aggregate with map-side combine. ``max_basket`` caps the per-group
    item set (pair fan-out is quadratic in basket size — a 10⁴-item
    pathological basket would emit 5·10⁷ pairs; capping keeps the most
    frequent-leading slice deterministic by item order). ``top_k`` cuts
    the result to the heaviest pairs via TakeOrdered (ties broken by
    (item_a, item_b) so the cut is deterministic). Pass ``baskets_df``
    (a — typically materialized — ``basket_sets`` frame) to reuse an
    existing basket build instead of re-deriving it.
    """
    baskets = (
        baskets_df
        if baskets_df is not None
        else basket_sets(df, group_col, item_col, max_basket)
    )
    arr = F.col("__items")
    pairs = F.flatten(
        F.transform(
            arr,
            lambda a, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda b: F.struct(a.alias("item_a"), b.alias("item_b")),
            ),
        )
    )
    counts = (
        baskets.select(F.explode(pairs).alias("p"))
        .groupBy("p.item_a", "p.item_b")
        .agg(F.count(F.lit(1)).alias("n_groups"))
    )
    if top_k is None:
        return counts
    return counts.orderBy(
        F.col("n_groups").desc(), F.col("item_a"), F.col("item_b")
    ).limit(top_k)


def hll_rollup(
    df: DataFrame,
    fine_keys: Sequence[str],
    coarse_keys: Sequence[str],
    count_col: str | Column,
    out: str = "approx_distinct",
    lgk: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """Two-level distinct-count rollup via MERGEABLE HLL sketches
    (``hll_sketch_agg`` → ``hll_union_agg``): the fine level aggregates raw
    rows once; the coarse level re-aggregates the fine level's SKETCHES —
    the raw data is scanned exactly once no matter how many rollup levels
    stack on top.

    This is the 100 TB answer to hierarchical distinct counts:
    ``approx_count_distinct`` is NOT re-aggregable (a per-(nation, day)
    count cannot roll up to per-nation without re-scanning the facts),
    while a Datasketches HLL sketch is a few KB and unions losslessly, so
    each extra level costs one shuffle of (group, sketch) rows — fleet
    telemetry, per-partition uniques, daily→monthly actives all reuse the
    same materialized fine level. ``lgk`` trades sketch size for accuracy
    (±~1.6% at the default 12).

    Returns ``(fine, coarse)`` frames, each with ``out`` = the estimate
    (rounded to a whole count); the fine frame keeps its binary sketch
    column (``__sketch``) so callers can persist it and roll further up
    later.
    """
    fine = df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(count_col, F.lit(lgk)).alias("__sketch")
    )
    fine_out = fine.withColumn(
        out, F.hll_sketch_estimate("__sketch").cast("long")
    )
    coarse = (
        fine.groupBy(*coarse_keys)
        .agg(F.hll_union_agg(F.col("__sketch")).alias("__merged"))
        .select(
            *coarse_keys,
            F.hll_sketch_estimate("__merged").cast("long").alias(out),
        )
    )
    return fine_out, coarse


def count_min_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan '05) over a
    column: ``depth`` md5-derived hash rows × ``width`` counters,
    returned sparse as (r, c, n) — at most depth×width rows whatever the
    input size.

    The mergeable-FREQUENCY sibling of the HLL distinct rollup: sketches
    from shards/partitions/days merge by summing counters (groupBy (r,c)
    sum — counters are linear), so a 100 TB corpus can keep per-partition
    sketches and answer "how often does item x appear overall?" without
    ever re-scanning or holding the full item dictionary. The build is
    one explode(depth) + map-side-combined groupBy whose reduced state is
    the depth×width counter grid, not the item domain. Deterministic
    md5 hashing — any engine replays the exact counters.
    """
    from impc_etl_spark.operators.sampling import hash_bucket

    pairs = F.array(*[
        F.struct(
            F.lit(j).alias("r"),
            hash_bucket([item_col], salt=f"{salt}:{j}",
                        num_buckets=width).alias("c"),
        )
        for j in range(depth)
    ])
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-query a count-min sketch: each item's estimate is the MIN of
    its ``depth`` counters — an upper bound on the true count (collisions
    only ever inflate), within εN with high probability for width ≈ e/ε.
    The sketch (≤ depth×width rows) broadcasts; the probe is a row-local
    key computation + broadcast join — no shuffle against the item side.
    A counter cell absent from the sparse sketch counts as 0 (LEFT join +
    coalesce), so never-inserted probe items estimate 0 instead of being
    dropped, and the min is over ALL depth counters — the true CMS
    min-over-counters, not min over the populated subset.
    """
    from impc_etl_spark.operators.sampling import hash_bucket

    pairs = F.array(*[
        F.struct(
            F.lit(j).alias("r"),
            hash_bucket([item_col], salt=f"{salt}:{j}",
                        num_buckets=width).alias("c"),
        )
        for j in range(depth)
    ])
    keyed = items.select(item_col, F.explode(pairs).alias("p")).select(
        item_col, F.col("p.r").alias("r"), F.col("p.c").alias("c")
    )
    return (
        keyed.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_count"))
    )


def bloom_filter_build(
    df: DataFrame,
    item_col: str,
    num_hashes: int = 4,
    num_bits: int = 1024,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter as the SPARSE set of set bit positions — one
    row per distinct position (≤ num_bits rows whatever the input size).

    The membership member of the mergeable-sketch family (HLL = distinct,
    CMS = frequency, Bloom = membership): filters merge by UNION-distinct
    of positions; "possibly present" can false-positive at the classic
    (1-e^{-kn/m})^k rate but never false-negative. Deterministic md5
    bit positions — any engine replays the same filter. At 100 TB the
    usual role is a pre-join guard: broadcast the KB-sized position set
    and drop the provably-absent rows before a shuffle join against the
    big side.
    """
    from impc_etl_spark.operators.sampling import hash_bucket

    bits = F.array(*[
        hash_bucket([item_col], salt=f"{salt}:{j}", num_buckets=num_bits)
        for j in range(num_hashes)
    ])
    return (
        df.select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_bit_counts(
    df: DataFrame,
    item_col: str,
    num_hashes: int = 4,
    num_bits: int = 1024,
    salt: str = "bloom",
) -> DataFrame:
    """COUNTING-Bloom build: (bit, n) where ``n`` is the number of
    (item-occurrence, hash-function) increments landing on that cell —
    the standard counting-Bloom cell value. Counts are LINEAR, so stores
    merge by summing and a deletion decrements each of the item's k cells
    symmetrically; ``n > 0`` recovers the plain Bloom bit set
    (``bloom_filter_build`` is that projection built directly)."""
    from impc_etl_spark.operators.sampling import hash_bucket

    bits = F.array(*[
        hash_bucket([item_col], salt=f"{salt}:{j}", num_buckets=num_bits)
        for j in range(num_hashes)
    ])
    return (
        df.select(F.explode(bits).alias("bit"))
        .groupBy("bit")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bloom_filter_probe(
    bloom: DataFrame,
    items: DataFrame,
    item_col: str,
    num_hashes: int = 4,
    num_bits: int = 1024,
    salt: str = "bloom",
) -> DataFrame:
    """Probe items against a Bloom filter: ``maybe_present`` is true iff
    ALL ``num_hashes`` bit positions are set. The filter broadcasts; the
    probe is row-local keys + broadcast anti/left joins — the item side
    never shuffles on data. An item is absent iff it has at least one
    UNSET bit (broadcast anti join), so duplicate probe rows and
    within-item hash collisions cannot distort a hit COUNT — the
    never-false-negative guarantee holds for any probe multiset."""
    from impc_etl_spark.operators.sampling import hash_bucket

    bits = F.array(*[
        hash_bucket([item_col], salt=f"{salt}:{j}", num_buckets=num_bits)
        for j in range(num_hashes)
    ])
    probe = items.select(item_col).distinct()
    keyed = probe.select(item_col, F.explode(bits).alias("bit"))
    missing = (
        keyed.join(F.broadcast(bloom), "bit", "left_anti")
        .select(item_col)
        .distinct()
        .withColumn("__missing", F.lit(True))
    )
    return probe.join(missing, item_col, "left").select(
        item_col,
        F.col("__missing").isNull().alias("maybe_present"),
    )


def association_rules(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_basket: int | None = None,
    min_support: int = 2,
    top_k: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Market-basket association rules on top of the pair counts:
    (antecedent → consequent, support, confidence, lift) for BOTH
    directions of every co-occurring pair. Confidence = n_ab / n_a,
    lift = n_ab·N / (n_a·n_b) — every operand an integer count, so the
    rounded ratios are IEEE-exact on any engine.

    Plan: baskets (distinct sorted per-group item sets, same
    ``max_basket`` cap as `co_occurrence_pairs`) are built ONCE and
    feed both the row-local pair expansion and the per-item counts;
    the group total N is a 1-row aggregate broadcast into the rule
    projection (the sanctioned scalar cross-join pattern). Two counting
    aggregates + one pair-keyed join — no self-join of the input."""
    items = F.array_sort(F.collect_set(item_col))
    if max_basket is not None:
        items = F.slice(items, 1, max_basket)
    baskets = df.groupBy(group_col).agg(items.alias("__items")).localCheckpoint(
        eager=True
    )
    arr = F.col("__items")
    pairs_expr = F.flatten(
        F.transform(
            arr,
            lambda a, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda b: F.struct(a.alias("item_a"), b.alias("item_b")),
            ),
        )
    )
    pair_counts = (
        baskets.select(F.explode(pairs_expr).alias("p"))
        .groupBy("p.item_a", "p.item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_support)
    )
    item_counts = (
        baskets.select(F.explode(arr).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    totals = baskets.agg(F.count(F.lit(1)).alias("n_total"))
    directed = pair_counts.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_ab",
    ).unionByName(
        pair_counts.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "n_ab",
        )
    )
    q = 10 ** round_to
    rules = (
        directed.join(
            F.broadcast(item_counts.withColumnRenamed("n_item", "n_ante")),
            directed.antecedent == F.col("item"),
        )
        .drop("item")
        .join(
            F.broadcast(item_counts.withColumnRenamed("n_item", "n_cons")),
            directed.consequent == F.col("item"),
        )
        .drop("item")
        .crossJoin(F.broadcast(totals))
        .select(
            "antecedent",
            "consequent",
            F.col("n_ab").alias("support"),
            (
                F.floor(
                    F.col("n_ab").cast("double") / F.col("n_ante") * q
                    + F.lit(0.5)
                )
                / q
            ).alias("confidence"),
            (
                F.floor(
                    (F.col("n_ab") * F.col("n_total")).cast("double")
                    / (F.col("n_ante") * F.col("n_cons"))
                    * q
                    + F.lit(0.5)
                )
                / q
            ).alias("lift"),
        )
    )
    if top_k is None:
        return rules
    return rules.orderBy(
        F.col("support").desc(), "antecedent", "consequent"
    ).limit(top_k)


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    by: Sequence[str] = (),
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test — the A/B comparison a
    release or experiment pipeline runs per segment (Welch 1947; the
    default two-sample test precisely because it does NOT assume equal
    variances):

        t  = (x̄a − x̄b) / sqrt(va/na + vb/nb)
        df = (va/na + vb/nb)² / ((va/na)²/(na−1) + (vb/nb)²/(nb−1))

    Moments come from sufficient statistics (n, Σx, Σx²) so a SQL oracle
    computes the IDENTICAL double expressions: mean = Σx/n and sample
    variance = (Σx² − Σx²/n)/(n−1) — not an engine's var_samp, whose
    streaming update order differs in the last ulp. Output one row per
    ``by`` group: (by…, n_a, mean_a, n_b, mean_b, t_stat, welch_df).
    Groups need n >= 2 on both sides (others emit NULL t/df via
    try_divide semantics — zero-variance pairs likewise).

    Scale shape: one partial-aggregated groupBy — three doubles per
    (by…, group) cell cross the exchange; the A/B pivot is a conditional
    aggregate, not a join. NULL values and rows outside the two groups
    are excluded.
    """
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    base = df.where(
        g.isin([group_a, group_b]) & F.col(value_col).isNotNull()
    )

    def side(tag, match):
        flt = F.when(match, v)
        return [
            F.count(flt).alias(f"n_{tag}"),
            F.sum(flt).alias(f"s_{tag}"),
            F.sum(flt * flt).alias(f"q_{tag}"),
        ]

    stats = base.groupBy(*by).agg(
        *side("a", g == group_a), *side("b", g == group_b)
    )

    def moments(tag):
        n = F.col(f"n_{tag}").cast("double")
        s, q = F.col(f"s_{tag}"), F.col(f"q_{tag}")
        mean = s / n
        var = F.try_divide(q - s * s / n, n - F.lit(1.0))
        return n, mean, var

    na, ma, va = moments("a")
    nb, mb, vb = moments("b")
    sea, seb = va / na, vb / nb
    t = F.try_divide(ma - mb, F.sqrt(sea + seb))
    dof = F.try_divide(
        (sea + seb) * (sea + seb),
        sea * sea / (na - F.lit(1.0)) + seb * seb / (nb - F.lit(1.0)),
    )
    return stats.select(
        *by,
        F.col("n_a"),
        ma.alias("mean_a"),
        F.col("n_b"),
        mb.alias("mean_b"),
        t.alias("t_stat"),
        dof.alias("welch_df"),
    )


def ks_binned(
    df: DataFrame,
    value_col: str,
    label_col: str,
    label_a,
    label_b,
    bins: int = 200,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance on a SHARED equal-width
    grid: D̂ = max over bin edges of |F̂a − F̂b| — the distribution-drift
    check (train/serve skew, release-to-release shift) evaluated the
    scale-safe way. The exact KS statistic needs a globally sorted
    merge of both samples (a single-partition sort at 100 TB); binning
    evaluates the ECDF difference only at ``bins`` grid edges, a
    standard discretization that UNDERESTIMATES D by at most the
    largest per-bin probability mass — companion of the PSI drift
    check, which weights the same histogram differences by log-ratio.

    Scale shape: one 1-row min/max aggregate broadcast back (the
    value_histogram pattern), one partial-aggregated (label, bin)
    groupBy — grid-sized — then the cumulative sums run on the ≤bins-row
    table (a single-partition window over a GRID, not data). Output one
    row: (n_a, n_b, ks_stat). NULL values and other labels excluded;
    degenerate min==max puts everything in bin 0 and D̂ = 0.
    """
    from pyspark.sql import Window

    lbl = F.col(label_col)
    base = df.where(
        lbl.isin([label_a, label_b]) & F.col(value_col).isNotNull()
    ).select(lbl.alias("__lbl"), F.col(value_col).cast("double").alias("__v"))
    bounds = base.agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    binned = base.crossJoin(F.broadcast(bounds)).select(
        "__lbl",
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.floor((F.col("__v") - F.col("__lo")) / width),
                F.lit(bins - 1),
            )
        ).cast("int").alias("__bin"),
    )
    # grid-sized counts MATERIALIZED (r10): two consumers (cdf + totals)
    # would each re-run the whole bounds+bin subtree — 4 base-table
    # scans audited in orders_ks_yearly_drift, 2 after (the bounds pass
    # and the binning pass, the unavoidable pair for data-derived bins)
    counts = binned.groupBy("__bin").agg(
        F.count(F.when(F.col("__lbl") == label_a, 1)).alias("__ca"),
        F.count(F.when(F.col("__lbl") == label_b, 1)).alias("__cb"),
    ).localCheckpoint(eager=True)
    w = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = counts.select(
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
    )
    totals = counts.agg(
        F.sum("__ca").alias("n_a"), F.sum("__cb").alias("n_b")
    )
    return (
        cdf.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(
                    # try_divide: an absent label (n=0) must yield NULL,
                    # not an ANSI divide-by-zero crash (r10; the oracle's
                    # nullif(…, 0.0) mirrors it)
                    F.try_divide(
                        F.col("__cuma").cast("double"), F.col("n_a").cast("double")
                    )
                    - F.try_divide(
                        F.col("__cumb").cast("double"), F.col("n_b").cast("double")
                    )
                )
            ).alias("ks_stat"),
        )
        # EMPTY input (both labels absent): the global agg would emit one
        # all-NULL row while a SQL oracle's GROUP BY over the empty grid
        # emits zero — drop it so both engines agree (r9 ADVICE)
        .where(F.col("n_a").isNotNull() | F.col("n_b").isNotNull())
    )


def rank_sum_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum — the NONPARAMETRIC two-sample
    test (Mann & Whitney 1947): compares whole distributions by rank, so
    it sees median/shape shifts Welch's mean-based t misses and is immune
    to the heavy tails that dominate revenue-like columns. Average ranks
    for ties, normal approximation with the standard tie correction:

        U_a = R_a − na(na+1)/2
        z   = (U_a − na·nb/2) / sqrt(na·nb/12 · ((n+1) − Σ(t³−t)/(n(n−1))))

    EXACT ranks at scale without a global sort: ranks are computed on the
    DISTINCT-VALUE count table (one partial-aggregated groupBy), and the
    running count C(<v) each average rank needs comes from
    ``ranged_prefix_sums`` — range-partitioned local windows plus a
    numPartitions-row offset broadcast, never a single-partition window.
    Rank arithmetic stays in BIGINT (2·avgrank = 2·C(<v) + t + 1 is
    integer) so a SQL oracle reproduces it bit-exactly; the test statistic
    converts to double only at the end. Output one row:
    (n_a, n_b, r_a, u_stat, z_stat); empty input emits zero rows. NULL
    and NaN values are excluded (the engine-wide bad-point contract);
    rows outside the two groups are ignored. Degenerate cases (either
    side empty, or all values tied so the variance is 0) yield NULL z
    via try_divide.
    """
    from impc_etl_spark.operators.partitioning import ranged_prefix_sums

    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    base = df.where(
        g.isin([group_a, group_b])
        & F.col(value_col).isNotNull()
        & ~F.isnan(v)
    ).select(g.alias("__g"), v.alias("__v"))
    counts = base.groupBy("__v").agg(
        F.count(F.when(F.col("__g") == group_a, 1)).alias("__na_v"),
        F.count(F.lit(1)).alias("__t"),
    )
    cum = ranged_prefix_sums(counts, ["__v"], ["__t"])
    # 2·avgrank(v) = 2·C(<v) + t(v) + 1  (integer — halved at the end)
    r2 = cum.select(
        (F.col("__na_v") * (2 * F.col("__cum___t") + F.col("__t") + 1)).alias(
            "__r2a"
        ),
        F.col("__na_v"),
        (F.col("__t") - F.col("__na_v")).alias("__nb_v"),
        (F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")).alias(
            "__ties"
        ),
    )
    stats = r2.agg(
        F.sum("__r2a").alias("__r2a"),
        F.sum("__na_v").alias("n_a"),
        F.sum("__nb_v").alias("n_b"),
        F.sum("__ties").alias("__ties"),
    ).where(F.col("n_a").isNotNull())  # empty input → zero rows, not NULLs
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    ra = F.col("__r2a").cast("double") / F.lit(2.0)
    u = ra - na * (na + F.lit(1.0)) / F.lit(2.0)
    var = (
        na * nb / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("__ties").cast("double")
           / (n * (n - F.lit(1.0))))
    )
    z = F.try_divide(u - na * nb / F.lit(2.0), F.sqrt(var))
    return stats.select(
        "n_a", "n_b",
        ra.alias("r_a"),
        u.alias("u_stat"),
        z.alias("z_stat"),
    )


def chi2_independence(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Pearson chi-squared test of independence over a contingency table,
    plus Cramér's V (the [0,1] effect size χ²/(n·min(r−1,c−1)) — the
    categorical-association check a feature-selection or drift pipeline
    runs between label-like columns:

        χ² = Σ_cells (O − E)²/E,   E = row_total · col_total / n

    Scale shape: ONE partial-aggregated groupBy builds the observed
    cell counts (grid-sized: |x|·|y| rows); row/column totals are
    windows PARTITIONED by the respective category over that grid table,
    never over data; the final χ² is a scalar aggregate. Everything
    after the first exchange runs on the grid. Output one row:
    (n, n_rows, n_cols, dof, chi2, cramers_v); empty input emits zero
    rows; NULL categories are excluded. A single-category axis gives
    dof = 0 and NULL chi2/V via try_divide.
    """
    from pyspark.sql import Window

    base = df.where(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    cells = base.groupBy(
        F.col(col_x).alias("__x"), F.col(col_y).alias("__y")
    ).agg(F.count(F.lit(1)).alias("__o"))
    rw = Window.partitionBy("__x")
    cw = Window.partitionBy("__y")
    gw = Window.partitionBy()  # global — over the GRID table, not data
    with_tot = cells.select(
        "__o",
        F.sum("__o").over(rw).alias("__rt"),
        F.sum("__o").over(cw).alias("__ct"),
        F.sum("__o").over(gw).alias("__n"),
        # DISTINCT aggregates are unsupported in windows — collect_set
        # over the grid-sized frame is the standard substitute
        F.size(F.collect_set("__x").over(gw)).cast("bigint").alias("__nx"),
        F.size(F.collect_set("__y").over(gw)).cast("bigint").alias("__ny"),
    )
    # E = rt·ct/n; (O − E)²/E with the algebra ordered so both engines
    # evaluate the identical double expression tree
    e = (
        F.col("__rt").cast("double")
        * F.col("__ct").cast("double")
        / F.col("__n").cast("double")
    )
    o = F.col("__o").cast("double")
    out = with_tot.agg(
        F.sum("__o").alias("n"),
        F.max("__nx").alias("n_rows"),
        F.max("__ny").alias("n_cols"),
        F.sum((o - e) * (o - e) / e).alias("chi2"),
    ).where(F.col("n").isNotNull())
    dof = (F.col("n_rows") - 1) * (F.col("n_cols") - 1)
    v = F.sqrt(
        F.try_divide(
            F.col("chi2"),
            F.col("n").cast("double")
            * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1).cast("double"),
        )
    )
    return out.select(
        "n", "n_rows", "n_cols",
        dof.alias("dof"),
        F.try_divide(F.col("chi2"), F.when(dof > 0, F.lit(1.0))).alias("chi2"),
        v.alias("cramers_v"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Spearman rank correlation ρ — Pearson on tie-averaged ranks, the
    monotone-association check that ignores the heavy tails and
    nonlinearity Pearson-on-values chokes on (price vs quantity,
    quality-score vs human label). Exact ranks WITHOUT a global sort,
    the `rank_sum_test` recipe applied per column: each column's ranks
    come from its DISTINCT-VALUE count table + ``ranged_prefix_sums``,
    joined back to the rows on the value (merge-hinted — a data-sized
    rank table must never broadcast). All rank arithmetic uses the
    INTEGER 2·avgrank (Pearson is scale-invariant, so ρ(2rx, 2ry) =
    ρ(rx, ry) and the oracle replays the same BIGINT ranks); the moment
    sums convert to double (n·Σr² overflows BIGINT past ~2M rows).

    Output one row: (n, rho); empty input emits zero rows; NULL/NaN in
    EITHER column drops the row (pairwise-complete, the bad-point
    contract); a constant column (zero rank variance) yields NULL rho
    via try_divide.

    Scale shape: two distinct-value groupBys + two grid prefix passes +
    two merge joins back to the rows + ONE moment aggregate (six
    doubles cross the final exchange).
    """
    from impc_etl_spark.operators.partitioning import ranged_prefix_sums

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.where(
        F.col(x_col).isNotNull() & ~F.isnan(x)
        & F.col(y_col).isNotNull() & ~F.isnan(y)
    ).select(x.alias("__x"), y.alias("__y"))

    def rank2_table(col: str, out: str) -> DataFrame:
        counts = base.groupBy(col).agg(F.count(F.lit(1)).alias("__t"))
        cum = ranged_prefix_sums(counts, [col], ["__t"])
        return cum.select(
            col,
            (2 * F.col("__cum___t") + F.col("__t") + 1).alias(out),
        )

    rx = rank2_table("__x", "__rx")
    ry = rank2_table("__y", "__ry")
    ranked = (
        base.join(rx.hint("merge"), "__x")
        .join(ry.hint("merge"), "__y")
        .select(
            F.col("__rx").cast("double").alias("__rx"),
            F.col("__ry").cast("double").alias("__ry"),
        )
    )
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__rx").alias("__sx"),
        F.sum("__ry").alias("__sy"),
        F.sum(F.col("__rx") * F.col("__rx")).alias("__sxx"),
        F.sum(F.col("__ry") * F.col("__ry")).alias("__syy"),
        F.sum(F.col("__rx") * F.col("__ry")).alias("__sxy"),
    ).where(F.col("__sx").isNotNull())  # empty input → zero rows
    n = F.col("n").cast("double")
    num = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = F.sqrt(
        (n * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
        * (n * F.col("__syy") - F.col("__sy") * F.col("__sy"))
    )
    return stats.select("n", F.try_divide(num, den).alias("rho"))


def bh_fdr(
    df: DataFrame,
    p_col: str,
    key_cols: Sequence[str],
    q: float = 0.1,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control (Benjamini & Hochberg 1995)
    over a table of hypotheses — the multiple-testing correction a
    screen of per-segment tests needs before acting on 'significant'
    segments: sort the m p-values ascending, find the LARGEST k with
    p_(k) ≤ k·q/m, reject hypotheses 1..k.

    Scale shape: the ranks come from ``ranged_prefix_sums`` over the
    hypothesis table (range-partitioned local windows — no global
    single-partition sort even when 'hypotheses' means millions of
    segments), and the step-up cutoff reduces to ONE broadcast scalar:
    ties cannot straddle k (if p_(k+1) = p_(k) then p_(k+1) ≤ k·q/m <
    (k+1)·q/m would extend k), so 'rank ≤ k' is EXACTLY 'p ≤ p_(k)' and
    rejection is a row-local compare against max(p among passing rows).
    ``key_cols`` must uniquely identify hypotheses (rank tie-break).
    Output: key_cols, p_value, bh_rank, m, bh_threshold, rejected. NULL
    and NaN p-values are excluded.

    r10: the hypothesis table and the ranked/flagged frame are each
    MATERIALIZED once — `base` feeds the rank pass AND the m count
    (each would re-run the caller's data-sized per-segment aggregation:
    customer_urgent_bh_fdr audited at 4 orders scans, 2 after — the
    rollup + the global-rate pass), and `flagged` feeds the cutoff
    aggregate AND the final projection (each would re-sort the
    hypothesis windows). Both frames are narrow (keys + p + rank).
    """
    from impc_etl_spark.operators.partitioning import ranged_prefix_sums

    p = F.col(p_col).cast("double")
    base = df.where(p.isNotNull() & ~F.isnan(p)).select(
        *key_cols, p.alias("__p"), F.lit(1).alias("__one")
    ).localCheckpoint(eager=True)
    ranked = ranged_prefix_sums(base, ["__p", *key_cols], ["__one"]).select(
        *key_cols,
        "__p",
        (F.col("__cum___one") + 1).alias("__rank"),
    )
    m = base.agg(F.count(F.lit(1)).alias("__m"))
    with_m = ranked.crossJoin(F.broadcast(m))
    thresh = (
        F.col("__rank").cast("double")
        * F.lit(float(q))
        / F.col("__m").cast("double")
    )
    flagged = with_m.withColumn(
        "__pass", F.col("__p") <= thresh
    ).localCheckpoint(eager=True)
    cutoff = flagged.agg(
        F.max(F.when(F.col("__pass"), F.col("__p"))).alias("__cut")
    )
    return (
        flagged.crossJoin(F.broadcast(cutoff))
        .select(
            *key_cols,
            F.col("__p").alias("p_value"),
            F.col("__rank").alias("bh_rank"),
            F.col("__m").alias("m"),
            thresh.alias("bh_threshold"),
            F.coalesce(F.col("__p") <= F.col("__cut"), F.lit(False)).alias(
                "rejected"
            ),
        )
    )


def survival_km(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier
    1958) over right-censored subject lifetimes — the churn/retention
    curve: one input row per subject with an integer ``duration_col``
    (time observed) and ``event_col`` 1 if the terminal event was seen,
    0 if the subject was censored at that duration.

    Scale shape: ONE groupBy collapses N subjects to the distinct-
    duration GRID (bounded by the time range, not the data); everything
    after — at-risk counts, the product-limit itself — runs on that
    grid, so the only data-sized work is the first partial-aggregated
    shuffle. The at-risk count n(t) = N − Σ_{u<t}(d_u + c_u) and the
    survival product both come from grid windows.

    Cross-engine determinism: running SUM over ordered doubles is NOT
    portable (Spark evaluates the frame sequentially, DuckDB by segment
    tree — different float addition order), so the product Π(1 − d/n)
    is carried in log-space QUANTIZED TO INTEGER MICRO-UNITS: each
    factor's ln is floored to an exact multiple of 1e-12 held in BIGINT,
    the window sum is integer (bit-exact in any evaluation order), and
    exp() is applied once per row. The quantization bias is ≤ grid_rows
    · 5e-13 — far below the 6-dp reporting precision — and an oracle
    replays the identical integers. Once the at-risk set hits d == n
    the curve is exactly 0 from that row on (min-over-window guard, no
    ln(0) on either engine).

    Output per distinct duration: duration, n_risk, n_events,
    n_censored, survival. Empty input → zero rows. NULL durations are
    dropped; event values are clamped to {0,1} via (event != 0).
    """
    dur = F.col(duration_col)
    ev = F.when(F.col(event_col).cast("int") != 0, 1).otherwise(0)
    base = df.where(dur.isNotNull()).select(
        dur.alias("__dur"), ev.alias("__ev")
    )
    # The grid is MATERIALIZED (localCheckpoint; grid-sized by contract)
    # and the subject total N derives from it (N = Σ(d_u + c_u) —
    # identical BIGINT to counting base rows): without this, `base` had
    # two consumers (grid + total) and the caller's whole data-sized
    # per-subject rollup ran twice (r10 plan audit:
    # customer_survival_km scanned orders 4×, 1 after).
    grid = base.groupBy("__dur").agg(
        F.sum("__ev").cast("bigint").alias("n_events"),
        F.sum(1 - F.col("__ev")).cast("bigint").alias("n_censored"),
    ).localCheckpoint(eager=True)
    total = grid.agg(
        F.sum(F.col("n_events") + F.col("n_censored")).alias("__n")
    )
    w_prev = Window.orderBy("__dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("__dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = (
        grid.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            (
                F.col("__n")
                - F.coalesce(
                    F.sum(F.col("n_events") + F.col("n_censored")).over(
                        w_prev
                    ),
                    F.lit(0),
                )
            ).cast("bigint"),
        )
        .drop("__n")
    )
    surv_n = F.col("n_risk") - F.col("n_events")  # survivors this step
    li = F.when(surv_n <= 0, F.lit(0).cast("bigint")).otherwise(
        F.floor(
            F.log(surv_n.cast("double") / F.col("n_risk").cast("double"))
            * 1e12
            + F.lit(0.5)
        ).cast("bigint")
    )
    out = risk.withColumn("__li", li)
    zero_hit = F.min(F.when(surv_n <= 0, 0).otherwise(1)).over(w_cum)
    cum_li = F.sum(
        F.when(surv_n <= 0, F.lit(0).cast("bigint")).otherwise(F.col("__li"))
    ).over(w_cum)
    survival = F.when(zero_hit == 0, F.lit(0.0)).otherwise(
        F.exp(cum_li.cast("double") / F.lit(1e12))
    )
    return out.select(
        F.col("__dur").alias("duration"),
        "n_risk",
        "n_events",
        "n_censored",
        survival.alias("survival"),
    )


def gini_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    key_col: str,
) -> DataFrame:
    """Per-group inequality / concentration profile: Gini coefficient,
    Herfindahl-Hirschman index, and top-1 share of a non-negative value
    (spend, revenue, token counts per domain) — the 'how concentrated
    is this distribution' triple a corpus-mix or revenue audit asks.

    Gini uses the rank formula G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over
    values sorted ascending WITHIN each group. Per-group ranks are
    computed WITHOUT a per-group single-task window (a PARTITION BY
    with millions of rows per group funnels each group through one
    task): one global ``ranged_prefix_sums`` pass ordered
    (group, value, key) yields global exclusive row counts, and a
    second, GROUP-COUNT-sized prefix pass yields each group's starting
    offset; rank-in-group is their difference — two range shuffles
    regardless of group fan-out. Σ i·xᵢ is invariant to tie order
    within equal values (consecutive ranks × the same x), so the
    (value, key) sort is deterministic AND tie-order-proof, and an
    oracle's row_number() replays it exactly.

    ``key_col`` must be unique within a group. NULL/NaN/negative values
    are dropped (Gini is defined for non-negative supports). Output per
    group: n, total, gini, hhi (Σ shares²), top_share. Groups with zero
    total emit NULL ratios via try_divide.
    """
    from impc_etl_spark.operators.partitioning import ranged_prefix_sums

    v = F.col(value_col).cast("double")
    base = df.where(
        v.isNotNull() & ~F.isnan(v) & (v >= 0)
    ).select(*group_cols, v.alias("__v"), F.col(key_col).alias("__k"))
    ranked = ranged_prefix_sums(
        base.withColumn("__one", F.lit(1)),
        [*group_cols, "__v", "__k"],
        ["__one"],
    )
    gcounts = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__gc")
    )
    goff = ranged_prefix_sums(gcounts, list(group_cols), ["__gc"]).select(
        *group_cols, F.col("__cum___gc").alias("__goff")
    )
    # goff is GROUP-COUNT-sized (not data-sized): leave the strategy to
    # AQE — broadcast when small, shuffle join when the group fan-out is
    # itself huge. Forcing merge here would reshuffle the data-sized side
    # into group-count partitions (25 nations → 25 tasks: skew by design).
    with_rank = ranked.join(goff, list(group_cols)).select(
        *group_cols,
        "__v",
        (F.col("__cum___one") - F.col("__goff") + 1).alias("__rank"),
    )
    agg = with_rank.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__v").alias("__sum"),
        F.sum(F.col("__rank").cast("double") * F.col("__v")).alias("__srx"),
        F.sum(F.col("__v") * F.col("__v")).alias("__sxx"),
        F.max("__v").alias("__mx"),
    )
    n = F.col("n").cast("double")
    gini = F.try_divide(
        F.lit(2.0) * F.col("__srx"), n * F.col("__sum")
    ) - (n + 1) / n
    hhi = F.try_divide(F.col("__sxx"), F.col("__sum") * F.col("__sum"))
    top = F.try_divide(F.col("__mx"), F.col("__sum"))
    return agg.select(
        *group_cols,
        "n",
        F.col("__sum").alias("total"),
        gini.alias("gini"),
        hhi.alias("hhi"),
        top.alias("top_share"),
    )
