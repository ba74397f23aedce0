"""Data profiling — per-column QA stats in one pass.

Release pipelines live or die on input QA (the reference's answer is the
release-diff report plus scattered null-drop counts). ``profile`` computes
per-column row/null/distinct counts over any frame in a single aggregation
job and returns them as rows — cheap enough to run per DAG stage and
store next to the stage parquet.

Scale: one aggregation, no shuffle of data rows (global agg = partials +
single merge). ``count_distinct`` over many columns multiplies the Expand
factor — pass ``approx=True`` at 100 TB to use HLL sketches instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct)."""
    cols = list(columns) if columns else df.columns
    distinct_fn = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(distinct_fn(F.col(c)).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("n_distinct"),
        )
        for c in cols
    ])
    return row.select(F.explode(entries).alias("p")).select("p.*")


def skew_report(
    df: DataFrame,
    columns: Sequence[str],
    top_k: int = 5,
) -> DataFrame:
    """Key-skew diagnosis per candidate join/grouping column: the decision
    input for salting, broadcast thresholds, and AQE skew-join tuning
    BEFORE a 100 TB shuffle is attempted. One row per column —
    ``(column, n_keys, max_count, p50_count, p99_count, max_share,
    top_keys)`` where ``max_share`` is the heaviest key's fraction of all
    rows (the salting trigger) and ``top_keys`` the ``top_k`` heaviest
    keys with counts, heaviest first.

    Cost: one map-side-combined groupBy per column over that column only
    (16-byte-ish shuffle keys), then a tiny percentile/TakeOrdered
    reduction over the per-key count table — never the raw rows twice.
    """
    out = None
    for c in columns:
        # the per-key count table feeds TWO consumers (the 1-row stats
        # aggregate and the top-k cut) — materialize it once per column
        # or Catalyst clones the full scan+groupBy subtree per consumer
        # (2 base scans per column, 4 total for the registered 2-column
        # report in the r10 plan audit; 2 after). The checkpoint holds
        # (key, count) rows only — the raw data never materializes.
        counts = df.groupBy(F.col(c).cast("string").alias("__k")).agg(
            F.count(F.lit(1)).alias("__c")
        ).localCheckpoint(eager=True)
        stats = counts.agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("__c").alias("max_count"),
            F.expr("percentile(__c, 0.5)").alias("p50_count"),
            F.expr("percentile(__c, 0.99)").alias("p99_count"),
            # portable 6-dp rounding (queries._rnd form)
            (F.floor(F.max("__c") / F.sum("__c") * 1000000 + F.lit(0.5)) / 1000000)
            .alias("max_share"),
        )
        # top-k keys cut FIRST (TakeOrdered over the count table), then the
        # k-row frame collapses to an array — state is bounded by top_k, a
        # collect_list over the full key table would not be
        top = counts.orderBy(F.col("__c").desc(), F.col("__k")).limit(top_k)
        top_arr = top.agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("__c")).alias("nc"), "__k"))
                ),
                lambda s: s["__k"],
            ).alias("top_keys")
        )
        row = stats.crossJoin(F.broadcast(top_arr))
        out = row if out is None else out.unionByName(row)
    return out


def value_histogram(
    df: DataFrame,
    column: str,
    num_bins: int = 10,
) -> DataFrame:
    """Equal-width histogram over a numeric column: one row per occupied
    bin — ``(bin, lo, hi, n)`` — computed from two single-scan
    aggregates (min/max broadcast as one row, then a width_bucket-style
    bin id + count). Distribution shape at a glance for partition-bound
    and salting decisions; empty bins are simply absent (join a
    ``sequence()`` grid if a dense axis is needed).

    The last bin is closed on both ends (max lands in bin num_bins-1,
    not a one-value overflow bin) — matching SQL width_bucket semantics
    minus its overflow buckets.
    """
    c = F.col(column).cast("double")
    bounds = df.agg(F.min(c).alias("__lo"), F.max(c).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(num_bins))
    bin_id = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(num_bins - 1),
            F.floor((c - F.col("__lo")) / width).cast("int"),
        )
    )
    tagged = (
        df.where(c.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .withColumn("__bin", bin_id)
    )
    out_width = (F.col("__h") - F.col("__l")) / F.lit(float(num_bins))
    lo_edge = F.col("__l") + F.col("__bin") * out_width
    hi_edge = F.col("__l") + (F.col("__bin") + 1) * out_width
    return (
        tagged.groupBy("__bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("__lo").alias("__l"),
            F.first("__hi").alias("__h"),
        )
        .select(
            F.col("__bin").alias("bin"),
            # portable 6-dp rounding on the edges for oracle replay
            (F.floor(lo_edge * 1000000 + F.lit(0.5)) / 1000000).alias("lo"),
            (F.floor(hi_edge * 1000000 + F.lit(0.5)) / 1000000).alias("hi"),
            F.col("n"),
        )
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    k: float = 3.5,
    out: str = "is_outlier",
) -> DataFrame:
    """Median/MAD outlier flag (per group): ``|x - median| > k·MAD`` —
    the robust alternative to mean/stddev z-scores (one wild value can't
    drag the threshold, which is the failure mode of stddev cleaning on
    heavy-tailed metrics like doc lengths or prices).

    Two grouped percentile aggregations (median, then MAD of residuals)
    with the tiny per-group stat tables broadcast back — the data shuffles
    ZERO times; groups are assumed low-cardinality (status codes,
    sources); for high-cardinality groups let the joins shuffle by
    dropping the broadcast hint at the call site. All-equal groups have
    MAD 0: only exact deviations flag, matching the textbook definition.
    """
    g = [F.col(c) for c in group_cols]
    v = F.col(value_col).cast("double")
    # the per-group median table feeds both the MAD aggregation and the
    # final scoring join — materialize the grid-sized frame once (its
    # clone re-ran the full percentile scan: 4 base scans in the r10
    # plan audit, 3 after — the MAD-inherent pass count: median, MAD,
    # score)
    med_tbl = df.groupBy(*g).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    ).localCheckpoint(eager=True)
    with_med = (
        df.join(F.broadcast(med_tbl), list(group_cols)) if group_cols
        else df.crossJoin(F.broadcast(med_tbl))
    )
    mad_tbl = (
        with_med.withColumn("__res", F.abs(v - F.col("__med")))
        .groupBy(*g)
        .agg(F.expr("percentile(__res, 0.5)").alias("__mad"))
    )
    scored = (
        with_med.join(F.broadcast(mad_tbl), list(group_cols)) if group_cols
        else with_med.crossJoin(F.broadcast(mad_tbl))
    )
    return scored.withColumn(
        out, F.abs(v - F.col("__med")) > F.lit(float(k)) * F.col("__mad")
    ).drop("__med", "__mad")
