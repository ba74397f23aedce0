"""Time-window aggregation over event tables.

The reference has NO streaming (SURVEY.md §2.9) — its 'time series' are
batch array explosions. These operators are the north-star extension for the
`events` table: tumbling/sliding/session windows as batch `window()` groupBy
(semantically identical to Structured Streaming's windowed aggregation; the
streaming wrappers in impc_etl_spark.streaming reuse them verbatim).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    start_alias: str = "window_start",
) -> DataFrame:
    """Fixed, non-overlapping windows: groupBy(window(ts, d), keys).agg(...).

    The window struct is flattened to an epoch-seconds start so results are
    engine-portable (time_bucket in ANSI SQL). Partial aggregation happens
    map-side; the shuffle key is (window, keys) — naturally balanced unless
    one key floods one window (salt then re-merge if so).
    """
    w = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(w.alias("__w"), *keys)
        .agg(*aggs)
        .withColumn(start_alias, F.unix_timestamp(F.col("__w.start")))
        .drop("__w")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    start_alias: str = "window_start",
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows —
    input amplification is the cost knob at scale (prefer tumbling +
    post-hoc rolling sums over windows when slide ≪ duration)."""
    w = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(w.alias("__w"), *keys)
        .agg(*aggs)
        .withColumn(start_alias, F.unix_timestamp(F.col("__w.start")))
        .drop("__w")
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Session windows (gap-based) in batch: F.session_window groupBy.

    Equivalent SQL (the classic islands pattern): lag + cumulative sum of
    gap-breaks — used as the oracle since DuckDB has no session_window.
    """
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("__w"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.unix_timestamp(F.col("__w.start")))
        .withColumn("session_end", F.unix_timestamp(F.col("__w.end")))
        .drop("__w")
    )


def resample_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    step: str = "1 hour",
    tie_cols: Sequence[str] = (),
    out_time: str = "bucket_start",
    out_value: str = "value_ffill",
) -> DataFrame:
    """Regularize a per-key series onto a fixed time grid with forward
    fill: one row per (key, grid bucket) between that key's first and
    last observation; empty buckets carry the last observed value —
    gap-filling for downstream window math that assumes dense series.

    In-bucket collisions resolve deterministically to the LATEST
    observation (``max_by`` on (time, *tie_cols)). Scale shape: one
    (key, bucket) pre-aggregation shuffle, a tiny per-key bounds agg, a
    grid explode bounded by span/step per key, an equi join back on
    (key, bucket), and the forward-fill window partitioned BY KEY — no
    global window anywhere. Keys with century-long spans at second steps
    would explode the grid: bound ``step`` to the span you query.

    ``step`` accepts any fixed-width "N second(s)/minute(s)/hour(s)/
    day(s)/week(s)" interval; the bucket is epoch-floored by the SAME
    width the grid steps at, so e.g. '30 minutes' buckets on half-hour
    boundaries. Calendar-width units (month/year) raise — their buckets
    would not align with the fixed-duration grid sequence.
    """
    import re

    from pyspark.sql import Window

    m = re.fullmatch(
        r"(\d+)\s+(second|minute|hour|day|week)s?", step.strip(), re.IGNORECASE
    )
    if not m:
        raise ValueError(
            f"resample_ffill: unsupported step {step!r} — use a fixed-width "
            "'N second(s)/minute(s)/hour(s)/day(s)/week(s)' interval"
        )
    step_s = int(m.group(1)) * {
        "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
    }[m.group(2).lower()]

    keys = [F.col(k) for k in key_cols]
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(time_col)) / step_s).cast("long") * step_s
    )
    pts = (
        df.withColumn("__b", bucket)
        .groupBy(*keys, F.col("__b"))
        .agg(
            F.max_by(
                F.col(value_col),
                F.struct(F.col(time_col), *[F.col(c) for c in tie_cols]),
            ).alias("__v")
        )
    )
    bounds = pts.groupBy(*keys).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    # the grid steps in EPOCH SECONDS, not INTERVAL arithmetic: interval
    # day/week addition is calendar-aware in the session timezone, so a
    # DST transition would shift the grid off the epoch-floored buckets
    # above and silently drop every post-transition observation from the
    # join — epoch stepping keeps both sides on exact step_s multiples
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(
                F.unix_timestamp("__lo"),
                F.unix_timestamp("__hi"),
                F.lit(step_s).cast("long"),
            )
        ).alias("__bs"),
    ).select(*keys, F.timestamp_seconds(F.col("__bs")).alias("__b"))
    joined = grid.join(pts, [*key_cols, "__b"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        *key_cols,
        F.col("__b").alias(out_time),
        F.last("__v", ignorenulls=True).over(w).alias(out_value),
    )


def rolling_zscore(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    n: int = 20,
    threshold: float = 3.0,
    tiebreak_cols: Sequence[str] = (),
    out: str = "zscore",
) -> DataFrame:
    """Rolling anomaly score: each point's z-score against the mean/stddev
    of its PRECEDING ``n`` points per key — trailing-window telemetry
    anomaly detection (a leading/centered window would leak the point
    into its own baseline).

    One key-partitioned ordered window computes avg, stddev and count
    over the same (-n, -1) row frame — a single exchange, streaming frame
    evaluation (bounded buffer of n rows per key, no whole-group state).
    Points with fewer than 2 predecessors or a zero-variance baseline get
    a NULL score (flagged false). ``stddev_samp`` matches the SQL oracle
    exactly; ties in ``ts_col`` are ordered by ``tiebreak_cols`` so the
    frame contents are deterministic.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, *tiebreak_cols)
        .rowsBetween(-n, -1)
    )
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    cnt = F.count(value_col).over(w)
    z = F.when(
        (cnt >= 2) & (sd > 0), (F.col(value_col) - mean) / sd
    )
    return df.withColumn(out, z).withColumn(
        "is_anomaly", F.coalesce(F.abs(F.col(out)) > threshold, F.lit(False))
    )


def _series_recurrence_map(
    df: DataFrame,
    key_cols: Sequence[str],
    sort_cols: Sequence[str],
    value_col: str,
    extra_cols: Sequence[tuple[str, str, str]],
    runner,
) -> DataFrame:
    """Shared engine for the per-key linear-recurrence family
    (ewma / holt_linear / holt_winters_additive / cusum).

    The r9 form was ``groupBy(keys).applyInPandas`` — semantically right,
    but each GROUP pays its own pandas DataFrame build, mergesort,
    copy and Arrow conversion; with many small keys (1,500 users ×
    ~67 events at sf0.1) that per-group overhead dominated the O(n)
    recurrence ~30× (cusum measured 11.0 s → 0.8 s, r10). This runs ONE
    ``mapInPandas`` per partition instead: hash-repartition by key, sort
    within partitions by (keys, sort_cols) — NULLS LAST to mirror the
    old per-group ``sort_values(na_position='last')`` — and stream the
    Arrow batches through a single mapper that detects key boundaries
    and carries the trailing (possibly batch-spanning) group to the next
    batch. Memory stays bounded by one batch + one key's series, the
    same contract as before. ``runner(values) -> tuple(list, ...)`` is
    byte-for-byte the old per-group loop, so every output value is
    bit-identical; only physical grouping changed.

    ``extra_cols``: (name, spark_ddl_type, pandas_dtype) per output col.
    """
    import pandas as pd

    keys = list(key_cols)
    schema_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + "".join(f", `{n}` {t}" for n, t, _ in extra_cols)
    out_names = [n for n, _, _ in extra_cols]
    out_dtypes = [d for _, _, d in extra_cols]

    parted = df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *[F.col(k).asc_nulls_last() for k in keys],
        *[F.col(c).asc_nulls_last() for c in sort_cols],
    )

    def _key_tuples(pdf: "pd.DataFrame"):
        cols = [pdf[k].to_list() for k in keys]
        # NULL keys form ONE group (Spark groupBy semantics): normalize
        # None/NaN/NaT to None so tuple equality treats them as equal
        return [
            tuple(
                None if (v is None or v != v) else v for v in row
            )
            for row in zip(*cols)
        ]

    def _process(pdf: "pd.DataFrame") -> "pd.DataFrame":
        kt = _key_tuples(pdf)
        vals = pdf[value_col].astype("float64").to_list()
        outs: list[list] = [[] for _ in out_names]
        start = 0
        n = len(kt)
        for i in range(1, n + 1):
            if i == n or kt[i] != kt[start]:
                res = runner(vals[start:i])
                for o, r in zip(outs, res):
                    o.extend(r)
                start = i
        pdf = pdf.copy()
        for name, dtype, o in zip(out_names, out_dtypes, outs):
            pdf[name] = pd.array(o, dtype=dtype)
        return pdf

    def mapper(batches):
        pend = None
        for pdf in batches:
            if pend is not None and len(pend):
                pdf = pd.concat([pend, pdf], ignore_index=True)
                pend = None
            if not len(pdf):
                continue
            kt = _key_tuples(pdf)
            last = kt[-1]
            cut = len(kt)
            while cut > 0 and kt[cut - 1] == last:
                cut -= 1
            pend = pdf.iloc[cut:]
            if cut:
                yield _process(pdf.iloc[:cut])
        if pend is not None and len(pend):
            yield _process(pend)

    return parted.mapInPandas(mapper, schema=schema_ddl)


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    out: str = "ewma",
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per key — the canonical
    LINEAR RECURRENCE (``e_t = α·v_t + (1-α)·e_{t-1}``, seeded
    ``e_0 = v_0``) that windowed aggregates cannot express: every output
    depends on the entire prefix, and the weight product overflows any
    sum-of-transformed-terms rewrite for long series. The sanctioned
    custom-op escape hatch applies: one shuffle on ``key_cols``, then an
    Arrow-batched ``applyInPandas`` runs each key's series through an
    O(n) explicit-recurrence loop — per-group memory is one key's series
    (bounded: per-entity event history, never the whole corpus). NULL
    values — and real NaN values, treated EXACTLY like NULL by this
    whole recurrence family (ewma/holt/holt_winters/cusum) — emit a NULL
    ewma and are SKIPPED by the recurrence (the state carries over), so
    one bad telemetry point cannot NaN-poison the rest of the series;
    SQL oracles must mirror the NaN skip with ``OR isnan(value)``.

    Ordering inside a key is (ts, tiebreak_cols) ascending and must be
    total for determinism — pass ``tiebreak_cols`` when timestamps can
    collide. Output: the input columns plus ``out``.

    Cross-engine determinism: the recurrence is evaluated literally as
    ``α·v + (1−α)·e`` with ``1−α`` computed (not a rounded literal), the
    exact double operations an oracle's recursive CTE performs — pandas'
    ``ewm`` is NOT used because its weight normalization differs in the
    last ulp, which surfaces as rounding flips at scale.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    tb = list(tiebreak_cols or [])
    in_cols = df.columns
    beta = 1.0 - alpha

    def run(vals: list) -> tuple:
        acc = []
        e = None
        for v in vals:
            if v is None or v != v:  # NULL/NaN: skip, state carries over
                acc.append(None)
                continue
            e = v if e is None else alpha * v + beta * e
            acc.append(e)
        return (acc,)

    return _series_recurrence_map(
        df, key_cols, [ts_col, *tb], value_col,
        [(out, "double", "float64")], run,
    ).select(*in_cols, out)


def holt_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Holt double exponential smoothing per key — the trend-aware
    sibling of `ewma` (EWMA lags a drifting series; Holt carries an
    explicit trend term and forecasts ahead): seeded l₀ = v₀, b₀ = 0,
    then lₜ = α·vₜ + (1−α)·(lₜ₋₁+bₜ₋₁) and bₜ = β·(lₜ−lₜ₋₁) + (1−β)·bₜ₋₁.
    Same custom-op contract as `ewma`: one key shuffle, Arrow-batched
    per-key O(n) recurrence, NULL values emit NULL and are skipped with
    state carried over. The recurrences are evaluated LITERALLY in the
    exact double operation order a recursive-CTE oracle performs (the
    trend step recomputes lₜ's expression rather than trusting an
    engine's common-subexpression choices to match). Adds ``level``,
    ``trend``, and the one-step-ahead ``forecast`` = lₜ + bₜ."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    tb = list(tiebreak_cols or [])
    a_c, b_c = 1.0 - alpha, 1.0 - beta

    def run(vals: list) -> tuple:
        lvl_out, trd_out, fc_out = [], [], []
        lvl = trd = None
        for v in vals:
            if v is None or v != v:  # NULL/NaN: skip, state carries over
                lvl_out.append(None)
                trd_out.append(None)
                fc_out.append(None)
                continue
            if lvl is None:
                lvl, trd = v, 0.0
            else:
                prev = lvl
                lvl = alpha * v + a_c * (prev + trd)
                trd = beta * (lvl - prev) + b_c * trd
            lvl_out.append(lvl)
            trd_out.append(trd)
            fc_out.append(lvl + trd)
        return lvl_out, trd_out, fc_out

    return _series_recurrence_map(
        df, key_cols, [ts_col, *tb], value_col,
        [("level", "double", "float64"), ("trend", "double", "float64"),
         ("forecast", "double", "float64")], run,
    )


def holt_winters_additive(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing per key — the
    seasonal sibling of `holt_linear` (level + trend + an m-slot seasonal
    cycle; the classic forecaster for daily/weekly-periodic series):

        lt = a*(vt - s[t-m]) + (1-a)*(l[t-1] + b[t-1])
        bt = B*(lt - l[t-1]) + (1-B)*b[t-1]
        st = g*(vt - lt) + (1-g)*s[t-m]
        forecast (one step) = lt + bt + s[t+1-m]

    Seeding is the replay-exact degenerate form: l0 = v0, b0 = 0, and the
    seasonal cycle starts all-zero (it converges within a few periods;
    classic first-season averaging seeds are a fit choice, not a
    semantics one, and this one reproduces bit-stably in a recursive-CTE
    oracle whose recursion state carries the m-slot list). Same custom-op
    contract as `ewma`/`holt_linear`: one key shuffle, Arrow-batched
    per-key O(n) recurrence, NULL values emit NULL and are skipped with
    state carried; every double operation is evaluated in the literal
    order the oracle performs (the trend and seasonal steps RECOMPUTE
    the level expression rather than trusting CSE). State per key is
    O(period) — watermark-analog bounded, never row history.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    if not 0.0 <= gamma <= 1.0:
        raise ValueError(f"gamma must be in [0, 1], got {gamma}")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    tb = list(tiebreak_cols or [])
    a_c, b_c, g_c = 1.0 - alpha, 1.0 - beta, 1.0 - gamma

    def run(vals: list) -> tuple:
        lvl_out, trd_out, sea_out, fc_out = [], [], [], []
        lvl = trd = None
        s = [0.0] * period  # s[0] is s_{t-period}, s[-1] is s_{t-1}
        for v in vals:
            if v is None or v != v:  # NULL/NaN: skip, state carries over
                lvl_out.append(None)
                trd_out.append(None)
                sea_out.append(None)
                fc_out.append(None)
                continue
            if lvl is None:
                lvl, trd = v, 0.0
            else:
                prev = lvl
                lvl = alpha * (v - s[0]) + a_c * (prev + trd)
                trd = beta * (lvl - prev) + b_c * trd
            snew = gamma * (v - lvl) + g_c * s[0]
            s = s[1:] + [snew]
            lvl_out.append(lvl)
            trd_out.append(trd)
            sea_out.append(snew)
            fc_out.append(lvl + trd + s[0])
        return lvl_out, trd_out, sea_out, fc_out

    return _series_recurrence_map(
        df, key_cols, [ts_col, *tb], value_col,
        [("level", "double", "float64"), ("trend", "double", "float64"),
         ("seasonal", "double", "float64"),
         ("forecast", "double", "float64")], run,
    )


def cusum(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 5.0,
    reset_on_alarm: bool = True,
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-sided CUSUM changepoint detection per key (Page 1954) — the
    classic sequential drift detector telemetry/quality pipelines run on
    per-entity series:

        s⁺t = max(0, s⁺[t-1] + (vt − target − slack))
        s⁻t = max(0, s⁻[t-1] + (target − vt − slack))
        alarm when s⁺t > threshold OR s⁻t > threshold

    ``reset_on_alarm`` (default) zeroes BOTH statistics after an alarm
    row, the standard restart that lets one series flag multiple
    changepoints; with it off, the statistics keep accumulating and
    every post-drift row alarms. ``target`` is an explicit constant:
    deriving it in-plan (per-key mean) would feed an order-sensitive
    float into a threshold comparison and flip alarms between engines —
    callers that want a data-derived target compute and round it first.

    Same custom-op contract as ``ewma``: windowed aggregates cannot
    express the max(0, ·) clamp recurrence, so one shuffle on
    ``key_cols`` then an Arrow-batched per-key O(n) loop whose state is
    two doubles; NULL values — and real NaN values, which this operator
    treats EXACTLY like NULL (a NaN would otherwise poison both clamp
    statistics forever) — emit NULL rows and are skipped with state
    carried over; SQL oracles must mirror with ``OR isnan(value)``.
    Ordering inside a key is (ts, tiebreak_cols) and must be total for
    determinism. Adds ``cusum_pos``, ``cusum_neg``, ``alarm`` (int 0/1).
    """
    if threshold <= 0.0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    if slack < 0.0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    tb = list(tiebreak_cols or [])
    tgt, k, h = float(target), float(slack), float(threshold)

    def run(vals: list) -> tuple:
        pos_out, neg_out, alarm_out = [], [], []
        sp = sn = 0.0
        for v in vals:
            if v is None or v != v:  # NULL/NaN: skip, state carries over
                pos_out.append(None)
                neg_out.append(None)
                alarm_out.append(None)
                continue
            sp = max(0.0, sp + (v - tgt - k))
            sn = max(0.0, sn + (tgt - v - k))
            alarm = 1 if (sp > h or sn > h) else 0
            pos_out.append(sp)
            neg_out.append(sn)
            alarm_out.append(alarm)
            if alarm and reset_on_alarm:
                sp = sn = 0.0
        return pos_out, neg_out, alarm_out

    return _series_recurrence_map(
        df, key_cols, [ts_col, *tb], value_col,
        [("cusum_pos", "double", "float64"),
         ("cusum_neg", "double", "float64"),
         ("alarm", "int", "Int32")], run,
    )

def acf(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    lags: Sequence[int],
    by: Sequence[str] = (),
) -> DataFrame:
    """Sample autocorrelation function at the requested ``lags`` — the
    seasonality/memory diagnostic a forecasting pipeline runs before
    choosing model structure (a daily cycle shows as a spike at lag 24
    on hourly data). Full-series-mean centering, the standard estimator:

        r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)²

    (biased denominator — every lag shares the same Σ(x−x̄)², which keeps
    r monotone-comparable across lags and the SQL replay a single
    expression).

    Intended input is an ALREADY-AGGREGATED regular series (hourly/daily
    rollup — grid-sized), exactly like `bh_fdr`'s hypothesis table: with
    ``by`` empty the mean/denominator windows span one partition, which
    is only safe because a time grid is bounded (100 years of hours is
    876 k rows); per-key use partitions by ``by``. ``ts_col`` must be
    unique per key (a regular grid is). NULL and NaN values are excluded
    before lagging (bad-point contract) — lags are positional over the
    REMAINING series, the same convention an imputation-then-ACF
    pipeline produces. Output: (by…, lag, n, acf); a zero denominator
    (constant series) yields NULL acf via try_divide; series shorter
    than a lag emit that lag with NULL acf.
    """
    from pyspark.sql import Window

    keys = list(by)
    v = F.col(value_col).cast("double")
    base = df.where(F.col(value_col).isNotNull() & ~F.isnan(v)).select(
        *keys, F.col(ts_col).alias("__ts"), v.alias("__v")
    )
    full = Window.partitionBy(*keys)
    ordered = Window.partitionBy(*keys).orderBy("__ts")
    centered = base.select(
        *keys,
        "__ts",
        (F.col("__v") - F.avg("__v").over(full)).alias("__c"),
    )
    lag_cols = [
        F.lag("__c", int(k)).over(ordered).alias(f"__c_{k}") for k in lags
    ]
    with_lags = centered.select(*keys, "__c", *lag_cols)
    per_key = with_lags.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__c") * F.col("__c")).alias("__den"),
        *[
            F.sum(F.col("__c") * F.col(f"__c_{k}")).alias(f"__num_{k}")
            for k in lags
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(int(k)).alias("lag"),
                F.try_divide(F.col(f"__num_{k}"), F.col("__den")).alias("acf"),
            )
            for k in lags
        ]
    )
    return per_key.select(
        *keys, "n", F.explode(pairs).alias("__p")
    ).select(*keys, F.col("__p.lag").alias("lag"), "n", F.col("__p.acf").alias("acf"))

def seasonal_decompose_additive(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: int,
    by: Sequence[str] = (),
) -> DataFrame:
    """Classic additive seasonal decomposition (the moving-average
    method behind STL's initial pass): value = trend + seasonal +
    residual — the forecasting diagnostic that turns 'orders dip every
    January' from folklore into a column.

    - trend: centered moving average of one full ``period``; for even
      periods the standard 2×m trick (the mean of the two half-offset
      m-windows, i.e. half weight on both end points) keeps the window
      centered. Positions without a FULL window get NULL trend (count
      guard — partial-window averages would leak level shifts into the
      seasonal means).
    - seasonal: per-phase (position mod period) mean of the detrended
      series, re-centered so one cycle sums to 0 (the level stays in
      the trend).
    - residual = value − trend − seasonal.

    Same input contract as `acf`: an ALREADY-AGGREGATED regular grid
    series (hourly/monthly rollup — grid-sized), ``ts_col`` unique per
    key; the phase index comes from the row's POSITION in the series
    (row_number), so gaps in the grid are the caller's responsibility
    (resample_ffill first). NULL/NaN values are excluded before
    positioning (bad-point contract). Output: (by…, ts, value, trend,
    seasonal, residual).
    """
    from pyspark.sql import Window

    keys = list(by)
    v = F.col(value_col).cast("double")
    base = df.where(F.col(value_col).isNotNull() & ~F.isnan(v)).select(
        *keys, F.col(ts_col).alias("__ts"), v.alias("__v")
    )
    ordered = Window.partitionBy(*keys).orderBy("__ts")
    pos = base.withColumn("__i", F.row_number().over(ordered) - 1)
    m = int(period)
    if m < 2:
        raise ValueError(f"period must be >= 2, got {m}")
    if m % 2 == 1:
        h = (m - 1) // 2
        w1 = ordered.rowsBetween(-h, h)
        trend = F.when(
            F.count(F.lit(1)).over(w1) == m, F.avg("__v").over(w1)
        )
    else:
        h = m // 2
        wa = ordered.rowsBetween(-h, h - 1)
        wb = ordered.rowsBetween(-h + 1, h)
        trend = F.when(
            (F.count(F.lit(1)).over(wa) == m)
            & (F.count(F.lit(1)).over(wb) == m),
            (F.avg("__v").over(wa) + F.avg("__v").over(wb)) / F.lit(2.0),
        )
    # GRID-SIZED by contract (pre-aggregated series): materialize the
    # positioned+trended grid once — it feeds the phase-mean aggregate
    # AND the final assembly join, and its clone re-ran the caller's
    # full rollup subtree per consumer (orders_seasonal_decompose: 3
    # base scans in the r10 plan audit, 0 in-plan after — one
    # materialization pass computes the rollup once)
    with_trend = pos.withColumn("__trend", trend).withColumn(
        "__phase", F.pmod(F.col("__i"), F.lit(m))
    ).localCheckpoint(eager=True)
    # phase means as a SEPARATE ≤period-row aggregate per key (a per-row
    # unbounded collect_list window would be O(n²)); the re-center
    # subtracts the unweighted mean of the phase means — not the
    # row-weighted mean, phases can differ in row count — so one cycle
    # of the seasonal component sums to ~0 and the level stays in the
    # trend. Phases whose every window is partial (series ≈ period)
    # have NULL praw and drop out of the centering average.
    pm = with_trend.groupBy(*keys, "__phase").agg(
        F.avg(F.col("__v") - F.col("__trend")).alias("__praw")
    ).localCheckpoint(eager=True)  # ≤period×keys rows, two consumers
    center = pm.groupBy(*keys).agg(F.avg("__praw").alias("__center"))
    if keys:
        # keyed: the phase/center tables are keys-sized DERIVED
        # aggregates — never broadcast off an estimate (engine rule)
        pm = pm.join(center.hint("merge"), keys)
        seas_tbl = pm.select(
            *keys, "__phase",
            (F.col("__praw") - F.col("__center")).alias("__seas"),
        )
        with_seas = with_trend.join(
            seas_tbl.hint("merge"), [*keys, "__phase"], "left"
        )
    else:
        # global series: ≤period-row seasonal table, 1-row center
        pm = pm.crossJoin(F.broadcast(center))
        seas_tbl = pm.select(
            "__phase", (F.col("__praw") - F.col("__center")).alias("__seas")
        )
        with_seas = with_trend.join(F.broadcast(seas_tbl), ["__phase"], "left")
    return with_seas.select(
        *keys,
        F.col("__ts").alias(ts_col),
        F.col("__v").alias(value_col),
        F.col("__trend").alias("trend"),
        F.col("__seas").alias("seasonal"),
        (F.col("__v") - F.col("__trend") - F.col("__seas")).alias("residual"),
    )


def mann_kendall(
    df: DataFrame,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Kendall nonparametric trend test (Mann 1945, Kendall 1975)
    on a SERIES — the 'is this KPI drifting' companion to the OLS slope
    (`trend_slope`): S = Σ_{i<j} sign(x_j − x_i) over all time-ordered
    pairs, with the normal approximation z = (S ∓ 1)/√Var(S) and the
    tie-corrected variance Var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18.
    Rank-based, so a single outlier month cannot fake or hide a trend
    the way it moves a least-squares slope.

    GRID-SIZED contract (the `seasonal_decompose` discipline): the
    caller aggregates the raw stream to one row per period FIRST — that
    groupBy is the scalable, data-sized step — and this operator's
    O(g²) pair self-join runs on the period grid only (g ≈ months or
    days of history: thousands, not rows). Feed it raw event rows and
    the self-join is quadratic in DATA — don't.

    Cross-engine determinism: prefer an integer-valued series (counts);
    then S and every tie count are BIGINT-exact on any engine. Doubles
    work but sign() near exact pair-equality is ulp-sensitive. NULL/NaN
    values are dropped; n < 2 emits the degenerate row with NULL z via
    try_divide. Output one row: n, s_stat, var_s, z_stat.

    The filtered grid is MATERIALIZED once (localCheckpoint — grid-sized
    by contract, so trivially cheap): it has FOUR consumers (both pair
    sides, n, ties) and each would otherwise re-execute the caller's
    full data-sized aggregation subtree — the r10 plan audit counted 4
    base-table scans in orders_trend_mann_kendall, 1 after.
    """
    t = F.col(time_col)
    v = F.col(value_col)
    base = df.where(
        t.isNotNull() & v.isNotNull() & ~F.isnan(v.cast("double"))
    ).select(t.alias("__t"), v.alias("__v")).localCheckpoint(eager=True)
    a = base.alias("a")
    b = base.alias("b")
    # grid-sized by contract: broadcast the right copy explicitly so the
    # non-equi pair join plans as BNL-against-broadcast, never Cartesian
    pairs = a.join(F.broadcast(b), F.col("a.__t") < F.col("b.__t")).select(
        F.signum(
            F.col("b.__v").cast("double") - F.col("a.__v").cast("double")
        ).cast("bigint").alias("__sgn")
    )
    s = pairs.agg(F.coalesce(F.sum("__sgn"), F.lit(0)).alias("s_stat"))
    nrow = base.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        base.groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__tc"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("__tc")
                    * (F.col("__tc") - 1)
                    * (2 * F.col("__tc") + 5)
                ),
                F.lit(0),
            ).alias("__tie_term")
        )
    )
    out = (
        nrow.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .where(F.col("n") > 0)
    )
    n = F.col("n").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("__tie_term").cast("double")
    ) / F.lit(18.0)
    zn = F.when(F.col("s_stat") > 0, F.col("s_stat") - 1).otherwise(
        F.when(F.col("s_stat") < 0, F.col("s_stat") + 1).otherwise(F.lit(0))
    )
    z = F.when(F.col("s_stat") == 0, F.lit(0.0)).otherwise(
        F.try_divide(zn.cast("double"), F.sqrt(var_s))
    )
    return out.select("n", "s_stat", var_s.alias("var_s"), z.alias("z_stat"))
