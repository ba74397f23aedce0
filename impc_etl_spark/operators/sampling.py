"""Deterministic dataset splitting and hash bucketing.

Training pipelines need reproducible train/val/test assignment that is a
pure function of the row key — NOT of partitioning, plan shape, or seed
state (``randomSplit`` re-draws when the plan re-executes; ``sampleBy`` is
partition-sensitive).  The standard trick at scale is hash bucketing: the
split label derives from ``md5(key)``, so the assignment is stable across
runs, engines, and cluster sizes, and a row never migrates between splits
when the dataset grows (critical for avoiding eval-set contamination as a
corpus is re-crawled — the reference re-derives marts per data release,
``impc_etl/jobs/load/*``, with the same run-to-run stability contract).

Everything here is pure Column algebra (md5 + conv + modulo) — JVM-side,
whole-stage-codegen, zero shuffle: the split is a narrow ``withColumn``
over the scan, so it costs nothing at 100 TB.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bucket-space resolution. 10_000 buckets -> split fractions are honoured
#: to 0.01%; small enough that conv()'s 15-hex-digit (60-bit) value
#: distributes uniformly over it.
NUM_BUCKETS = 10_000


def hash_bucket(key_cols: Sequence[str | Column], salt: str = "",
                num_buckets: int = NUM_BUCKETS) -> Column:
    """Uniform deterministic bucket in ``[0, num_buckets)`` from md5 of the
    concatenated key (15 hex digits = 60 bits, fits a signed 64-bit int).

    The same expression is reproducible in any engine with md5 — the DuckDB
    oracle replays it as ``CAST('0x' || substring(md5(..),1,15) AS BIGINT)``.
    """
    key = F.concat_ws("|", F.lit(salt), *[F.col(c) if isinstance(c, str) else c
                                          for c in key_cols])
    return (F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
            % num_buckets)


def hash_split(
    df: DataFrame,
    key_cols: Sequence[str],
    weights: Mapping[str, float],
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Assign each row to a named split with probability proportional to
    ``weights`` (e.g. ``{"train": .98, "val": .01, "test": .01}``), as a
    pure function of ``key_cols`` + ``salt``.

    Properties that matter for training data:
    - **Stable under growth**: a row's split never changes when other rows
      are added/removed (unlike ``randomSplit``/``ntile``).
    - **Engine-independent**: md5 is md5 everywhere; the oracle can verify
      the exact assignment, not just the proportions.
    - **Keyed families stay together**: pass the family key (e.g. a URL
      domain or dup-group id) as ``key_cols`` to keep near-duplicates out
      of both train and test at once.
    """
    if not weights:
        raise ValueError("weights must be a non-empty mapping")
    total = float(sum(weights.values()))
    bucket = hash_bucket(key_cols, salt=salt)
    # Cumulative thresholds over the bucket space; last split takes the
    # remainder so rounding never drops a bucket.
    names = list(weights)
    expr: Column | None = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        cut = int(round(acc * NUM_BUCKETS))
        cond = bucket < cut
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None else expr.otherwise(names[-1]))
    return df.withColumn(out, expr)


def deterministic_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    fraction: float | None = None,
    rates: Mapping[str, float] | None = None,
    stratum_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Keyed Bernoulli sampling: keep a row iff its hash bucket falls under
    the (per-stratum) rate. Unlike ``df.sample``/``sampleBy`` the decision
    is a pure function of the key — re-runs, repartitions, and engine
    changes keep the exact same rows, and raising a stratum's rate only
    ADDS rows (nested samples, so a 1% debug corpus is a strict subset of
    the 10% one).

    This is the domain-mixing primitive for corpus construction: pass
    ``rates={"en": 1.0, "code": 0.5, ...}`` with ``stratum_col`` to
    up/down-weight sources. Narrow map, zero shuffle.
    """
    if (fraction is None) == (rates is None):
        raise ValueError("pass exactly one of fraction= or rates=")
    if rates is not None and not rates:
        raise ValueError("rates= must be a non-empty mapping")
    bucket = hash_bucket(key_cols, salt=salt)
    if fraction is not None:
        return df.where(bucket < int(round(fraction * NUM_BUCKETS)))
    if stratum_col is None:
        raise ValueError("rates= requires stratum_col=")
    cut: Column = F.lit(0)
    expr = None
    for name, rate in rates.items():
        c = int(round(rate * NUM_BUCKETS))
        expr = F.when(F.col(stratum_col) == name, c) if expr is None \
            else expr.when(F.col(stratum_col) == name, c)
    cut = expr.otherwise(0)
    return df.where(bucket < cut)


def weighted_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    weight_col: str | Column,
    salt: str = "",
) -> DataFrame:
    """Keyed Bernoulli sampling with a PER-ROW keep probability — the
    quality/importance-weighted selection step of corpus mixing (keep a
    document with probability equal to its quality score, DoReMi-style
    domain reweighting with per-row weights, etc.).

    Keep iff ``hash_bucket(key) < clamp(weight, 0, 1) · NUM_BUCKETS``. Same
    contract as ``deterministic_sample``: a pure function of key + salt, so
    re-runs/repartitions keep identical rows, and raising any row's weight
    can only ADD it (nested in the weight). Narrow map, zero shuffle.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0))
    bucket = hash_bucket(key_cols, salt=salt)
    # floor() on BOTH engines: DuckDB's CAST(x AS INT) rounds, Spark's
    # truncates — an explicit floor is the only portable cutoff.
    return df.where(bucket < F.floor(w * NUM_BUCKETS))


def per_key_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    n: int,
    id_cols: Sequence[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic cap of at most ``n`` rows per key — the per-domain /
    per-source document cap of corpus construction ("take ≤N pages per
    host"), done as a pure function of the row identity instead of
    ``sample``'s partition-sensitive RNG.

    Rows rank within each key by ``md5(salt:id)`` (ties impossible when
    ``id_cols`` is unique; ``id_cols`` breaks residual ties determinist-
    ically) and ranks > n drop. Same guarantees as ``hash_split``: stable
    across runs/engines/partitionings, and because each row's rank key is
    independent of the rest, the kept set under cap n is a SUPERSET of the
    kept set under any smaller cap (nested samples).

    Scale: one shuffle on ``key_cols``; Spark ≥3.5 plans the rank filter as
    WindowGroupLimit, so each map task pre-trims to its local top-n before
    the exchange — hot keys (giant domains) ship ~n rows per mapper, not
    the whole domain.
    """
    from pyspark.sql import Window

    rank_key = F.md5(
        F.concat_ws(":", F.lit(salt), *[F.col(c).cast("string") for c in id_cols])
    )
    w = Window.partitionBy(*key_cols).orderBy(rank_key, *[F.col(c) for c in id_cols])
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n)
        .drop("__rk")
    )


def split_thresholds(weights: Mapping[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket bound) pairs — exposed so oracles and
    downstream writers can replay the exact same cuts."""
    if not weights:
        raise ValueError("weights must be a non-empty mapping")
    total = float(sum(weights.values()))
    out: list[tuple[str, int]] = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        out.append((name, int(round(acc * NUM_BUCKETS))))
    out.append((names[-1], NUM_BUCKETS))
    return out


def coherent_sample(
    tables: Mapping[str, DataFrame],
    key: Mapping[str, str | Column],
    rate: float,
    salt: str = "",
    num_buckets: int = NUM_BUCKETS,
) -> dict[str, DataFrame]:
    """Join-consistent sampling across RELATED tables: every table keeps a
    row iff the md5 bucket of its (shared) key lands under ``rate`` — so a
    sampled parent's children are kept exactly, and joins over the samples
    behave like joins over the full data at ``rate`` density. The standard
    way to cut a coherent dev-scale replica out of a 100 TB warehouse
    (sampling each table independently would decimate every join to
    rate², and the referential structure with it).

    Pure per-row key hashing — zero shuffles, zero cross-table
    coordination, any engine reproduces the same subset. ``key`` maps
    table name → its column holding the SHARED entity key (e.g. orders →
    o_custkey, lineitem via its order's custkey would need that column
    materialized; sample on the key the tables actually share).
    """
    # round(), not int()-truncation: the same cut arithmetic as
    # deterministic_sample, so the two samplers keep identical row sets
    # for the same rate/salt (int() differs at float-boundary rates)
    cut = int(round(rate * num_buckets))
    out = {}
    for name, df in tables.items():
        b = hash_bucket([key[name]], salt=salt, num_buckets=num_buckets)
        out[name] = df.where(b < cut)
    return out


def mixture_select(
    df: DataFrame,
    stratum_col: str,
    weights: Mapping[str, float],
    token_col: str | Column,
    token_budget: float,
    key_cols: Sequence[str],
    default_weight: float = 0.0,
    salt: str = "",
    num_buckets: int = NUM_BUCKETS,
) -> DataFrame:
    """Target-mixture corpus selection (the data-mixing primitive behind
    DoReMi/Pile-style recipes): compute, per stratum, the Bernoulli rate
    that hits ``token_budget · weight_s`` expected tokens —
    ``rate_s = min(1, budget·w_s / tokens_s)`` — and apply it with the
    deterministic keyed coin, entirely inside the plan.

    Strata with fewer tokens than their target keep everything (rate
    capped at 1 — the shortfall is reported by ``corpus_stats``, not
    silently rebalanced). Unlisted strata get ``default_weight``.

    Scale shape: one tiny per-stratum aggregate, broadcast back; the
    corpus itself never shuffles and the keep decision is a pure key
    function (re-runs/engines/partitionings agree; raising the budget
    only ADDS rows — nested samples).
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    avail = df.groupBy(stratum_col).agg(F.sum(tok).alias("__toks"))
    pairs: list[Column] = []
    for name, w in weights.items():
        pairs += [F.lit(name), F.lit(float(w))]
    wmap = F.create_map(*pairs) if pairs else F.create_map()
    # try_divide: a stratum whose docs all have zero/NULL tokens sums to
    # __toks = 0, and plain division is an ANSI DIVIDE_BY_ZERO crash.
    # NULL ratio → least() skips it → rate 1.0: such docs contribute no
    # tokens to the budget either way, so "keep all" is the consistent
    # reading of the rate-capped-at-1 shortfall rule.
    rates = avail.select(
        F.col(stratum_col),
        F.least(
            F.lit(1.0),
            F.try_divide(
                F.lit(float(token_budget))
                * F.coalesce(wmap[F.col(stratum_col)], F.lit(float(default_weight))),
                F.col("__toks"),
            ),
        ).alias("__rate"),
    )
    bucket = hash_bucket(key_cols, salt=salt, num_buckets=num_buckets)
    # NULL-SAFE stratum match: an unlabeled (NULL-stratum) group has its
    # own rate row from the groupBy above, and an equi join would drop
    # every such row (null == null never matches) — silently losing the
    # whole unlabeled slice instead of applying default_weight
    r = F.broadcast(rates.withColumnRenamed(stratum_col, "__stratum"))
    return (
        df.join(r, F.col(stratum_col).eqNullSafe(F.col("__stratum")))
        .where(bucket < F.floor(F.col("__rate") * num_buckets).cast("bigint"))
        .drop("__rate", "__stratum")
    )


def importance_weights(
    df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str | None = None,
    buckets: int = 1024,
    smoothing: float = 1.0,
    salt: str = "dsir",
    out: str = "log_ratio",
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score each raw document by the mean log
    ratio of its tokens' probabilities under a TARGET distribution vs the
    RAW distribution, both estimated over hashed token buckets — the cheap
    proxy for "how much does this doc look like the domain I actually want
    to train on".

    Hashing tokens into a fixed bucket space is what makes this 100 TB
    viable: both distributions are ``buckets``-row tables no matter the
    corpus size (no unbounded vocab state), built with ONE
    explode→groupBy each; the per-bucket log-ratio score table is
    KB-sized and broadcast, so scoring the corpus is a map-side join +
    one per-doc average. Additive smoothing keeps ratios defined for
    buckets unseen on either side.

    md5-derived bucketing makes weights reproducible across engines — the
    oracle replays the exact assignment. Documents with zero tokens have
    no defined ratio and are absent from the output (and therefore
    dropped by ``importance_resample``), matching the SQL form.
    """
    from impc_etl_spark.operators.text import tokens

    tcol = target_text_col or text_col
    b = int(buckets)
    a = float(smoothing)

    # NOTE: this md5 bucket uses the ':'-joined scheme (salt:token), NOT
    # hash_bucket's '|'-joined concat_ws — the divergence is intentional
    # and PINNED by the DSIR replay oracles; do not "unify" it without
    # re-deriving every importance-resampling oracle.
    def _bucket(tok: Column) -> Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.lit(salt), tok)), 1, 15),
                16, 10,
            ).cast("bigint") % b
        )

    def _counts(frame: DataFrame, col: str, cname: str) -> DataFrame:
        return (
            frame.select(F.explode(tokens(col)).alias("__tok"))
            .select(_bucket(F.col("__tok")).alias("__bkt"))
            .groupBy("__bkt")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    raw_c = _counts(df, text_col, "__cr")
    tgt_c = _counts(target_df, tcol, "__ct")
    # ≤buckets-row table MATERIALIZED (r10): two consumers (totals +
    # score) otherwise clone BOTH corpus explode→groupBy subtrees —
    # docs_importance_resample audited at 6 documents scans, 4 after
    # (raw counts, target counts, doc scoring, the resample join — the
    # DSIR-inherent passes)
    merged = raw_c.join(tgt_c, "__bkt", "full_outer").select(
        "__bkt",
        F.coalesce("__cr", F.lit(0)).alias("__cr"),
        F.coalesce("__ct", F.lit(0)).alias("__ct"),
    ).localCheckpoint(eager=True)
    totals = merged.agg(
        F.sum("__cr").alias("__nr"), F.sum("__ct").alias("__nt")
    )
    score = merged.crossJoin(F.broadcast(totals)).select(
        "__bkt",
        (
            F.log((F.col("__ct") + F.lit(a)) / (F.col("__nt") + F.lit(a * b)))
            - F.log((F.col("__cr") + F.lit(a)) / (F.col("__nr") + F.lit(a * b)))
        ).alias("__lr"),
    )
    doc_toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__tok")
    ).select(id_col, _bucket(F.col("__tok")).alias("__bkt"))
    return (
        doc_toks.join(F.broadcast(score), "__bkt")
        .groupBy(id_col)
        .agg(F.avg("__lr").alias(out))
    )


def importance_resample(
    df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str | None = None,
    buckets: int = 1024,
    smoothing: float = 1.0,
    temperature: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Importance RESAMPLING: keep each document with probability
    ``min(1, ratio^temperature)`` where ratio is the geometric-mean
    target/raw token-probability ratio from ``importance_weights`` — docs
    that look like the target survive, off-domain docs are thinned, and
    the decision is a deterministic keyed coin (same md5-bucket scheme as
    every sampler here: stable across runs, partitioning, and growth).

    The keep probability is rounded to 6 dp with the portable floor form
    BEFORE the coin compare so the oracle's libm and the JVM's can never
    disagree on a boundary. Returns the surviving rows of ``df`` plus the
    ``keep_prob`` column.
    """
    w = importance_weights(
        df, target_df, text_col, id_col, target_text_col,
        buckets, smoothing, salt, out="__lr",
    )
    kp = F.least(
        F.lit(1.0), F.exp(F.lit(float(temperature)) * F.col("__lr"))
    )
    kp6 = F.floor(kp * 1000000 + F.lit(0.5)) / 1000000
    coin = hash_bucket([id_col], salt=salt + "|coin")
    return (
        df.join(w, id_col)
        .withColumn("keep_prob", kp6)
        .where(coin < F.floor(F.col("keep_prob") * NUM_BUCKETS).cast("bigint"))
        .drop("__lr")
    )


def top_fraction_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    score_col: str,
    fraction: float,
    tiebreak_cols: Sequence[str] = (),
    out: str | None = None,
) -> DataFrame:
    """Keep the best ``fraction`` of rows per key by ``score_col`` — the
    per-stratum quality cut (FineWeb-style "top X% by quality per
    language"): an ABSOLUTE threshold misbehaves when strata have
    different score distributions; a per-stratum fractional cut adapts.

    Deterministic: rank = row_number over (score desc, tiebreak asc), cut
    at ``ceil(fraction × stratum_size)`` — ties at the boundary resolve
    by the tiebreak columns, identically in any engine. One shuffle: the
    rank and the stratum count share a single window partitioning (same
    exchange); the rank window is a streaming row_number and the count is
    an unordered frame — no buffered state, skewed strata split by AQE.
    ``out`` (optional) keeps the rank column for inspection.
    """
    from pyspark.sql import Window

    if not (0.0 < fraction <= 1.0):
        raise ValueError("fraction must be in (0, 1]")
    if not tiebreak_cols:
        # the module contract is run/partitioning-stable row sets; with
        # tied boundary scores and no tiebreak, row_number keeps whichever
        # row arrived first — pass a unique id column
        raise ValueError(
            "top_fraction_per_key requires tiebreak_cols (a unique id) — "
            "boundary-score ties would otherwise keep partition-dependent rows"
        )
    order = [F.col(score_col).desc()] + [F.col(c) for c in tiebreak_cols]
    w_rank = Window.partitionBy(*key_cols).orderBy(*order)
    w_all = Window.partitionBy(*key_cols)
    ranked = df.withColumn("__rank", F.row_number().over(w_rank)).withColumn(
        "__n", F.count(F.lit(1)).over(w_all)
    )
    kept = ranked.where(
        F.col("__rank") <= F.ceil(F.col("__n") * F.lit(float(fraction)))
    )
    if out is not None:
        return kept.withColumnRenamed("__rank", out).drop("__n")
    return kept.drop("__rank", "__n")


def priority_sample_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    weight_col: str | Column,
    n: int,
    id_cols: Sequence[str],
    salt: str = "",
    priority_out: str | None = None,
    est_weight_out: str | None = None,
) -> DataFrame:
    """Weighted-without-replacement sampling per key via PRIORITY SAMPLING
    (Duffield, Lund & Thorup, JACM '07): each row gets priority
    ``q = w / u`` with ``u`` a uniform in (0,1), and the top-``n``
    priorities per key form the sample — heavier rows are proportionally
    likelier, and with ``est_weight_out`` set each kept row also carries
    ``max(w, τ)`` (τ = the (n+1)-th priority), the DLT estimator that
    makes per-key subset-sum estimates UNBIASED from just the sample.

    Determinism contract of this module: ``u`` derives from
    ``hash_bucket(id_cols, salt)`` (``(bucket + 0.5) / NUM_BUCKETS`` — a
    pure row function, never an RNG), so re-runs, repartitions, and other
    engines reproduce the identical sample; the DuckDB oracle replays
    ``w/u`` bit-for-bit because IEEE double division is exactly rounded.
    Rows with weight ≤ 0 are excluded (they can never be sampled).

    Scale: one shuffle on ``key_cols``. DLT only ever needs the top
    ``n+1`` priorities per key (the sample plus τ), so the rank filter to
    ``n+1`` comes FIRST — it plans as WindowGroupLimit, each mapper
    pre-trimming to its local top-(n+1) before the exchange — and τ is a
    second window function over the already-trimmed ≤(n+1)-row groups on
    the SAME partitioning: no extra shuffle, no self-join, and hot keys
    ship ~n rows per mapper instead of the whole stratum.
    """
    from pyspark.sql import Window

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (hash_bucket(list(id_cols), salt=salt) + F.lit(0.5)) / F.lit(
        float(NUM_BUCKETS)
    )
    prio = w.cast("double") / u
    ranked = df.where(w > 0).withColumn("__prio", prio)
    order = Window.partitionBy(*key_cols).orderBy(
        F.desc("__prio"), *[F.col(c) for c in id_cols]
    )
    ranked = (
        ranked.withColumn("__rk", F.row_number().over(order))
        .where(F.col("__rk") <= n + 1)
    )
    whole = Window.partitionBy(*key_cols)
    ranked = ranked.withColumn(
        "__tau",
        F.max(F.when(F.col("__rk") == n + 1, F.col("__prio"))).over(whole),
    )
    out = ranked.where(F.col("__rk") <= n)
    if est_weight_out:
        out = out.withColumn(
            est_weight_out,
            F.greatest(w.cast("double"), F.coalesce("__tau", F.lit(0.0))),
        )
    if priority_out:
        out = out.withColumn(priority_out, F.col("__prio"))
    return out.drop("__prio", "__rk", "__tau")


def epoch_shuffle(
    df: DataFrame,
    id_cols: Sequence[str],
    epoch: int,
    out: str = "shuffle_key",
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic per-epoch corpus shuffling: attach the md5 rank key
    ``md5(salt:epoch:id…)`` that orders this epoch's pass — the standard
    replacement for an RNG shuffle in training-data pipelines. Sorting or
    range-partitioning by ``out`` yields a uniform permutation that is a
    pure row function: every re-run, engine, and partitioning produces
    the SAME epoch order (resumable mid-epoch), epochs are mutually
    independent permutations, and no global RNG state exists to
    coordinate across 1000 executors.

    This operator only ATTACHES the key (zero shuffle — the decision is
    row-local); compose with ``partitioning.assign_global_ids(df,
    [out, *id_cols])`` for dense epoch sample indices, or
    ``repartitionByRange(out).sortWithinPartitions(out)`` to materialize
    shard files in epoch order (one range shuffle, the same price any
    shuffle pays).

    ``id_cols`` must be a non-null unique key (the repo-wide
    ``concat_ws`` key convention: NULL components drop out of the
    concatenation, so NULL-keyed rows would share one rank key and fall
    back to the consumer's tie-break order).
    """
    key = F.md5(
        F.concat_ws(
            ":",
            F.lit(salt),
            F.lit(int(epoch)).cast("string"),
            *[F.col(c).cast("string") for c in id_cols],
        )
    )
    return df.withColumn(out, key)


#: cumulative Poisson(λ=1) CDF values P(X <= k), k = 0..9 — shared
#: verbatim by the DuckDB oracle so the inverse-CDF draws are identical
#: integers on both engines (see poisson_weight / bootstrap_mean_ci)
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033254,
    0.9999988747993286,
    0.9999999885770609,
)


def poisson_weight(u: Column) -> Column:
    """Inverse-CDF Poisson(1) draw from a uniform column — the resample
    weight of the Poissonized bootstrap (multinomial counts → independent
    Poisson(1) approximation, the only form that needs no global n).
    Chained comparisons against the shared CDF literals; u quantized to
    bucket midpoints upstream, so every engine lands the same integer."""
    expr = F.when(u < POISSON1_CDF[0], 0)
    for k in range(1, len(POISSON1_CDF)):
        expr = expr.when(u < POISSON1_CDF[k], k)
    return expr.otherwise(len(POISSON1_CDF)).cast("bigint")


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str | Column,
    key_cols: Sequence[str],
    replicates: int = 100,
    lo: float = 0.025,
    hi: float = 0.975,
    salt: str = "boot",
) -> DataFrame:
    """Poissonized-bootstrap confidence interval for the MEAN — the
    error bar a metrics pipeline should put on every headline average:
    R resample replicates where row i's multiplicity in replicate r is
    an independent Poisson(1) draw (the n→∞ limit of multinomial
    resampling; Chamandy et al., 'Estimating Uncertainty for Massive
    Data Streams', the Poisson-bootstrap half of the BLB family).

    Scale shape: ONE pass over the data exploding each row to its R
    (replicate, weight) contributions — R× map CPU, but the counting
    groupBy partial-aggregates, so the shuffle is R rows per input
    partition and the replicate-means table is R rows total; the
    percentile runs on those R rows. Pick R to trade CPU for CI
    resolution — the standard Poisson-bootstrap cost model.

    Determinism: weights are pure functions of (key, replicate, salt) —
    md5 → bucket-midpoint uniform → shared-literal inverse CDF — so
    re-runs, stragglers and the SQL oracle produce identical INTEGER
    weights; only the final means/quantiles are floats. NULL/NaN values
    are dropped. Output one row: n, n_replicates, mean, ci_lo, ci_hi
    (percentile interpolation = the (1−g)a + gb linear rule both Spark
    `percentile` and DuckDB `quantile_cont` implement).
    """
    from impc_etl_spark.operators.partitioning import fan_out

    v = F.col(value_col) if isinstance(value_col, str) else value_col
    v = v.cast("double")
    # R× md5 draws per row are CPU-dense and row-local: a small parquet
    # input arrives as ONE split and serializes the whole replicate
    # explosion on a single core (measured 20.8 s at sf0.1 for 15 M
    # draws) — fan the scan out first; weights are key-deterministic so
    # partitioning cannot change any draw
    base = fan_out(df.where(v.isNotNull() & ~F.isnan(v))).select(
        v.alias("__v"),
        F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]).alias(
            "__k"
        ),
    )
    reps = base.select(
        "__v",
        "__k",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(replicates) - 1))
        ).alias("__r"),
    )
    u = (
        hash_bucket(
            [F.concat_ws("|", F.col("__k"), F.col("__r").cast("string"))],
            salt=salt,
            num_buckets=1_000_000,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(1e6)
    weighted = reps.select(
        "__r", "__v", poisson_weight(u).alias("__w")
    )
    means = (
        weighted.groupBy("__r")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__swv"),
            F.sum("__w").alias("__sw"),
        )
        .select(F.try_divide("__swv", F.col("__sw").cast("double")).alias("__m"))
        .where(F.col("__m").isNotNull())
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.avg("__v").alias("mean")
    )
    ci = means.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.expr(f"percentile(__m, {lo!r})").alias("ci_lo"),
        F.expr(f"percentile(__m, {hi!r})").alias("ci_hi"),
    )
    return (
        stats.crossJoin(F.broadcast(ci))
        .where(F.col("n") > 0)
        .select("n", "n_replicates", "mean", "ci_lo", "ci_hi")
    )
