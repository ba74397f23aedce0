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
        raise ValueError("weights must be non-empty")
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
    cut = int(rate * num_buckets)
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
    rates = avail.select(
        F.col(stratum_col),
        F.least(
            F.lit(1.0),
            F.lit(float(token_budget))
            * F.coalesce(wmap[F.col(stratum_col)], F.lit(float(default_weight)))
            / F.col("__toks"),
        ).alias("__rate"),
    )
    bucket = hash_bucket(key_cols, salt=salt, num_buckets=num_buckets)
    return (
        df.join(F.broadcast(rates), stratum_col)
        .where(bucket < F.floor(F.col("__rate") * num_buckets).cast("bigint"))
        .drop("__rate")
    )
