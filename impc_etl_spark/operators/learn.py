"""Distributed model training for data-quality scoring.

A training-data pipeline's quality gate is usually a LEARNED scorer —
a linear classifier distilled from heuristic labels (the fastText /
CCNet pattern: label a slice with rules, train a smooth model, score
the whole corpus). The reference's nearest analog is its rule-ladder
manual stats (impc_etl/jobs/load/stats_pipeline_input_mapper.py — the
declarative ladder `plans/marts.py` re-expresses); this module adds the
learned step a 100 TB corpus needs on top of those rules.

Design for scale (and for exact engine replay):

- **Full-batch gradient descent, one pass per iteration.** Each
  iteration reduces the corpus to d+1 doubles with a map-side-combined
  scalar aggregate (`avg` of per-row gradient terms) — the shuffle
  ships ONE partial row per partition regardless of corpus size, the
  same mergeable-statistic shape as `similarity.moment_partials`. The
  d+1 result is collected (bounded: one row) and fed back as literals,
  so the scoring expression stays row-local whole-stage codegen.
- **IEEE-exact trajectory.** The link is the algebraic sigmoid
  σ(m) = 0.5 + 0.5·m/(1+|m|) (Elliott activation): add / multiply /
  divide / abs only, each exactly rounded by IEEE-754, so any engine
  reproduces p bit-for-bit — no libm `exp()` whose last ulp differs
  between the JVM and C runtimes. Weights round to ``round_to``
  decimals after every step (the portable floor(x·10ⁿ+0.5)/10ⁿ form,
  same convention as `similarity.ivf_build`), pinning the whole
  trajectory so a chained-CTE SQL oracle replays init → gradient →
  step → final scores exactly.
- **Feature hygiene.** Callers pass already-computed numeric feature
  columns (ratios/counts from `text.quality_features` or plain Column
  algebra). NULL features are filtered in-plan before the aggregate —
  a single NULL would otherwise poison every gradient component.

At 100 TB: iterations × one scan, each scan a partial-aggregated
reduce to bytes; the model itself never exceeds d+1 doubles, broadcast
as literals into a narrow projection. No all-data shuffle anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round_to(val: float, decimals: int) -> float:
    q = 10.0 ** decimals
    return math.floor(val * q + 0.5) / q


def fast_sigmoid(margin: Column) -> Column:
    """Algebraic sigmoid 0.5 + 0.5·m/(1+|m|) — monotone, (0,1)-ranged,
    and composed only of exactly-rounded IEEE ops so Spark and any ANSI
    SQL engine agree bit-for-bit (unlike exp-based logistic, whose libm
    last-ulp differs across runtimes)."""
    return F.lit(0.5) + F.lit(0.5) * margin / (F.lit(1.0) + F.abs(margin))


def _margin(feature_cols: list[str], weights: list[float], bias: float) -> Column:
    m = F.lit(bias)
    for c, w in zip(feature_cols, weights):
        m = m + F.lit(w) * F.col(c)
    return m


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 3,
    lr: float = 1.0,
    round_to: int = 6,
) -> tuple[list[float], float]:
    """Full-batch gradient descent on the algebraic-sigmoid logistic
    objective; returns ``(weights, bias)`` rounded to ``round_to``
    decimals after every step.

    Per iteration: p = σ(b + w·x); gradient g_j = avg((p − y)·x_j),
    g_b = avg(p − y); w ← round(w − lr·g). Zero init, so iteration 1's
    p is exactly 0.5 for every row. Each iteration is ONE scan reduced
    to d+1 doubles (map-side combined); the collect is a single row —
    the same bounded-collect class as the IVF centroid fetch.
    """
    if not feature_cols:
        raise ValueError("logreg_fit needs at least one feature column")
    clean = df.where(
        F.col(label_col).isNotNull()
        & F.expr(" AND ".join(f"`{c}` IS NOT NULL" for c in feature_cols))
    )
    w = [0.0] * len(feature_cols)
    b = 0.0
    y = F.col(label_col).cast("double")
    for _ in range(iterations):
        err = fast_sigmoid(_margin(feature_cols, w, b)) - y
        row = clean.agg(
            *[F.avg(err * F.col(c)).alias(f"g{j}") for j, c in enumerate(feature_cols)],
            F.avg(err).alias("gb"),
        ).first()
        if row is None or row["gb"] is None:
            raise ValueError("logreg_fit: no trainable rows (empty input?)")
        w = [
            _round_to(w[j] - lr * row[f"g{j}"], round_to)
            for j in range(len(feature_cols))
        ]
        b = _round_to(b - lr * row["gb"], round_to)
    return w, b


def logreg_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    bias: float,
    score_col: str = "score",
    round_to: int = 6,
) -> DataFrame:
    """Attach the model's probability (rounded, replay-stable) and the
    0.5-threshold prediction. Pure row-local Column algebra — the model
    is literals, so scoring 100 TB is a narrow codegen projection with
    zero shuffle."""
    q = 10 ** round_to
    p = fast_sigmoid(_margin(feature_cols, weights, bias))
    score = F.floor(p * q + F.lit(0.5)) / q
    return df.withColumn(score_col, score).withColumn(
        f"{score_col}_pred", (F.col(score_col) >= 0.5).cast("int")
    )


def linreg_fit_2d(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    round_to: int = 6,
) -> tuple[float, float, float, list[float]]:
    """Closed-form two-feature OLS via CENTERED normal equations — the
    exact-solve sibling of the iterative `logreg_fit`: pass 1 reduces
    the corpus to the three means, pass 2 (with the ROUNDED means as
    literals — the rounding is what lets a SQL oracle replay the
    centering bit-for-bit) reduces it to the five centered second-moment
    sums, and a 2x2 Cramer solve on the driver yields the coefficients.
    Centering first avoids the catastrophic cancellation the raw
    (nΣxy − ΣxΣy) form suffers at real magnitudes. Both passes are
    map-side-combined scalar aggregates — one tiny row each regardless
    of corpus size. Returns (w1, w2, intercept, [m1, m2, my]) all
    rounded to ``round_to`` decimals."""
    means = df.agg(
        F.avg(x1).alias("m1"), F.avg(x2).alias("m2"), F.avg(y).alias("my")
    ).first()
    if means is None or any(means[k] is None for k in ("m1", "m2", "my")):
        raise ValueError(
            "linreg_fit_2d: no rows to fit (empty input or an all-NULL "
            "feature/target column)"
        )
    m1 = _round_to(means["m1"], round_to)
    m2 = _round_to(means["m2"], round_to)
    my = _round_to(means["my"], round_to)
    c1 = F.col(x1) - F.lit(m1)
    c2 = F.col(x2) - F.lit(m2)
    cy = F.col(y) - F.lit(my)
    s = df.agg(
        F.sum(c1 * c1).alias("s11"),
        F.sum(c1 * c2).alias("s12"),
        F.sum(c2 * c2).alias("s22"),
        F.sum(c1 * cy).alias("s1y"),
        F.sum(c2 * cy).alias("s2y"),
    ).first()
    det = s["s11"] * s["s22"] - s["s12"] * s["s12"]
    if det == 0.0:
        raise ValueError("linreg_fit_2d: singular design (collinear features)")
    w1 = _round_to((s["s1y"] * s["s22"] - s["s2y"] * s["s12"]) / det, round_to)
    w2 = _round_to((s["s2y"] * s["s11"] - s["s1y"] * s["s12"]) / det, round_to)
    b = _round_to(my - w1 * m1 - w2 * m2, round_to)
    return w1, w2, b, [m1, m2, my]
