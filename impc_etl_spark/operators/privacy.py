"""Differential-privacy-style release operators (north-star extension).

The reference anonymizes by projection only (dropping columns in the Solr/
Mongo marts); a training-data release pipeline needs calibrated-noise
aggregate releases beside the k-anonymity / PII-scrub operators
(`docs_k_anonymity`, `docs_pii_scrub`). This module implements the
standard user-level Laplace counting mechanism as a Spark plan:
contribution capping (bounded sensitivity) + per-cell Laplace noise.

REPLAYABILITY vs TRUE RANDOMNESS: the noise draw here is a PURE FUNCTION
of the cell key + salt (md5 → uniform → inverse-CDF Laplace), so re-runs,
retries and the DuckDB oracle reproduce the release bit-for-bit. That is
the right engineering default for a distributed pipeline (a retried task
must not change the release) — but it means the FORMAL DP guarantee holds
only if the salt is drawn once, secretly and uniformly, per release; swap
`salt` for a per-release CSPRNG secret in production. The calibration
(scale = sensitivity/epsilon) and the capping plan are the real content.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from impc_etl_spark.operators.sampling import hash_bucket

#: uniform-draw resolution for the noise inverse-CDF (finer than the
#: 10^4 sampling bucket space: Laplace tails need it)
NOISE_BUCKETS = 1_000_000


def uniform_from_key(key_cols: Sequence, salt: str = "") -> F.Column:
    """Deterministic uniform in (0, 1) from md5 of the key — the
    (bucket + 0.5)/N midpoint so 0 and 1 are never hit. Replays in any
    engine with md5 (same 15-hex-digit conv as `hash_bucket`)."""
    b = hash_bucket(key_cols, salt=salt, num_buckets=NOISE_BUCKETS)
    return (b.cast("double") + F.lit(0.5)) / F.lit(float(NOISE_BUCKETS))


def laplace_noise(u: F.Column, scale: F.Column | float) -> F.Column:
    """Inverse-CDF Laplace(0, scale) from a uniform draw:
    −b·sign(u−½)·ln(1−2·|u−½|). Closed-form double algebra — identical
    operand tree on any engine given the same u."""
    s = F.lit(float(scale)) if isinstance(scale, (int, float)) else scale
    d = u - F.lit(0.5)
    return -s * F.signum(d) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(d))


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    user_col: str,
    epsilon: float = 1.0,
    max_contrib: int = 4,
    salt: str = "dp",
) -> DataFrame:
    """User-level ε-DP counting release over ``group_cols`` cells:

    1. CONTRIBUTION CAP (sensitivity bound): each user counts in at most
       ``max_contrib`` distinct cells — the deterministic first
       ``max_contrib`` cells in group-key order via a per-user
       row_number window (bounded by the user's distinct-cell count,
       never data-sized). Adding/removing one user then changes at most
       ``max_contrib`` cell counts by 1 each → L1 sensitivity =
       max_contrib.
    2. one counting groupBy (map-side combined),
    3. + Laplace(max_contrib/ε) noise, drawn deterministically per cell
       (module docstring: replayable release; salt = the release
       secret).

    Cells no user landed in are ABSENT from the release (the standard
    known-domain caveat: enumerate and union zero-count cells first if
    the cell domain is public). Output: group_cols, n_users (the capped
    true count — drop it for a real release; kept here so tests can see
    the mechanism), noisy_count, epsilon, sensitivity.
    """
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    if max_contrib < 1:
        raise ValueError("max_contrib must be >= 1")
    cells = df.select(
        *[F.col(c) for c in group_cols], F.col(user_col).alias("__u")
    ).where(F.col("__u").isNotNull()).distinct()
    w = Window.partitionBy("__u").orderBy(*group_cols)
    capped = (
        cells.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_contrib)
    )
    counts = capped.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_users")
    )
    scale = float(max_contrib) / float(epsilon)
    u = uniform_from_key([F.col(c).cast("string") for c in group_cols],
                         salt=salt)
    return counts.select(
        *group_cols,
        "n_users",
        (F.col("n_users").cast("double") + laplace_noise(u, scale)).alias(
            "noisy_count"
        ),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(float(max_contrib)).alias("sensitivity"),
    )
