"""History-tracking ETL operators: SCD type-2 dimension builds and
CDC (change-data-capture) apply — the standard warehouse maintenance
patterns a release pipeline needs around the reference's incremental
merge (reference: jobs/compare/release_diff shapes and the upsert store
in impc_etl_spark/streaming/jobs.py are point-in-time; these add the
full-history and change-stream forms).

Both operators are single-window / single-shuffle plans:

* ``scd2_build``: one window partitioned by the business key — lag() to
  collapse no-change rows, lead() to close validity intervals. At 100 TB
  the shuffle key is the business key; skewed keys (one entity with
  millions of change rows) split under AQE, and state per task is one
  row of lag/lead context, not the whole partition.
* ``cdc_apply``: latest-wins dedup of the change stream (one window on
  the key) + priority merge with the snapshot (one more window) — no
  driver-side loops, no collect; deletes drop AFTER the merge so a
  delete-then-nothing key erases the snapshot row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from an event-style
    change log: one output row per (key, attribute version) with
    ``valid_from`` / ``valid_to`` / ``is_current``.

    Consecutive rows whose ``attr_cols`` are unchanged COLLAPSE into one
    version (the first observation wins ``valid_from``); the version's
    ``valid_to`` is the next version's ``valid_from`` (NULL = still
    current). ``tiebreak_cols`` makes same-timestamp orderings
    deterministic (pass a unique id).

    Plan: ONE shuffle on the business key feeding two windows (lag for
    change detection, lead for interval close) — Catalyst reuses the
    exchange because both windows share the same partitioning and
    ordering.
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    def changed() -> Column:
        # NULL-safe per-attribute comparison vs the previous row; the
        # first row per key always counts as changed via row_number()==1
        # (NOT a lag(ts)-is-null sentinel — that misfires when the
        # PREVIOUS row's ts is legitimately NULL, duplicating versions).
        conds = [
            ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w)) for a in attr_cols
        ]
        first = F.row_number().over(w) == 1
        out = first
        for c in conds:
            out = out | c
        return out

    change_points = (
        df.withColumn("__chg", changed())
        .where(F.col("__chg"))
        .drop("__chg")
    )
    return (
        change_points.select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(F.col(ts_col)).over(w).alias("valid_to"),
            # POSITIONAL last-version flag, not valid_to-is-null: lead(ts)
            # is ALSO null when the next version's ts is legitimately NULL,
            # which would mark a superseded version current (same NULL-ts
            # trap as the lag sentinel in changed() above)
            F.lead(F.lit(1)).over(w).isNull().alias("is_current"),
        )
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Apply a CDC change stream to a snapshot: for each key, the LATEST
    change wins (ordered by ``ts_col`` then ``tiebreak_cols``); a latest
    op of ``delete_op`` removes the row, anything else upserts the
    change row's values. Keys untouched by the stream keep their
    snapshot row.

    Output schema = snapshot schema (change-stream columns outside it,
    including ``ts_col``/``op_col``, are dropped — CDC payloads carry
    metadata the table doesn't).

    Plan: window latest-per-key over the changes (shuffle 1, pruned to
    one row per key map-side by WindowGroupLimit), then a priority
    window merging change-over-snapshot (shuffle 2). The snapshot never
    joins against the raw stream — only against its deduped head.

    r10: the delete rides THROUGH the priority merge as a null-safe
    flag on the latest-change row instead of a separate anti join —
    the per-key winner is the latest change iff one exists (else the
    snapshot row), and a winner flagged delete is simply dropped.
    Identical result to the former upsert/anti-join split (the latest
    op alone decides a key's fate in both forms; a NULL op is an
    upsert, never a silently-dropped key), but the change stream's
    window subtree is no longer cloned into two consumers (3 base
    scans -> 2 in the r10 plan audit) and the anti join's third
    shuffle disappears.
    """
    order = [F.col(ts_col).desc(), *[F.col(c).desc() for c in tiebreak_cols]]
    latest = (
        changes.withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy(*key_cols).orderBy(*order)),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    out_cols = snapshot.columns
    tagged = (
        latest.select(
            *[
                (F.col(c) if c in latest.columns else F.lit(None)).alias(c)
                for c in out_cols
            ],
            F.col(op_col).eqNullSafe(delete_op).alias("__del"),
        )
        .withColumn("__prio", F.lit(0))
        .unionByName(
            snapshot.withColumn("__del", F.lit(False)).withColumn(
                "__prio", F.lit(1)
            )
        )
    )
    merged = (
        tagged.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*key_cols).orderBy(F.col("__prio"))
            ),
        )
        .where(F.col("__rn") == 1)
    )
    return merged.where(~F.col("__del")).select(*out_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    fingerprint_col: str,
    status_col: str = "status",
) -> DataFrame:
    """Crawl-to-crawl snapshot diff: classify every key across two corpus
    snapshots as ``NEW`` / ``REMOVED`` / ``CHANGED`` / ``UNCHANGED`` — the
    incremental-ingest planner for a recurring crawl (recrawl only CHANGED,
    tombstone REMOVED, run the full quality/dedup pipeline on NEW).

    Both sides are first projected to ``(keys, fingerprint)`` — at 100 TB
    the full-outer join ships 16-byte fingerprints, never document text
    (same discipline as ``dedup_against_store``); it is a plain hash join
    on the key, AQE-splittable on hot keys. Output carries both
    fingerprints so CHANGED rows can drive a targeted re-fetch join later.

    Returns ``(keys..., old_fingerprint, new_fingerprint, status)``.
    """
    keys = list(key_cols)
    # presence flags, NOT fingerprint nullness, decide NEW/REMOVED: a key
    # present in both snapshots with a NULL fingerprint (failed
    # fingerprint job) must not masquerade as NEW/REMOVED, and two NULL
    # fingerprints compare UNCHANGED (eqNullSafe), not CHANGED
    o = old.select(
        *keys, F.col(fingerprint_col).alias("old_fingerprint")
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        *keys, F.col(fingerprint_col).alias("new_fingerprint")
    ).withColumn("__in_new", F.lit(True))
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("NEW"))
        .when(F.col("__in_new").isNull(), F.lit("REMOVED"))
        .when(
            F.col("old_fingerprint").eqNullSafe(F.col("new_fingerprint")),
            F.lit("UNCHANGED"),
        )
        .otherwise(F.lit("CHANGED"))
    )
    return joined.select(*keys, "old_fingerprint", "new_fingerprint", status.alias(status_col))
