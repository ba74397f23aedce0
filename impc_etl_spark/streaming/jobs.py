"""Structured Streaming operators over the events stream.

The reference has NO streaming (SURVEY.md §2.9) — its "time series" are
batch arrays. These operators are the north-star streaming surface: the
same tumbling/sliding/session aggregations the batch layer exposes
(operators/timeseries.py), lifted onto an unbounded source with
watermarked state, plus a custom stateful operator via
``applyInPandasWithState``.

Batch/stream parity is by construction: the transformation bodies are the
same ``window()``/``session_window()`` expressions, so a backfill (batch
over parquet) and the live stream produce identical frames — tested by
running each stream with ``Trigger.AvailableNow`` against the batch
result. At scale, state lives in the state store partitioned by group key;
watermarks bound it — every operator here requires one.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream the events table (parquet dir), ``ts`` normalized to a
    µs TimestampType whatever the reader surfaced: Spark builds honoring
    ``nanosAsLong`` deliver TIMESTAMP(NANOS) as long nanos (divide to µs
    with integer arithmetic); 4.1-era builds µs-truncate to TIMESTAMP_NTZ
    (cast — session TZ is pinned UTC). The declared-schema choice is made
    by a driver-side batch footer probe of the same directory (streams
    can't infer schema; one listing, no job). ``max_files_per_trigger``
    throttles ingestion (and, with availableNow, forces multiple
    micro-batches — useful to exercise cross-batch state)."""
    if schema is None:
        probed = dict(spark.read.parquet(source_dir).dtypes).get("ts")
        schema = (
            EVENTS_DDL
            if probed == "bigint"
            else EVENTS_DDL.replace("ts bigint", "ts timestamp_ntz")
        )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(source_dir)
    if dict(raw.dtypes).get("ts") == "bigint":
        out = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        out = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    # NULL event times are dropped at the source boundary: every job
    # downstream watermarks on ts (a NULL event-time row is meaningless
    # to windowed/stateful processing), and the batch twins apply the
    # same guard — stream ≡ batch parity holds on hostile input too
    # (r7 hardening).
    return out.where(F.col("ts").isNotNull())


def windowed_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per key — the streaming twin
    of timeseries.tumbling_window_agg. NaN values are treated as NULL
    (counted, excluded from the sum) — the engine-wide bad-point contract
    the batch twin pins (see queries.hourly_event_stats): one NaN event
    would otherwise poison its window's running sum forever."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.nanvl(F.col("value"), F.lit(None).cast("double"))).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
) -> DataFrame:
    """Watermarked session windows per key — streaming twin of
    timeseries.sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            key,
            "n_events",
        )
    )


def stateful_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator: per-user running totals via
    ``applyInPandasWithState`` (the escape hatch for semantics windowed
    aggs can't express — cross-batch accumulators, custom eviction).

    State is one (count, sum) pair per user in the state store; output one
    updated row per user per micro-batch.
    """
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of ``keys`` arriving within the
    watermark window (``dropDuplicatesWithinWatermark`` — state holds one
    entry per key and is EVICTED once the watermark passes it, unlike
    ``dropDuplicates`` whose streaming state grows forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    window: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: every click by the same user within ``window``
    BEFORE a purchase (ad-attribution shape). Both sides carry watermarks
    and the join condition carries the time range — that pair is what
    lets Spark evict join state; without them state grows forever.

    ``how='left_outer'`` additionally emits each UNMATCHED purchase once
    with NULL click columns — the organic-conversion set an attribution
    pipeline needs alongside the attributed one. Outer rows surface only
    when the watermark passes the purchase's match window (Spark must
    prove no matching click can still arrive), so they trail the inner
    results by up to ``watermark`` of event time — the streaming price of
    a closed-world answer; plan a late-binding consumer or a batch
    backfill for the tail when the stream idles.

    (The batch as-of join keeps only the nearest click; stream-stream
    joins emit ALL matches in the window — the nearest-selection is a
    downstream aggregation if needed.)
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("interval_join supports how='inner'|'left_outer'")
    p = purchases.select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    return p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts >= p_ts - INTERVAL {window} AND c_ts <= p_ts"
        ),
        how,
    ).select("purchase_id", "click_id", "p_user", "p_ts", "c_ts")


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a broadcast
    batch dimension (the streaming twin of ``marts.enrich``). The static
    side is re-read per micro-batch by Spark, so a dimension backed by a
    parquet/Delta path picks up slowly-changing updates without a restart;
    broadcasting keeps the join shuffle-free — the stream never
    repartitions. No watermark is needed: stream-static joins are
    stateless (nothing is buffered waiting for the other side)."""
    return events.join(F.broadcast(dim), on, how)


def _interval_micros(interval: str) -> int:
    """Parse a fixed-width 'N second(s)/minute(s)/hour(s)/day(s)' interval
    to microseconds (calendar widths rejected, as in resample_ffill)."""
    import re

    m = re.fullmatch(
        r"(\d+)\s+(second|minute|hour|day)s?", interval.strip(), re.IGNORECASE
    )
    if not m:
        raise ValueError(
            f"unsupported interval {interval!r} — use 'N second(s)/minute(s)/"
            "hour(s)/day(s)'"
        )
    return int(m.group(1)) * {
        "second": 1, "minute": 60, "hour": 3600, "day": 86400,
    }[m.group(2).lower()] * 1_000_000


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    tolerance: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming as-of join: each left event picks the LATEST right event
    with the same key and ``right.ts <= left.ts`` within ``tolerance`` —
    the nearest-prior enrichment (price-at-trade, last-click attribution)
    that stream-stream interval joins cannot express (they emit ALL
    matches; the per-left argmax over a stream needs custom state).

    Built as the sanctioned custom stateful operator: both streams union
    into one keyed stream and ``applyInPandasWithState`` keeps, per key,
    ONLY the right rows a still-admissible left could match: state is
    evicted against the WATERMARK minus tolerance (not the per-key max
    event time), so a left arriving in a later micro-batch up to the full
    ``watermark`` delay behind the stream — even more than ``tolerance``
    behind its key's newest event — still finds its candidate rights in
    state and matches exactly like the batch twin. State stays bounded by
    (watermark + tolerance) × right-side rate. Matching is on EVENT time
    via binary search, so within-batch arrival order never matters; ties
    on right ts resolve to the largest value (deterministic).
    Cross-batch: rights persist in state, so a left arriving batches
    later still matches; a right arriving AFTER a left was already
    emitted cannot retro-update it — the standard streaming as-of
    trade-off (batch ``asof_join`` is the exact twin for backfills).

    Returns one row per left event: (key, left_id, ts, matched_ts,
    matched_value) with nulls when nothing is in range.
    """
    tol_us = _interval_micros(tolerance)

    l = left.select(
        F.col(key).alias("k"), "ts",
        F.col("event_id").alias("left_id"),
        F.lit("L").alias("side"),
        F.lit(None).cast("double").alias("rval"),
    )
    r = right.select(
        F.col(key).alias("k"), "ts",
        F.lit(None).cast("bigint").alias("left_id"),
        F.lit("R").alias("side"),
        F.col("value").alias("rval"),
    )
    unioned = l.unionByName(r).withWatermark("ts", watermark)

    def update(
        kt: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            st_ts, st_val = state.get
            r_ts = list(st_ts)
            r_val = list(st_val)
        else:
            r_ts, r_val = [], []

        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            yield pd.DataFrame(
                columns=["k", "left_id", "ts", "matched_ts", "matched_value"]
            )
            return
        batch = pd.concat(batches, ignore_index=True)
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64")

        is_r = (batch["side"] == "R").to_numpy()
        r_ts.extend(ts_us[is_r].tolist())
        r_val.extend(batch["rval"].to_numpy()[is_r].tolist())

        # sort rights by (ts, val): searchsorted finds the latest ts <= t,
        # and among equal ts the max value sits last — deterministic tie
        order = sorted(range(len(r_ts)), key=lambda i: (r_ts[i], r_val[i]))
        rt = np.array([r_ts[i] for i in order], dtype="int64")
        rv = np.array([r_val[i] for i in order], dtype="float64")

        lmask = ~is_r
        lts = ts_us[lmask]
        if rt.size:
            idx = np.searchsorted(rt, lts, side="right") - 1
            safe = np.clip(idx, 0, None)
            ok = (idx >= 0) & (lts - rt[safe] <= tol_us)
            m_ts = np.where(ok, rt[safe], 0)
            m_val = np.where(ok, rv[safe], np.nan)
        else:
            ok = np.zeros(len(lts), dtype=bool)
            m_ts = np.zeros(len(lts), dtype="int64")
            m_val = np.full(len(lts), np.nan)

        out = pd.DataFrame(
            {
                "k": batch["k"].to_numpy()[lmask],
                "left_id": batch["left_id"].to_numpy()[lmask],
                "ts": pd.to_datetime(lts, unit="us"),
                "matched_ts": pd.Series(
                    np.where(ok, m_ts, np.int64(0)), dtype="int64"
                ).astype("datetime64[us]").where(ok),
                "matched_value": m_val,
            }
        )

        # evict rights that can no longer match any ADMISSIBLE left: the
        # watermark bounds how late a left can still arrive, so anything
        # older than watermark - tolerance is provably unmatchable (the
        # per-key max event time is NOT a safe horizon — a left may
        # lawfully arrive up to the watermark delay behind it)
        horizon = state.getCurrentWatermarkMs() * 1000 - tol_us
        keep = rt >= horizon
        state.update((rt[keep].tolist(), rv[keep].tolist()))
        yield out

    out = unioned.groupBy("k").applyInPandasWithState(
        update,
        outputStructType=(
            "k bigint, left_id bigint, ts timestamp, "
            "matched_ts timestamp, matched_value double"
        ),
        stateStructType="r_ts array<bigint>, r_val array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(
        F.col("k").alias(key), "left_id", "ts", "matched_ts", "matched_value"
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "update",
) -> None:
    """Drain the source with Trigger.AvailableNow into an in-memory table
    named ``query_name`` (test/backfill harness; use ``append`` for
    non-aggregated streams)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _store_pointer(store_dir: str) -> str:
    import os

    return os.path.join(store_dir, "_CURRENT")


def current_store_path(store_dir: str) -> str | None:
    """Resolve an upsert store's CURRENT version directory (None before
    the first committed batch)."""
    import os

    ptr = _store_pointer(store_dir)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = f.read().strip()
    return os.path.join(store_dir, version) if version else None


def read_store(spark, store_dir: str) -> DataFrame:
    """Read the current committed version of an ``upsert_sink`` store."""
    path = current_store_path(store_dir)
    if path is None:
        raise FileNotFoundError(f"upsert store has no committed version: {store_dir}")
    return spark.read.parquet(path)


def _checkpoint_query_id(checkpoint_dir: str) -> str | None:
    """The streaming query's STABLE id from the checkpoint's metadata file
    (written at query start, persisted across restarts of the same
    checkpoint; a fresh checkpoint mints a new id). This is the
    discriminator that tells a crash-after-flip REPLAY (same checkpoint,
    same batch id) apart from a DIFFERENT query run that merely reuses
    batch id 0 (new checkpoint over an existing store)."""
    import json
    import os

    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return json.load(f).get("id")
    except Exception:
        return None


def _version_meta(version_dir: str) -> dict:
    import json
    import os

    try:
        with open(os.path.join(version_dir, "_COMMIT_META.json")) as f:
            return json.load(f)
    except Exception:
        return {}


def _commit_version(
    store_dir: str,
    merged: DataFrame,
    batch_id: int,
    current: str | None,
    checkpoint_dir: str | None = None,
) -> None:
    """Write ``merged`` as version ``v<batch_id>`` and flip the _CURRENT
    pointer atomically (shared by every versioned-store sink); GC version
    dirs older than the previous one. Each version carries a
    ``_COMMIT_META.json`` marker (underscore-prefixed: invisible to
    parquet readers) recording (query id, batch id) for the replay guard.
    If the natural name collides with the CURRENT version (a different
    query reusing a batch id), an ``r<n>`` suffix is chosen so the merge
    never reads and overwrites the same directory."""
    import json
    import os
    import shutil

    version = f"v{batch_id}"
    n = 0
    while current is not None and version == os.path.basename(current):
        n += 1
        version = f"v{batch_id}r{n}"
    new_dir = os.path.join(store_dir, version)
    merged.write.mode("overwrite").parquet(new_dir)
    qid = _checkpoint_query_id(checkpoint_dir) if checkpoint_dir else None
    with open(os.path.join(new_dir, "_COMMIT_META.json"), "w") as f:
        json.dump({"query_id": qid, "batch_id": batch_id}, f)
    ptr, tmp_ptr = _store_pointer(store_dir), _store_pointer(store_dir) + ".tmp"
    with open(tmp_ptr, "w") as f:
        f.write(version)
    os.replace(tmp_ptr, ptr)  # atomic commit
    keep = {version, os.path.basename(current) if current else version}
    for d in os.listdir(store_dir):
        if d.startswith("v") and d not in keep:
            shutil.rmtree(os.path.join(store_dir, d), ignore_errors=True)


def upsert_sink(
    stream_df: DataFrame,
    store_dir: str,
    keys: list[str],
    checkpoint_dir: str,
    dedup_order: list[str] | None = None,
    op_col: str | None = None,
    delete_op: str = "D",
) -> None:
    """Stream → parquet-store MERGE: drain the stream with AvailableNow,
    upserting each micro-batch into a versioned store under ``store_dir``
    by key (``conform.merge_upsert`` inside ``foreachBatch``) — continuous
    ingestion into a keyed store without a transactional table format.

    Within a micro-batch the LATEST row per key wins (``dedup_order``
    descending, e.g. the event time — merge_upsert requires key-unique
    updates); across batches the newer batch replaces same-key rows.

    Crash safety: each batch writes a NEW version directory
    (``v<batch_id>``) and then flips the ``_CURRENT`` pointer with an
    atomic rename — the previous version is never modified, so a crash
    mid-write leaves the store readable at its last committed version and
    checkpoint replay re-runs the same batch id safely: a crash BEFORE
    the flip leaves an orphaned version dir that the re-run simply
    overwrites, and a crash AFTER the flip (pointer at ``v<batch_id>``
    but checkpoint uncommitted) is detected and SKIPPED — the committed
    version already is this batch's result, and re-merging would read
    and overwrite the same directory. Only a MISSING pointer is treated
    as "first batch"; any other store-read failure aborts the query
    loudly instead of silently rebuilding from one micro-batch.
    Version dirs older than the previous one are garbage-collected after
    each flip. The pointer rename is atomic on POSIX filesystems; on
    object stores, front it with a rename/commit layer or use a table
    format. Read with ``read_store``.

    CDC mode: pass ``op_col`` (requires ``dedup_order``) and each batch
    is applied with full change-stream semantics via
    ``history.cdc_apply`` — per key the LATEST op in the batch wins, and
    a latest op of ``delete_op`` REMOVES the row from the store (the
    plain mode can only add/replace). The store schema is the stream's
    columns minus ``op_col``.
    """
    from impc_etl_spark.operators.conform import merge_upsert
    from impc_etl_spark.operators.history import cdc_apply

    if op_col is not None and not dedup_order:
        raise ValueError("op_col (CDC mode) requires dedup_order for latest-wins")

    spark = stream_df.sparkSession

    def do_merge(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        current = current_store_path(store_dir)
        # crash-after-flip replay: the committed version IS this batch's
        # result — re-merging would lazily read v<batch_id> while
        # overwriting the same directory (self-overwrite); skip instead
        if _batch_already_committed(current, batch_id, checkpoint_dir):
            return
        if op_col is not None:
            store_cols = [c for c in batch_df.columns if c != op_col]
            snapshot = (
                spark.read.parquet(current)
                if current is not None
                else batch_df.select(*store_cols).where(F.lit(False))
            )
            merged = cdc_apply(
                snapshot,
                batch_df,
                keys,
                ts_col=dedup_order[0],
                op_col=op_col,
                delete_op=delete_op,
                tiebreak_cols=dedup_order[1:],
            )
        else:
            updates = batch_df
            if dedup_order:
                w = Window.partitionBy(*keys).orderBy(
                    *[F.col(c).desc() for c in dedup_order]
                )
                updates = (
                    updates.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") == 1)
                    .drop("__rn")
                )
            merged = (
                updates
                if current is None
                else merge_upsert(spark.read.parquet(current), updates, keys)
            )
        _commit_version(store_dir, merged, batch_id, current, checkpoint_dir)

    q = (
        stream_df.writeStream.foreachBatch(do_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def scd2_sink(
    stream_df: DataFrame,
    store_dir: str,
    keys: list[str],
    ts_col: str,
    attr_cols: list[str],
    checkpoint_dir: str,
    tiebreak_cols: list[str] | None = None,
) -> None:
    """Streaming SCD type-2 dimension maintenance: drain the change stream
    with AvailableNow into a versioned parquet SCD2 store — per batch,
    each affected key's OPEN version is re-derived together with the
    batch's change rows (``history.scd2_build`` over open-version +
    batch events), so a change CLOSES the open version (valid_to = the
    change's timestamp) and appends the new one, while a no-change event
    collapses into the open version. CLOSED versions are immutable —
    they are carried over untouched, never recomputed.

    Late data contract: an event older than its key's open-version
    ``valid_from`` cannot be integrated without rewriting closed history
    — it is DROPPED, the same append-only assumption a watermark imposes
    on any streaming aggregate. Replaying the parquet history through
    batch ``scd2_build`` is the backfill path when late data matters.

    Store schema: ``keys + attr_cols + valid_from + valid_to +
    is_current``. Crash safety = the same versioned-directory + atomic
    pointer flip as ``upsert_sink``. Read with ``read_store``.
    """
    from impc_etl_spark.operators.history import scd2_build

    spark = stream_df.sparkSession
    tb = list(tiebreak_cols or [])
    out_cols = [*keys, *attr_cols, "valid_from", "valid_to", "is_current"]

    def do_merge(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(*keys, F.col(ts_col), *attr_cols, *tb)
        current = current_store_path(store_dir)
        # crash-after-flip replay guard (see upsert_sink): v<batch_id>
        # already contains this batch; re-merging would self-overwrite
        if _batch_already_committed(current, batch_id, checkpoint_dir):
            return
        if current is None:
            rebuilt = scd2_build(batch, keys, ts_col, attr_cols, tb)
            _commit_version(store_dir, rebuilt.select(*out_cols), batch_id, None, checkpoint_dir)
            return
        store = spark.read.parquet(current)
        affected = batch.select(*keys).distinct()
        open_affected = store.where(F.col("is_current")).join(affected, keys)
        # open version re-enters the merge as a synthetic FIRST event for
        # its key: ts = valid_from, tiebreaks = NULL (nulls-first in the
        # ascending scd2 ordering, so at equal ts the stored version wins
        # the "previous state" slot)
        open_events = open_affected.select(
            *keys,
            F.col("valid_from").alias(ts_col),
            *attr_cols,
            *[F.lit(None).alias(c) for c in tb],
        )
        # late events (older than the open version's start) are dropped —
        # integrating them would rewrite closed, immutable history
        fresh = batch.join(
            open_affected.select(*keys, "valid_from"), keys, "left_outer"
        ).where(
            F.col("valid_from").isNull() | (F.col(ts_col) >= F.col("valid_from"))
        ).drop("valid_from")
        rebuilt = scd2_build(
            open_events.unionByName(fresh), keys, ts_col, attr_cols, tb
        )
        untouched = store.where(~F.col("is_current")).select(*out_cols).unionByName(
            store.where(F.col("is_current")).join(affected, keys, "left_anti")
            .select(*out_cols)
        )
        merged = untouched.unionByName(rebuilt.select(*out_cols))
        _commit_version(store_dir, merged, batch_id, current, checkpoint_dir)

    q = (
        stream_df.writeStream.foreachBatch(do_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_ingest_sink(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    near: bool = False,
    threshold: float = 0.8,
    k: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> None:
    """CONTINUOUS corpus ingestion with dedup: drain a document stream
    with AvailableNow; per micro-batch, (1) exact-dedup within the batch,
    (2) drop rows whose fingerprint already exists in the store
    (``dedup.dedup_against_store``), (3) optionally drop NEAR-dups of
    store documents via batch-vs-store LSH probing
    (``dedup.near_dup_against_store``), then APPEND the survivors to the
    versioned parquet store — the streaming twin of the batch
    incremental-dedup path, sharing the exact same operator bodies (so
    batch backfill ≡ replaying the stream).

    Crash safety is the shared versioned-store contract: a new
    ``v<batch_id>`` directory + atomic ``_CURRENT`` pointer flip per
    batch; checkpoint replay rewrites the same version id idempotently.
    At scale the store side of both probes reduces to its fingerprint set
    / band-key index — persist those alongside the store and this sink
    never re-tokenizes history (here they are recomputed from the current
    version for simplicity; the operator contract is identical).
    """
    from pyspark.sql import Window

    from impc_etl_spark.operators.dedup import (
        dedup_against_store,
        near_dup_against_store,
    )

    spark = stream_df.sparkSession

    def do_ingest(batch_df: DataFrame, batch_id: int) -> None:
        current = current_store_path(store_dir)
        # crash-after-flip replay guard (see upsert_sink): the committed
        # v<batch_id> already holds this batch's survivors; re-running
        # would read and overwrite the same directory
        if _batch_already_committed(current, batch_id, checkpoint_dir):
            return
        # in-batch exact dedup: keep min id per fingerprint (same
        # semantics as dedup.exact_dedup but retaining full rows)
        from impc_etl_spark.operators.text import fingerprint

        w = Window.partitionBy("__fp").orderBy(id_col)
        batch = (
            batch_df.withColumn("__fp", fingerprint(text_col))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__fp", "__rn")
        )
        if current is not None:
            store = spark.read.parquet(current)
            batch = dedup_against_store(batch, store, text_col)
            if near:
                batch = near_dup_against_store(
                    batch, store, text_col, id_col,
                    k=k, num_hashes=num_hashes, bands=bands,
                    threshold=threshold, mode="drop",
                )
            merged = store.unionByName(batch)
        else:
            merged = batch
        _commit_version(store_dir, merged, batch_id, current, checkpoint_dir)

    q = (
        stream_df.writeStream.foreachBatch(do_ingest)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sketch_sink(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    num_hashes: int = 4,
    num_bits: int = 1024,
) -> None:
    """Maintain a count-min sketch AND a Bloom filter continuously during
    ingestion: per micro-batch, build the BATCH's sketches (tiny — the
    grids, never the item domain) and merge them into the versioned store
    by summing counters / accumulating bit counts. Sketches are LINEAR,
    so stream maintenance is exact: after any number of micro-batches the
    stored sketch equals the batch-built sketch over everything ingested
    (tested), and a 100 TB history answers frequency/membership probes
    from a KB-sized store without any re-scan.

    Store rows: (kind, a, b, n) — cms rows are (``'cms'``, r, c, count);
    bloom rows are (``'bloom'``, 0, bit, increments) where increments is
    the number of (item-occurrence, hash-function) hits on that cell —
    TRUE counting-Bloom cells (``bloom_bit_counts``), so a deletion can
    decrement each of an item's k cells symmetrically and ``n > 0``
    recovers the plain bit set (``read_sketch_store`` applies that
    filter). Crash safety is the upsert
    sink's versioned-directory + atomic pointer-flip scheme, PLUS a
    batch-id idempotency guard: foreachBatch is at-least-once, and unlike
    the upsert sink's key-replace merge a SUM-merge is NOT naturally
    idempotent — so if the committed version already carries this batch's
    (query id, batch id) pair (crash after flip, before checkpoint
    commit), the replay is skipped instead of double-counted. A NEW query
    (fresh checkpoint) over the same store is deliberately NOT skipped:
    reprocessing the same source through a new query re-adds its counts,
    which is what "reprocess everything" means for an additive sketch —
    start a fresh store to rebuild. Read with ``read_sketch_store``.
    """
    from impc_etl_spark.operators.aggregate import (
        bloom_bit_counts,
        count_min_sketch,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cms_b = count_min_sketch(batch_df, item_col, depth=depth, width=width)
        bloom_b = bloom_bit_counts(
            batch_df, item_col, num_hashes=num_hashes, num_bits=num_bits
        )
        fresh = cms_b.select(
            F.lit("cms").alias("kind"), F.col("r").cast("long").alias("a"),
            F.col("c").alias("b"), F.col("n"),
        ).unionByName(
            bloom_b.select(
                F.lit("bloom").alias("kind"), F.lit(0).cast("long").alias("a"),
                F.col("bit").alias("b"), F.col("n").cast("long").alias("n"),
            )
        )
        current = current_store_path(store_dir)
        if _batch_already_committed(current, batch_id, checkpoint_dir):
            return
        if current is not None:
            fresh = fresh.unionByName(spark.read.parquet(current))
        merged = fresh.groupBy("kind", "a", "b").agg(F.sum("n").alias("n"))
        _commit_version(store_dir, merged, batch_id, current, checkpoint_dir)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _batch_already_committed(
    current: str | None, batch_id: int, checkpoint_dir: str | None = None
) -> bool:
    """True when the committed store version is THIS query's commit of
    THIS batch id — an at-least-once replay after the pointer flip.
    Additive merges (sum counters, sum partials) MUST skip it or they
    double-count; key-replace merges must skip it or they read and
    overwrite the same directory. The check compares the version's
    ``_COMMIT_META.json`` (query id + batch id) against the live
    checkpoint's query id, so a DIFFERENT query that merely reuses batch
    id 0 over an existing store (fresh checkpoint — its data is genuinely
    new) is NOT mistaken for a replay. Falls back to the basename
    heuristic for stores committed before the marker existed."""
    import os

    if current is None:
        return False
    meta = _version_meta(current)
    if meta:
        if meta.get("batch_id") != batch_id:
            return False
        stored = meta.get("query_id")
        live = _checkpoint_query_id(checkpoint_dir) if checkpoint_dir else None
        # same batch id: a replay iff the same query committed it. An
        # UNKNOWN stored identity (pre-marker store) is treated as a
        # replay — the conservative, self-overwrite-safe side. But when
        # the STORE recorded a query id and the LIVE checkpoint's id
        # cannot be read, that is an environment fault (permissions,
        # transient FS error) — silently calling it a replay would DROP
        # a genuinely new query's batch, which is silent data loss for
        # additive sinks. Abort loudly instead.
        if stored is not None and checkpoint_dir and live is None:
            raise RuntimeError(
                f"cannot read streaming query id from checkpoint "
                f"{checkpoint_dir!r} while the store's committed version "
                f"carries query id {stored!r} for batch {batch_id} — "
                "refusing to guess replay-vs-new (a wrong guess either "
                "drops or double-applies this batch)"
            )
        return stored is None or live is None or stored == live
    return os.path.basename(current) == f"v{batch_id}"


def read_sketch_store(spark, store_dir: str) -> tuple[DataFrame, DataFrame]:
    """Read a ``sketch_sink`` store → (cms(r, c, n), bloom(bit)) frames in
    the exact shapes ``cms_estimate`` / ``bloom_filter_probe`` consume."""
    all_rows = read_store(spark, store_dir)
    cms = all_rows.where(F.col("kind") == "cms").select(
        F.col("a").cast("int").alias("r"), F.col("b").alias("c"), "n"
    )
    bloom = (
        all_rows.where((F.col("kind") == "bloom") & (F.col("n") > 0))
        .select(F.col("b").alias("bit"))
    )
    return cms, bloom


MERGEABLE_AGGS = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def incremental_agg_sink(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
) -> None:
    """Maintain a keyed aggregate table continuously — the streaming
    MATERIALIZED VIEW for algebraic aggregates: per micro-batch compute
    the batch's partial aggregates (map-side-combined, batch-sized), then
    merge into the versioned store with each aggregate's MERGE function
    (count merges by sum, sum by sum, min by min, max by max). Because
    the aggregates are algebraic, the maintained table is EXACT: after
    any number of micro-batches it equals the batch aggregate over
    everything ingested (tested). Averages: maintain (sum, count) and
    derive at read time.

    ``aggs`` maps output column → (func, source column), func in
    {count, sum, min, max}. At 100 TB/day the per-batch shuffle is
    keys-sized partials, and the store rewrite is the aggregate table —
    never raw history; a late restatement is a CDC problem (use
    ``upsert_sink`` with op_col), not an aggregate merge. Crash safety =
    the shared versioned-directory + atomic pointer scheme + the batch-id
    idempotency guard (sum/count merges are additive, so an at-least-once
    replay after the flip must be skipped, not re-merged). Read with
    ``read_store``.
    """
    for out, (fn, _src) in aggs.items():
        if fn not in MERGEABLE_AGGS:
            raise ValueError(
                f"agg {out}={fn} is not algebraic-mergeable; supported: "
                f"{sorted(MERGEABLE_AGGS)}"
            )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = batch_df.groupBy(*keys).agg(*[
            getattr(F, fn)(F.lit(1) if fn == "count" else src).alias(out)
            for out, (fn, src) in aggs.items()
        ])
        current = current_store_path(store_dir)
        if _batch_already_committed(current, batch_id, checkpoint_dir):
            return
        if current is not None:
            partial = partial.unionByName(spark.read.parquet(current))
        merged = partial.groupBy(*keys).agg(*[
            getattr(F, MERGEABLE_AGGS[fn])(out).alias(out)
            for out, (fn, _src) in aggs.items()
        ])
        _commit_version(store_dir, merged, batch_id, current, checkpoint_dir)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def moments_sink(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    dim: int = 64,
) -> None:
    """Maintain the PCA/covariance sufficient statistic — one
    (n, Σx, ΣxxᵀT flattened) row — continuously over a vector stream.
    The moments are algebraic (merge = elementwise sum), so the store is
    EXACT after any number of micro-batches: feed it to
    ``similarity.pca_from_moments`` and the incrementally-maintained
    model is the same computation as a batch ``pca_fit`` over everything
    ingested (tested against the batch twin under shuffled arrival).

    Per batch: ``moment_partials`` reduces the batch to ≤partitions tiny
    rows (d²+d+1 doubles each), the store's single row is unioned in, and
    the elementwise combine runs in-plan (posexplode → per-index sum →
    array rebuild — a few thousand rows, never data-sized). Crash safety
    = the shared versioned-directory + atomic pointer scheme + the
    batch-id idempotency guard (moment merges are additive, so an
    at-least-once replay after the flip must be skipped, not re-merged).
    Read with ``read_store``; no raw vector is ever retained."""
    from impc_etl_spark.operators.similarity import moment_partials

    def combine(parts: DataFrame) -> DataFrame:
        def arr_sum(col: str) -> DataFrame:
            return (
                parts.select(F.posexplode(col).alias("i", "v"))
                .groupBy("i").agg(F.sum("v").alias("v"))
                .agg(
                    F.array_sort(F.collect_list(F.struct("i", "v"))).alias("a")
                )
                .select(F.transform("a", lambda x: x["v"]).alias(col))
            )

        n = parts.agg(F.sum("n").alias("n"))
        return n.crossJoin(arr_sum("s")).crossJoin(arr_sum("m"))

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        current = current_store_path(store_dir)
        if _batch_already_committed(current, batch_id, checkpoint_dir):
            return
        # materialize the batch's tiny partials once: combine() references
        # the frame three times (n, s, m), and isEmpty() a fourth — an
        # unmaterialized plan would rerun the batch-sized numpy scan per
        # reference
        partial = moment_partials(batch_df, vec_col, dim).localCheckpoint(
            eager=True
        )
        if current is not None:
            partial = partial.unionByName(spark.read.parquet(current))
        if partial.isEmpty():
            return  # nothing ingested yet and nothing stored: no version
        _commit_version(
            store_dir, combine(partial), batch_id, current, checkpoint_dir
        )

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ewma_stream(
    events: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    alpha: float = 0.3,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-key EWMA — the online-feature twin of
    ``timeseries.ewma``: the exponentially weighted average is a linear
    recurrence whose state is ONE number per key, so
    ``applyInPandasWithState`` carries (e, last_ts) across micro-batches
    and each event emits its smoothed value the moment it arrives.
    Within a micro-batch rows are processed in EVENT-time order (id
    tiebreak), so intra-batch arrival order never matters; across
    batches, an event at or before its key's last PROCESSED (event time,
    event id) cannot be integrated without rewriting already-emitted
    outputs and is dropped with a NULL ewma — the same append-only late-data
    contract as ``scd2_sink`` (batch ``ewma`` over the stored history is
    the exact backfill twin when late data matters; the recurrence uses
    the identical literal α·v + (1−α)·e doubles, so in-order replay
    matches bit-for-bit).

    Output: (key, event_id, ts, value, ewma). State per key is O(1) —
    bounded regardless of stream length or rate.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if not 0.0 < alpha <= 1.0:  # same contract as the batch twin
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    beta = 1.0 - alpha
    src = events.withWatermark("ts", watermark).select(
        F.col(key).alias("k"), "event_id", "ts",
        F.col(value_col).cast("double").alias("v"),
    )

    def update(kt, pdfs, state):
        import pandas as pd

        if state.exists:
            e, last_us, last_id, seen = state.get
        else:
            e, last_us, last_id, seen = 0.0, -(1 << 62), -(1 << 62), False
        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            yield pd.DataFrame(columns=["k", "event_id", "ts", "v", "ewma"])
            return
        batch = pd.concat(batches, ignore_index=True)
        batch["__us"] = batch["ts"].astype("datetime64[us]").astype("int64")
        batch = batch.sort_values(["__us", "event_id"], kind="mergesort")
        out = []
        for us, eid, v in zip(batch["__us"], batch["event_id"], batch["v"]):
            # late beyond state: anything that would sort BEFORE the last
            # processed (ts, event_id) in the batch twin's order — folding
            # it now would put it after, diverging from the backfill
            if us < last_us or (us == last_us and eid <= last_id):
                out.append(None)
                continue
            if v is None or v != v:  # NULL/NaN: skip like the batch twin
                last_us, last_id = us, eid
                out.append(None)
                continue
            e = v if not seen else alpha * v + beta * e
            seen = True
            last_us, last_id = us, eid
            out.append(e)
        batch["ewma"] = pd.array(out, dtype="float64")
        state.update((float(e), int(last_us), int(last_id), bool(seen)))
        yield batch.drop(columns=["__us"])

    out = src.groupBy("k").applyInPandasWithState(
        update,
        outputStructType=(
            "k bigint, event_id bigint, ts timestamp, v double, ewma double"
        ),
        stateStructType="e double, last_us bigint, last_id bigint, seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(
        F.col("k").alias(key), "event_id", "ts",
        F.col("v").alias(value_col), "ewma",
    )


def funnel_stream(
    events: DataFrame,
    key: str = "user_id",
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming ordered-funnel tracker — the online twin of the batch
    `queries.events_funnel`: per key, anchor the first ``steps[0]``, the
    first ``steps[1]`` strictly after it, and so on. State per key is
    one bigint per step (first-anchor µs, -1 unset) plus the last
    processed (event time, id) — O(len(steps)), bounded forever. Rows
    are integrated in EVENT-time order within each micro-batch (id
    tiebreak); an event at or before its key's last processed (ts, id)
    emits a NULL step and leaves the anchors untouched (the same
    append-only late contract as ``ewma_stream``; in-order replay
    matches the batch twin exactly — the parity test drains two
    micro-batches and compares). Each processed event emits the step
    count reached so far, so a sink sees funnel progression live."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    n_steps = len(steps)
    step_of = {s: i for i, s in enumerate(steps)}

    src = events.withWatermark("ts", watermark).select(
        F.col(key).alias("k"), "event_id", "ts",
        F.col("event_type").alias("etype"),
    )

    def update(kt, pdfs, state):
        import pandas as pd

        if state.exists:
            stored = state.get
            anchors = list(stored[:n_steps])
            last_us, last_id = stored[n_steps], stored[n_steps + 1]
        else:
            anchors = [-1] * n_steps
            last_us, last_id = -(1 << 62), -(1 << 62)
        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            yield pd.DataFrame(
                columns=["k", "event_id", "ts", "etype", "funnel_step"])
            return
        batch = pd.concat(batches, ignore_index=True)
        batch["__us"] = batch["ts"].astype("datetime64[us]").astype("int64")
        batch = batch.sort_values(["__us", "event_id"], kind="mergesort")
        out = []
        for us, eid, et in zip(batch["__us"], batch["event_id"], batch["etype"]):
            if us < last_us or (us == last_us and eid <= last_id):
                out.append(None)          # late beyond state: see docstring
                continue
            last_us, last_id = us, eid
            i = step_of.get(et)
            if i is not None and anchors[i] < 0 and (
                i == 0 or (anchors[i - 1] >= 0 and us > anchors[i - 1])
            ):
                anchors[i] = us
            out.append(sum(1 for a in anchors if a >= 0))
        batch["funnel_step"] = pd.array(out, dtype="Int32")
        state.update((*[int(a) for a in anchors], int(last_us), int(last_id)))
        yield batch.drop(columns=["__us"])

    anchor_fields = ", ".join(f"a{i} bigint" for i in range(n_steps))
    out = src.groupBy("k").applyInPandasWithState(
        update,
        outputStructType=(
            "k bigint, event_id bigint, ts timestamp, etype string, "
            "funnel_step int"
        ),
        stateStructType=f"{anchor_fields}, last_us bigint, last_id bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(
        F.col("k").alias(key), "event_id", "ts",
        F.col("etype").alias("event_type"), "funnel_step",
    )


def psi_report(
    spark,
    store_dir: str,
    reference_counts: DataFrame,
    group_col: str = "event_type",
    bucket_col: str = "b",
    count_col: str = "n",
    smoothing: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Drift observability over a continuously maintained store: PSI of
    the LIVE bucket counts (an `incremental_agg_sink` store keyed on
    (group, bucket) with a count aggregate — exact after any number of
    micro-batches, so stream maintenance ≡ batch recount by
    construction) against a FIXED reference histogram. Laplace
    smoothing keeps empty buckets finite; the union of both sides'
    buckets forms the grid so a bucket seen by only one side still
    contributes. ln() rounds to ``round_to`` before the sum (the BM25
    transcendental convention). Both inputs are bucket-grid-sized —
    the corpus never re-shuffles at report time."""
    live = read_store(spark, store_dir).select(
        F.col(group_col).alias("g"), F.col(bucket_col).alias("b"),
        F.col(count_col).alias("n_live"),
    )
    ref = reference_counts.select(
        F.col(group_col).alias("g"), F.col(bucket_col).alias("b"),
        F.col(count_col).alias("n_ref"),
    )
    grid = (
        live.select("g", "b").unionByName(ref.select("g", "b")).distinct()
        .join(live, ["g", "b"], "left")
        .join(ref, ["g", "b"], "left")
        .fillna(0, subset=["n_live", "n_ref"])
    )
    from pyspark.sql import Window

    w = Window.partitionBy("g")
    q = 10 ** round_to
    n_buckets = F.count(F.lit(1)).over(w).cast("double")
    probs = grid.select(
        "g", "b",
        ((F.col("n_ref") + F.lit(smoothing))
         / (F.sum("n_ref").over(w) + F.lit(smoothing) * n_buckets)
         ).alias("p_ref"),
        ((F.col("n_live") + F.lit(smoothing))
         / (F.sum("n_live").over(w) + F.lit(smoothing) * n_buckets)
         ).alias("p_live"),
    )
    term = (F.col("p_live") - F.col("p_ref")) * (
        F.floor(F.log(F.col("p_live") / F.col("p_ref")) * q + F.lit(0.5)) / q
    )
    return probs.groupBy(F.col("g").alias(group_col)).agg(
        (F.floor(F.sum(term) * q + F.lit(0.5)) / q).alias("psi")
    )
