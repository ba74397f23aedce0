"""Streaming/batch parity: each streaming operator drained with
Trigger.AvailableNow must match its batch twin over the same events data."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """events.parquet staged into a directory (file-stream sources read
    directories)."""
    d = tmp_path_factory.mktemp("events_src")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-0.parquet")
    return str(d)


def _batch_events(spark):
    from impc_etl_spark.queries import _events

    return _events(spark, SF_SMOKE)


def test_windowed_counts_matches_batch(spark, events_dir, tmp_path):
    from impc_etl_spark.streaming.jobs import (
        read_event_stream, run_available_now, windowed_counts,
    )

    stream = windowed_counts(read_event_stream(spark, events_dir))
    run_available_now(stream, "wc", str(tmp_path / "ckpt"))
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.table("wc").collect()
    }

    batch = (
        _batch_events(spark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_session_counts_matches_batch(spark, events_dir, tmp_path):
    from impc_etl_spark.streaming.jobs import (
        read_event_stream, run_available_now, session_counts,
    )

    # Session-window streaming aggregation only supports append mode, which
    # emits a session once the watermark passes its end; with a 0s watermark
    # every session ending before the stream's max timestamp is finalized.
    stream = session_counts(read_event_stream(spark, events_dir), watermark="0 seconds")
    run_available_now(stream, "sc", str(tmp_path / "ckpt"), output_mode="append")
    got = {
        (r["session_start"], r["user_id"]): r["n_events"]
        for r in spark.table("sc").collect()
    }

    batch = (
        _batch_events(spark)
        .groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    max_ts = _batch_events(spark).agg(F.max("ts")).collect()[0][0]
    want_all = {}
    want_final = {}
    for r in batch.collect():
        want_all[(r["session_start"], r["user_id"])] = r["n_events"]
        if r["session_end"] < max_ts:
            want_final[(r["session_start"], r["user_id"])] = r["n_events"]
    # every emitted session matches batch; every finalized session emitted
    assert len(got) > 0
    assert all(want_all.get(k) == v for k, v in got.items())
    assert all(k in got for k in want_final)


def test_stateful_user_totals_matches_batch(spark, events_dir, tmp_path):
    from impc_etl_spark.streaming.jobs import (
        read_event_stream, run_available_now, stateful_user_totals,
    )

    stream = stateful_user_totals(read_event_stream(spark, events_dir))
    run_available_now(stream, "ut", str(tmp_path / "ckpt"))
    # One update row per user per micro-batch; keep the final state per user.
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.table("ut").collect()
    }

    batch = _batch_events(spark).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("t")
    )
    want = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_interval_join_matches_batch(spark, events_dir, tmp_path):
    from impc_etl_spark.streaming.jobs import (
        interval_join, read_event_stream, run_available_now,
    )

    src = read_event_stream(spark, events_dir)
    stream = interval_join(
        src.where(F.col("event_type") == "purchase"),
        src.where(F.col("event_type") == "click"),
    )
    run_available_now(stream, "ij", str(tmp_path / "ckpt"), output_mode="append")
    got = {
        (r["purchase_id"], r["click_id"]) for r in spark.table("ij").collect()
    }

    ev = _batch_events(spark)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            F.expr(
                "p_user = c_user AND c_ts >= p_ts - INTERVAL 30 minutes AND c_ts <= p_ts"
            ),
        ).collect()
    }
    assert got == want and len(got) > 0
