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


def test_stateful_totals_accumulate_across_micro_batches(spark, tmp_path):
    """Split the source into two files and force one file per trigger: the
    applyInPandasWithState accumulator must carry state across the
    micro-batch boundary (final per-user totals == whole-table batch agg)."""
    from impc_etl_spark.queries import _events
    from impc_etl_spark.streaming.jobs import (
        read_event_stream, run_available_now, stateful_user_totals,
    )

    ev = _events(spark, SF_SMOKE)
    half_a = ev.where(F.col("event_id") % 2 == 0)
    half_b = ev.where(F.col("event_id") % 2 == 1)
    src = tmp_path / "split_src"
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    raw.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(src / "a"))
    raw.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(src / "b"))
    import glob as g
    import shutil
    flat = tmp_path / "flat_src"
    flat.mkdir()
    for i, f in enumerate(sorted(g.glob(str(src / "*" / "part-*.parquet")))):
        shutil.copy(f, flat / f"f{i}.parquet")

    stream = stateful_user_totals(
        read_event_stream(spark, str(flat), max_files_per_trigger=1)
    )
    run_available_now(stream, "ut2", str(tmp_path / "ckpt"))
    rows = spark.table("ut2").collect()
    # update mode emits one row per user per batch it appears in; the LAST
    # emission per user carries the accumulated total. Users in both halves
    # must have 2 emissions (proves >1 micro-batch ran).
    per_user = {}
    emissions = {}
    for r in rows:
        per_user[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
        emissions[r["user_id"]] = emissions.get(r["user_id"], 0) + 1
    # final-state extraction: take max n_events per user (monotone counter)
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))

    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
    want = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in batch.collect()}
    assert final == want
    both = {r["user_id"] for r in half_a.select("user_id").distinct().collect()} & {
        r["user_id"] for r in half_b.select("user_id").distinct().collect()}
    assert both and all(emissions[u] == 2 for u in both)


def test_dedup_stream_drops_replayed_batch(spark, tmp_path):
    """Duplicate the whole source file: streaming dedup must emit each
    event_id once (the replayed copies arrive within the watermark)."""
    import shutil

    from impc_etl_spark.streaming.jobs import (
        dedup_stream, read_event_stream, run_available_now,
    )

    d = tmp_path / "dup_src"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "b.parquet")

    stream = dedup_stream(read_event_stream(spark, str(d)))
    run_available_now(stream, "dd", str(tmp_path / "ckpt"), output_mode="append")
    got = spark.table("dd").count()
    want = _batch_events(spark).select("event_id").distinct().count()
    assert got == want


def test_enrich_stream_matches_batch_join(spark, events_dir, tmp_path):
    from impc_etl_spark.streaming.jobs import (
        enrich_stream, read_event_stream, run_available_now,
    )

    dim = spark.createDataFrame(
        [(i, f"seg_{i % 3}") for i in range(50)], "user_id long, segment string"
    )
    stream = enrich_stream(read_event_stream(spark, events_dir), dim)
    run_available_now(stream, "enriched", str(tmp_path / "ckpt"), output_mode="append")
    got = spark.table("enriched")
    batch = _batch_events(spark).join(dim, "user_id", "left")
    assert got.count() == batch.count()
    g = {(r.event_id, r.segment) for r in got.select("event_id", "segment").collect()}
    b = {(r.event_id, r.segment) for r in batch.select("event_id", "segment").collect()}
    assert g == b


def test_upsert_sink_merges_waves_latest_wins(spark, tmp_path):
    """foreachBatch upsert: two update waves streamed as separate
    micro-batches land in a keyed parquet store with MERGE semantics —
    overlapping keys take the newer wave's row, and an in-batch duplicate
    is collapsed to its latest event before merging."""
    import time as _time

    from impc_etl_spark.streaming.jobs import upsert_sink

    src = tmp_path / "src"
    src.mkdir()
    wave1 = spark.createDataFrame(
        [(k, "old", 100) for k in range(1, 101)], "k long, v string, ts long"
    )
    wave1.coalesce(1).write.parquet(str(tmp_path / "w1"))
    import shutil as _sh

    for f in (tmp_path / "w1").glob("*.parquet"):
        _sh.copy(f, src / "wave1.parquet")
    _time.sleep(1.1)  # file-stream batches follow modification-time order
    # wave2 overlaps keys 51..150 and carries an in-batch duplicate for 60
    wave2 = spark.createDataFrame(
        [(k, "new", 200) for k in range(51, 151)] + [(60, "newest", 300)],
        "k long, v string, ts long",
    )
    wave2.coalesce(1).write.parquet(str(tmp_path / "w2"))
    for f in (tmp_path / "w2").glob("*.parquet"):
        _sh.copy(f, src / "wave2.parquet")

    stream = (
        spark.readStream.schema("k long, v string, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "store")
    upsert_sink(
        stream, store, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"),
        dedup_order=["ts"],
    )

    from impc_etl_spark.streaming.jobs import current_store_path, read_store

    got = {r["k"]: (r["v"], r["ts"]) for r in read_store(spark, store).collect()}
    assert len(got) == 150
    assert got[1] == ("old", 100)          # untouched by wave2
    assert got[51] == ("new", 200)         # overlapped: newer wave wins
    assert got[60] == ("newest", 300)      # in-batch dup: latest ts wins
    assert got[150] == ("new", 200)        # pure insert

    # versioned commit: _CURRENT points at the last batch's dir, and older
    # versions beyond the previous one are GC'd (crash mid-write can never
    # clobber a committed version — each batch writes a NEW directory)
    import os

    cur = current_store_path(store)
    assert cur is not None and os.path.basename(cur).startswith("v")
    versions = [d for d in os.listdir(store) if d.startswith("v")]
    assert os.path.basename(cur) in versions and len(versions) <= 2


def test_upsert_sink_cdc_mode_applies_deletes_across_batches(spark, tmp_path):
    """CDC-mode upsert sink: micro-batches carry U/D ops — a delete in a
    later batch removes a key committed by an earlier batch, in-batch
    latest op wins, and a delete-then-reinsert sequence across batches
    resurrects the key."""
    import shutil as _sh
    import time as _time

    from impc_etl_spark.streaming.jobs import read_store, upsert_sink

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: insert keys 1..5; key 4 has U then D in-batch (D latest)
    wave1 = spark.createDataFrame(
        [(k, f"v{k}", 100, "U") for k in range(1, 6)]
        + [(4, "dead", 150, "D")],
        "k long, v string, ts long, op string",
    )
    wave1.coalesce(1).write.parquet(str(tmp_path / "w1"))
    for f in (tmp_path / "w1").glob("*.parquet"):
        _sh.copy(f, src / "wave1.parquet")
    _time.sleep(1.1)
    # batch 2: delete key 2, update key 3, re-insert key 4
    wave2 = spark.createDataFrame(
        [(2, None, 200, "D"), (3, "updated", 200, "U"), (4, "back", 200, "U")],
        "k long, v string, ts long, op string",
    )
    wave2.coalesce(1).write.parquet(str(tmp_path / "w2"))
    for f in (tmp_path / "w2").glob("*.parquet"):
        _sh.copy(f, src / "wave2.parquet")

    stream = (
        spark.readStream.schema("k long, v string, ts long, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "store")
    upsert_sink(
        stream, store, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt"),
        dedup_order=["ts"], op_col="op",
    )

    got = {r["k"]: r["v"] for r in read_store(spark, store).collect()}
    assert got == {1: "v1", 3: "updated", 4: "back", 5: "v5"}
    assert "op" not in read_store(spark, store).columns


def test_upsert_sink_cdc_mode_requires_dedup_order(spark, tmp_path):
    import pytest

    from impc_etl_spark.streaming.jobs import upsert_sink

    (tmp_path / "empty_src").mkdir()
    stream = (
        spark.readStream.schema("k long, op string")
        .parquet(str(tmp_path / "empty_src"))
    )
    with pytest.raises(ValueError, match="requires dedup_order"):
        upsert_sink(
            stream, str(tmp_path / "s"), ["k"],
            checkpoint_dir=str(tmp_path / "c"), op_col="op",
        )


def test_scd2_sink_maintains_dimension_across_batches(spark, tmp_path):
    """Streaming SCD2 maintenance: batch 1 seeds history (in-batch change
    included); batch 2 closes an open version, collapses a no-change
    event, inserts a brand-new key, and drops a late event older than the
    open version."""
    import shutil as _sh
    import time as _time

    from impc_etl_spark.streaming.jobs import read_store, scd2_sink

    src = tmp_path / "src"
    src.mkdir()
    # wave 1: key 1 goes A(10)->B(20); key 2 stays X(15)
    w1 = spark.createDataFrame(
        [(1, 10, "A", 1), (1, 20, "B", 2), (2, 15, "X", 3)],
        "k long, ts long, status string, seq long",
    )
    w1.coalesce(1).write.parquet(str(tmp_path / "w1"))
    for f in (tmp_path / "w1").glob("*.parquet"):
        _sh.copy(f, src / "wave1.parquet")
    _time.sleep(1.1)
    # wave 2: key 1 changes to C(30); key 2 no-change X(25) collapses;
    # key 3 is new; key 1 late event (ts=5 < open valid_from 20) dropped
    w2 = spark.createDataFrame(
        [(1, 30, "C", 4), (2, 25, "X", 5), (3, 40, "Z", 6), (1, 5, "LATE", 7)],
        "k long, ts long, status string, seq long",
    )
    w2.coalesce(1).write.parquet(str(tmp_path / "w2"))
    for f in (tmp_path / "w2").glob("*.parquet"):
        _sh.copy(f, src / "wave2.parquet")

    stream = (
        spark.readStream.schema("k long, ts long, status string, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "scd2_store")
    scd2_sink(
        stream, store, keys=["k"], ts_col="ts", attr_cols=["status"],
        checkpoint_dir=str(tmp_path / "ckpt"), tiebreak_cols=["seq"],
    )

    rows = {
        (r["k"], r["valid_from"]): (r["status"], r["valid_to"], r["is_current"])
        for r in read_store(spark, store).collect()
    }
    assert rows == {
        (1, 10): ("A", 20, False),
        (1, 20): ("B", 30, False),
        (1, 30): ("C", None, True),
        (2, 15): ("X", None, True),   # no-change event collapsed
        (3, 40): ("Z", None, True),
    }


def test_dedup_ingest_sink_builds_clean_store(spark, tmp_path):
    """Continuous corpus ingestion: two document waves; wave 2 repeats a
    wave-1 doc verbatim (exact dup), near-duplicates another, and brings
    one novel doc — the store ends with wave 1 + only the novel doc."""
    import shutil as _sh
    import time as _time

    from impc_etl_spark.streaming.jobs import dedup_ingest_sink, read_store

    src = tmp_path / "src"
    src.mkdir()
    base = "the quick brown fox jumps over the lazy dog again and again"
    wave1 = spark.createDataFrame(
        [(1, base), (2, "an unrelated first-wave document about spark plans"),
         (2, "an unrelated first-wave document about spark plans")],  # in-batch dup
        "doc_id long, text string",
    )
    wave1.coalesce(1).write.parquet(str(tmp_path / "w1"))
    for f in (tmp_path / "w1").glob("*.parquet"):
        _sh.copy(f, src / "wave1.parquet")
    _time.sleep(1.1)
    wave2 = spark.createDataFrame(
        [(10, base),                                  # exact dup of doc 1
         (11, base + " with a small extra tail"),     # near dup of doc 1
         (12, "a genuinely novel second-wave document about something else")],
        "doc_id long, text string",
    )
    wave2.coalesce(1).write.parquet(str(tmp_path / "w2"))
    for f in (tmp_path / "w2").glob("*.parquet"):
        _sh.copy(f, src / "wave2.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = str(tmp_path / "store")
    dedup_ingest_sink(
        stream, store, checkpoint_dir=str(tmp_path / "ckpt"),
        near=True, threshold=0.5,
    )
    got = sorted(r["doc_id"] for r in read_store(spark, store).collect())
    assert got == [1, 2, 12]  # in-batch dup collapsed; 10 exact-, 11 near-dropped


def test_asof_join_stream_matches_batch_asof(spark, events_dir, tmp_path):
    """Single availableNow drain == the batch asof_join twin on the same
    frames: nearest-prior click value per purchase, 30-minute tolerance."""
    from impc_etl_spark.operators.joins import asof_join
    from impc_etl_spark.streaming.jobs import (
        asof_join_stream, read_event_stream, run_available_now,
    )

    src = read_event_stream(spark, events_dir)
    stream = asof_join_stream(
        src.where(F.col("event_type") == "purchase"),
        src.where(F.col("event_type") == "click"),
        key="user_id", tolerance="30 minutes",
    )
    run_available_now(stream, "asof_s", str(tmp_path / "ckpt"), output_mode="append")
    got = {
        r["left_id"]: (r["matched_ts"], r["matched_value"])
        for r in spark.table("asof_s").collect()
    }

    ev = _batch_events(spark)
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("left_id"), F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_val")
    )
    want_df = asof_join(
        p, c, on=["user_id"], left_time="p_ts", right_time="c_ts",
        direction="backward",
        tolerance=F.expr("p_ts <= c_ts + INTERVAL 30 minutes"),
        tie_breakers=[F.col("__r.c_val").desc()],
        left_key=["left_id"],
    )
    want = {
        r["left_id"]: (r["c_ts"], r["c_val"]) for r in want_df.collect()
    }
    assert set(got) == set(want) and len(got) > 0
    matched = 0
    for k, (gts, gv) in got.items():
        wts, wv = want[k]
        assert gts == wts, (k, gts, wts)
        if gts is not None:
            assert abs(gv - wv) < 1e-9
            matched += 1
    assert matched > 0


def test_asof_join_stream_state_spans_micro_batches(spark, tmp_path):
    """Right event in micro-batch 1, left event in micro-batch 2: the
    match must come from state. Written as one file per batch with
    maxFilesPerTrigger=1 and ascending ts so the arrival order is fixed."""
    import pyspark.sql.functions as F2

    from impc_etl_spark.streaming.jobs import (
        asof_join_stream, read_event_stream, run_available_now,
    )

    src_dir = str(tmp_path / "src")
    b1 = spark.createDataFrame(
        [(100, 1_000_000_000, 7, "click", 2.5, "{}")],
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
    )
    b2 = spark.createDataFrame(
        [(200, 1_000_300_000, 7, "purchase", 9.9, "{}")],
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
    )
    # ts column is bigint MICROS here; read_event_stream treats bigint ts
    # as nanos (events.parquet convention) — so scale up to nanos
    b1 = b1.withColumn("ts", F2.col("ts") * 1000)
    b2 = b2.withColumn("ts", F2.col("ts") * 1000)
    b1.coalesce(1).write.parquet(src_dir + "/f1")
    b2.coalesce(1).write.parquet(src_dir + "/f2")
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    import os
    import time
    os.makedirs(flat)
    base = time.time() - 100
    for i, f in enumerate(sorted(glob.glob(src_dir + "/f*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        # FileStreamSource orders batches by modification time; pin
        # strictly increasing mtimes so click arrives before purchase
        os.utime(dst, (base + i * 10, base + i * 10))

    src = read_event_stream(spark, flat, max_files_per_trigger=1)
    stream = asof_join_stream(
        src.where(F.col("event_type") == "purchase"),
        src.where(F.col("event_type") == "click"),
        key="user_id", tolerance="30 minutes",
    )
    run_available_now(stream, "asof_mb", str(tmp_path / "ckpt2"), output_mode="append")
    rows = spark.table("asof_mb").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["left_id"] == 200 and r["matched_value"] == 2.5
    assert r["matched_ts"] is not None


def test_sketch_sink_equals_batch_sketches(spark, events_dir, tmp_path):
    """Two throttled micro-batches of sketch maintenance must produce
    EXACTLY the batch-built CMS and Bloom over the same data — sketches
    are linear, so stream merge is exact, not approximate-on-approximate."""
    from impc_etl_spark.operators.aggregate import (
        bloom_filter_build, count_min_sketch,
    )
    from impc_etl_spark.queries import _events
    from impc_etl_spark.streaming.jobs import (
        read_event_stream, read_sketch_store, sketch_sink,
    )

    # force >1 micro-batch: copy the events parquet twice into one dir
    import glob
    import os
    import shutil

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    parts = sorted(glob.glob(f"{events_dir}/*.parquet"))
    assert parts
    for i, f in enumerate(parts):
        shutil.copy(f, f"{src_dir}/{i:03d}.parquet")
    # duplicate the data as a second file (second micro-batch)
    for i, f in enumerate(parts):
        shutil.copy(f, f"{src_dir}/dup-{i:03d}.parquet")

    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    store = str(tmp_path / "sketches")
    sketch_sink(stream, store, str(tmp_path / "ckpt"), "user_id",
                depth=4, width=64, num_hashes=3, num_bits=512)

    cms_s, bloom_s = read_sketch_store(spark, store)
    got_cms = {(r["r"], r["c"]): r["n"] for r in cms_s.collect()}
    got_bloom = {r["bit"] for r in bloom_s.collect()}

    whole = _events(spark, "/root/testdata/sf0.001").unionAll(
        _events(spark, "/root/testdata/sf0.001")
    )
    want_cms = {(r["r"], r["c"]): r["n"] for r in
                count_min_sketch(whole, "user_id", depth=4, width=64).collect()}
    want_bloom = {r["bit"] for r in
                  bloom_filter_build(whole, "user_id", num_hashes=3,
                                     num_bits=512).collect()}
    assert got_cms == want_cms
    assert got_bloom == want_bloom


def test_incremental_agg_sink_equals_batch_aggregate(spark, tmp_path):
    """Two throttled micro-batches of materialized-aggregate maintenance
    equal the whole-table batch aggregate (algebraic merge is exact)."""
    import glob as g
    import shutil

    from impc_etl_spark.queries import _events
    from impc_etl_spark.streaming.jobs import (
        incremental_agg_sink, read_event_stream, read_store,
    )

    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    src = tmp_path / "agg_src"
    raw.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(src / "a"))
    raw.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(src / "b"))
    flat = tmp_path / "agg_flat"
    flat.mkdir()
    for i, f in enumerate(sorted(g.glob(str(src / "*" / "part-*.parquet")))):
        shutil.copy(f, flat / f"f{i}.parquet")

    store = str(tmp_path / "agg_store")
    incremental_agg_sink(
        read_event_stream(spark, str(flat), max_files_per_trigger=1),
        store, str(tmp_path / "agg_ckpt"),
        keys=["user_id", "event_type"],
        aggs={
            "n_events": ("count", "event_id"),
            "sum_value": ("sum", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
    )
    got = {
        (r["user_id"], r["event_type"]):
            (r["n_events"], round(r["sum_value"], 6),
             round(r["min_value"], 6), round(r["max_value"], 6))
        for r in read_store(spark, store).collect()
    }
    want = {
        (r["user_id"], r["event_type"]):
            (r["n"], round(r["s"], 6), round(r["mn"], 6), round(r["mx"], 6))
        for r in _events(spark, SF_SMOKE).groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"),
            F.min("value").alias("mn"), F.max("value").alias("mx"),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_additive_sinks_skip_replayed_batch(spark, tmp_path):
    """At-least-once replay protection: a sketch store whose committed
    version already carries the replayed batch id must be left untouched
    (sum-merges are additive — re-merging would double-count)."""
    from impc_etl_spark.streaming.jobs import (
        _batch_already_committed, current_store_path,
    )

    assert not _batch_already_committed(None, 0)
    assert _batch_already_committed("/store/v7", 7)
    assert not _batch_already_committed("/store/v7", 8)

    # end-to-end: drain the same source twice against the SAME checkpoint —
    # the second run has no new files, so the store must be unchanged
    import shutil

    from impc_etl_spark.streaming.jobs import (
        read_event_stream, read_sketch_store, sketch_sink,
    )

    src = tmp_path / "replay_src"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "f0.parquet")
    store, ckpt = str(tmp_path / "replay_store"), str(tmp_path / "replay_ckpt")
    sketch_sink(read_event_stream(spark, str(src)), store, ckpt, "user_id",
                depth=2, width=32, num_hashes=2, num_bits=128)
    cms1, bloom1 = read_sketch_store(spark, store)
    snap = sorted(map(tuple, cms1.collect())), sorted(map(tuple, bloom1.collect()))
    sketch_sink(read_event_stream(spark, str(src)), store, ckpt, "user_id",
                depth=2, width=32, num_hashes=2, num_bits=128)
    cms2, bloom2 = read_sketch_store(spark, store)
    assert (sorted(map(tuple, cms2.collect())),
            sorted(map(tuple, bloom2.collect()))) == snap


def test_asof_join_stream_late_left_within_watermark_matches(spark, tmp_path):
    """Regression (r3 advice): a left arriving in a LATER micro-batch more
    than `tolerance` behind its key's newest event — but inside the
    watermark — must still match its nearest-prior right. The old
    eviction horizon (per-key max event time - tolerance) dropped the
    candidate right; the watermark-based horizon keeps it.

    Timeline (seconds): clicks at 13000 and 20000 land in batch 1; the
    purchase at 13500 lands in batch 2. After batch 1 the watermark is
    20000 - 7200 = 12800, so the 13500 purchase is admissible, sits 6500s
    (> 30 min tolerance) behind the key's max, and must match the 13000
    click."""
    import glob
    import os
    import shutil
    import time

    import pyspark.sql.functions as F2

    from impc_etl_spark.streaming.jobs import (
        asof_join_stream, read_event_stream, run_available_now,
    )

    schema = ("event_id bigint, ts bigint, user_id bigint, "
              "event_type string, value double, props string")
    b1 = spark.createDataFrame(
        [(100, 13_000, 7, "click", 2.5, "{}"),
         (101, 20_000, 7, "click", 9.0, "{}")], schema,
    ).withColumn("ts", F2.col("ts") * F2.lit(1_000_000_000))  # sec → ns
    b2 = spark.createDataFrame(
        [(200, 13_500, 7, "purchase", 1.0, "{}")], schema,
    ).withColumn("ts", F2.col("ts") * F2.lit(1_000_000_000))

    src = str(tmp_path / "late_src")
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")
    flat = str(tmp_path / "late_flat")
    os.makedirs(flat)
    base = time.time() - 100
    for i, f in enumerate(sorted(glob.glob(src + "/f*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))  # fix arrival order

    es = read_event_stream(spark, flat, max_files_per_trigger=1)
    stream = asof_join_stream(
        es.where(F.col("event_type") == "purchase"),
        es.where(F.col("event_type") == "click"),
        key="user_id", tolerance="30 minutes", watermark="2 hours",
    )
    run_available_now(stream, "asof_late", str(tmp_path / "ckpt"),
                      output_mode="append")
    rows = spark.table("asof_late").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["left_id"] == 200
    assert r["matched_value"] == 2.5           # the 13000s click, not null
    assert r["matched_ts"] is not None


def test_upsert_sink_crash_after_flip_replay_is_skipped(spark, tmp_path):
    """Batch-id collision safety: after wiping the checkpoint, a fresh
    query re-delivers the source as batch 0 while the store pointer
    already names v0. The new query id means this is NOT treated as a
    replay — the sink re-merges (idempotent for key-replace) into a
    SUFFIXED version dir, never reading and overwriting the same
    directory, and the store ends byte-identical. (The true same-query
    crash-after-flip skip is unit-tested in
    test_replay_guard_distinguishes_query_identity — Spark's commit-log
    validation prevents simulating it end-to-end.)"""
    import shutil

    from impc_etl_spark.streaming.jobs import read_store, upsert_sink

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(k, f"v{k}", 100) for k in range(1, 21)], "k long, v string, ts long"
    ).coalesce(1).write.parquet(str(tmp_path / "w"))
    for f in (tmp_path / "w").glob("*.parquet"):
        shutil.copy(f, src / "wave.parquet")

    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    def run():
        upsert_sink(
            spark.readStream.schema("k long, v string, ts long").parquet(str(src)),
            store, keys=["k"], checkpoint_dir=ckpt, dedup_order=["ts"],
        )

    run()
    before = sorted(map(tuple, read_store(spark, store).collect()))
    assert len(before) == 20

    # simulate crash AFTER the pointer flip but BEFORE the checkpoint
    # commit: wipe the checkpoint so restart re-delivers batch 0
    shutil.rmtree(ckpt)
    run()  # replays batch 0 with the same id — must skip, not self-overwrite
    after = sorted(map(tuple, read_store(spark, store).collect()))
    assert after == before


def test_dedup_ingest_sink_crash_after_flip_replay_is_skipped(spark, tmp_path):
    """Same batch-id-collision simulation for the dedup ingest sink: the
    re-delivered batch must leave the committed store byte-identical (the
    store-probe dedup drops every re-seen document; no self-overwrite)."""
    import shutil

    from impc_etl_spark.streaming.jobs import dedup_ingest_sink, read_store

    src = tmp_path / "dsrc"
    src.mkdir()
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(tmp_path / "dw"))
    for f in (tmp_path / "dw").glob("*.parquet"):
        shutil.copy(f, src / "docs.parquet")

    store, ckpt = str(tmp_path / "dstore"), str(tmp_path / "dckpt")

    def run():
        dedup_ingest_sink(
            spark.readStream.schema("doc_id long, text string").parquet(str(src)),
            store, checkpoint_dir=ckpt,
        )

    run()
    before = sorted(r["doc_id"] for r in read_store(spark, store).collect())
    assert before == [1, 2]  # in-batch exact dup (3) collapsed

    shutil.rmtree(ckpt)
    run()
    after = sorted(r["doc_id"] for r in read_store(spark, store).collect())
    assert after == before


def test_ewma_stream_matches_batch_and_drops_late(spark, tmp_path):
    """In-order two-batch drain of the streaming EWMA equals the batch
    timeseries.ewma twin bit-for-bit; an event arriving in a later batch
    with ts behind its key's last processed event emits a NULL ewma
    (append-only late contract) without disturbing the live recurrence."""
    import glob
    import os
    import shutil
    import time

    import pyspark.sql.functions as F2

    from impc_etl_spark.operators.timeseries import ewma
    from impc_etl_spark.streaming.jobs import (
        ewma_stream, read_event_stream, run_available_now,
    )

    schema = ("event_id bigint, ts bigint, user_id bigint, "
              "event_type string, value double, props string")
    b1 = spark.createDataFrame(
        [(1, 100, 7, "m", 2.0, "{}"),
         (2, 200, 7, "m", 4.0, "{}"),
         (3, 100, 8, "m", 10.0, "{}")], schema,
    ).withColumn("ts", F2.col("ts") * F2.lit(1_000_000_000))
    b2 = spark.createDataFrame(
        [(4, 300, 7, "m", 8.0, "{}"),
         (5, 150, 7, "m", 99.0, "{}"),   # LATE: behind key 7's last (200)
         (6, 400, 8, "m", 20.0, "{}")], schema,
    ).withColumn("ts", F2.col("ts") * F2.lit(1_000_000_000))

    src = str(tmp_path / "esrc")
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")
    flat = str(tmp_path / "eflat")
    os.makedirs(flat)
    base = time.time() - 100
    for i, f in enumerate(sorted(glob.glob(src + "/f*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))

    stream = ewma_stream(read_event_stream(spark, flat, max_files_per_trigger=1),
                         alpha=0.3)
    run_available_now(stream, "ewma_s", str(tmp_path / "eckpt"),
                      output_mode="append")
    got = {r["event_id"]: r["ewma"] for r in spark.table("ewma_s").collect()}
    assert len(got) == 6
    assert got[5] is None                      # late event: dropped, not folded

    # batch twin over the SAME in-order events (late one excluded)
    all_ev = spark.read.parquet(flat).where(F2.col("event_id") != 5).select(
        "event_id", "user_id",
        F2.expr("timestamp_micros(ts div 1000)").alias("ts"), "value",
    )
    want = {r["event_id"]: r["ewma"]
            for r in ewma(all_ev, ["user_id"], "ts", "value", alpha=0.3,
                          tiebreak_cols=["event_id"]).collect()}
    for eid, v in want.items():
        assert got[eid] == v, (eid, got[eid], v)  # bit-exact parity


def test_fresh_checkpoint_over_existing_store_is_not_mistaken_for_replay(
    spark, tmp_path
):
    """A NEW streaming query (fresh checkpoint → new query id) started
    over an existing store delivers everything as batch 0 — the replay
    guard must see the different query id and MERGE, not skip (skipping
    silently loses the new data); the commit lands in a suffixed version
    dir so the merge never overwrites what it reads."""
    import os
    import shutil

    from impc_etl_spark.streaming.jobs import current_store_path, read_store, upsert_sink

    src = tmp_path / "fsrc"
    src.mkdir()
    store = str(tmp_path / "fstore")

    def add_wave(name, lo, hi, ts):
        spark.createDataFrame(
            [(k, f"w{ts}", ts) for k in range(lo, hi)],
            "k long, v string, ts long",
        ).coalesce(1).write.parquet(str(tmp_path / name))
        for f in (tmp_path / name).glob("*.parquet"):
            shutil.copy(f, src / f"{name}.parquet")

    add_wave("w1", 0, 10, 100)
    upsert_sink(
        spark.readStream.schema("k long, v string, ts long").parquet(str(src)),
        store, keys=["k"], checkpoint_dir=str(tmp_path / "ckptA"),
        dedup_order=["ts"],
    )
    assert read_store(spark, store).count() == 10

    # new data arrives; the query restarts with a FRESH checkpoint (new id)
    add_wave("w2", 10, 25, 200)
    upsert_sink(
        spark.readStream.schema("k long, v string, ts long").parquet(str(src)),
        store, keys=["k"], checkpoint_dir=str(tmp_path / "ckptB"),
        dedup_order=["ts"],
    )
    got = {r["k"] for r in read_store(spark, store).collect()}
    assert got == set(range(25))            # new keys merged, none lost
    cur = os.path.basename(current_store_path(store))
    assert cur.startswith("v0") and cur != "v0"   # suffixed, no self-overwrite


def test_ewma_stream_tie_on_last_processed_ts_is_dropped(spark, tmp_path):
    """Cross-batch event-time TIE with the last processed event: an id
    that would sort BEFORE the processed one in the batch twin's
    (ts, event_id) order is dropped (NULL), while a tie sorting AFTER is
    folded — keeping stream output a prefix-consistent subset of the
    batch recurrence."""
    import glob
    import os
    import shutil
    import time

    import pyspark.sql.functions as F2
    import pytest as _pytest

    from impc_etl_spark.streaming.jobs import (
        ewma_stream, read_event_stream, run_available_now,
    )

    schema = ("event_id bigint, ts bigint, user_id bigint, "
              "event_type string, value double, props string")
    b1 = spark.createDataFrame(
        [(10, 100, 7, "m", 2.0, "{}")], schema,
    ).withColumn("ts", F2.col("ts") * F2.lit(1_000_000_000))
    b2 = spark.createDataFrame(
        [(9, 100, 7, "m", 50.0, "{}"),    # tie, id before → dropped
         (11, 100, 7, "m", 4.0, "{}")], schema,  # tie, id after → folded
    ).withColumn("ts", F2.col("ts") * F2.lit(1_000_000_000))
    src = str(tmp_path / "tsrc")
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")
    flat = str(tmp_path / "tflat")
    os.makedirs(flat)
    base = time.time() - 100
    for i, f in enumerate(sorted(glob.glob(src + "/f*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))

    stream = ewma_stream(read_event_stream(spark, flat, max_files_per_trigger=1),
                         alpha=0.3)
    run_available_now(stream, "ewma_tie", str(tmp_path / "tckpt"),
                      output_mode="append")
    got = {r["event_id"]: r["ewma"] for r in spark.table("ewma_tie").collect()}
    assert got[10] == 2.0
    assert got[9] is None
    assert got[11] == 0.3 * 4.0 + (1.0 - 0.3) * 2.0

    with _pytest.raises(ValueError, match="alpha"):
        ewma_stream(read_event_stream(spark, flat), alpha=0.0)


def test_replay_guard_distinguishes_query_identity(tmp_path):
    """Unit contract of _batch_already_committed: same (query id, batch
    id) → replay (skip); different query id or batch id → not a replay;
    missing metadata falls back to the basename heuristic."""
    import json
    import os

    from impc_etl_spark.streaming.jobs import _batch_already_committed

    store = tmp_path / "g"
    v0 = store / "v0"
    v0.mkdir(parents=True)
    ckA = tmp_path / "ckA"; ckA.mkdir()
    ckB = tmp_path / "ckB"; ckB.mkdir()
    (ckA / "metadata").write_text(json.dumps({"id": "qA"}))
    (ckB / "metadata").write_text(json.dumps({"id": "qB"}))

    # legacy store (no marker): basename heuristic
    assert _batch_already_committed(str(v0), 0, str(ckA))
    assert not _batch_already_committed(str(v0), 1, str(ckA))

    (v0 / "_COMMIT_META.json").write_text(
        json.dumps({"query_id": "qA", "batch_id": 0})
    )
    assert _batch_already_committed(str(v0), 0, str(ckA))       # true replay
    assert not _batch_already_committed(str(v0), 0, str(ckB))   # new query
    assert not _batch_already_committed(str(v0), 1, str(ckA))   # new batch
    assert not _batch_already_committed(None, 0, str(ckA))

    # store carries a query id but the live checkpoint's id is UNREADABLE:
    # an environment fault must abort loudly, not silently drop the batch
    import pytest

    ckBroken = tmp_path / "ckBroken"; ckBroken.mkdir()  # no metadata file
    with pytest.raises(RuntimeError, match="refusing to guess"):
        _batch_already_committed(str(v0), 0, str(ckBroken))
    # ... but with no checkpoint dir at all (caller opted out of identity
    # tracking) the conservative replay-side answer stands
    assert _batch_already_committed(str(v0), 0, None)


def test_moments_sink_matches_batch_pca(spark, tmp_path):
    """Incrementally-maintained moment statistics over micro-batches
    equal the batch moments, and a PCA fit from the streaming store
    matches the batch pca_fit (same shared eigen step): the streaming
    materialization of embedding preprocessing is exact."""
    import glob as g
    import shutil

    import numpy as np

    from impc_etl_spark.operators.similarity import (
        moment_partials, pca_fit, pca_from_moments,
    )
    from impc_etl_spark.streaming.jobs import moments_sink, read_store

    raw = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    src = tmp_path / "mom_src"
    raw.where(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(str(src / "a"))
    raw.where(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(str(src / "b"))
    flat = tmp_path / "mom_flat"
    flat.mkdir()
    for i, f in enumerate(sorted(g.glob(str(src / "*" / "part-*.parquet")))):
        shutil.copy(f, flat / f"f{i}.parquet")

    store = str(tmp_path / "mom_store")
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    moments_sink(stream, store, str(tmp_path / "mom_ckpt"), dim=64)

    rows = read_store(spark, store).collect()
    assert len(rows) == 1 and rows[0]["n"] == raw.count()
    batch = moment_partials(raw, "embedding", 64).collect()
    s_b = np.sum([np.asarray(r["s"]) for r in batch], axis=0)
    m_b = np.sum([np.asarray(r["m"]) for r in batch], axis=0)
    assert np.allclose(rows[0]["s"], s_b, rtol=0, atol=1e-9)
    assert np.allclose(rows[0]["m"], m_b, rtol=0, atol=1e-9)

    mean_s, comps_s, evals_s = pca_from_moments(rows, 64, 4)
    mean_b, comps_b, evals_b = pca_fit(raw, "embedding", k=4, dim=64)
    assert np.allclose(mean_s, mean_b, atol=1e-12)
    assert np.allclose(evals_s, evals_b, atol=1e-10)
    assert np.allclose(comps_s, comps_b, atol=1e-7)

    # replaying the last committed batch id must be a no-op (additive!)
    from impc_etl_spark.streaming.jobs import current_store_path, _version_meta
    cur = current_store_path(store)
    meta = _version_meta(cur)
    n_before = rows[0]["n"]
    # a fresh run over the same (already consumed) source adds nothing
    stream2 = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    moments_sink(stream2, store, str(tmp_path / "mom_ckpt"), dim=64)
    rows2 = read_store(spark, store).collect()
    assert len(rows2) == 1 and rows2[0]["n"] == n_before
    assert meta.get("batch_id") is not None


def test_funnel_stream_matches_batch_and_drops_late(spark, tmp_path):
    """Two-batch in-order drain of the streaming funnel reaches the same
    per-key step as the batch events_funnel twin; a late event (behind
    its key's last processed ts) emits NULL and leaves anchors alone."""
    import glob
    import os
    import shutil
    import time

    import pyspark.sql.functions as F2

    from impc_etl_spark.streaming.jobs import (
        funnel_stream, read_event_stream, run_available_now,
    )

    schema = ("event_id bigint, ts bigint, user_id bigint, "
              "event_type string, value double, props string")
    # key 7: view@100 -> click@200 -> purchase@300 (full funnel, step 3)
    # key 8: click@100 (before any view) -> view@150 -> click@150 (tie, NOT
    #        strictly after? click ts 150 == view ts 150 -> not counted)
    b1 = spark.createDataFrame(
        [(1, 100, 7, "view", 0.0, "{}"),
         (2, 200, 7, "click", 0.0, "{}"),
         (3, 100, 8, "click", 0.0, "{}"),
         (4, 150, 8, "view", 0.0, "{}"),
         (5, 150, 8, "click", 0.0, "{}")], schema,
    ).withColumn("ts", F2.col("ts") * F2.lit(1_000_000_000))
    # batch 2: key 7 completes; key 8 gets a LATE view@50 (NULL, ignored)
    # then a click@400 that NOW counts (after view anchor 150)
    b2 = spark.createDataFrame(
        [(6, 300, 7, "purchase", 0.0, "{}"),
         (7, 50, 8, "view", 0.0, "{}"),
         (8, 400, 8, "click", 0.0, "{}")], schema,
    ).withColumn("ts", F2.col("ts") * F2.lit(1_000_000_000))

    src = str(tmp_path / "fsrc")
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")
    flat = str(tmp_path / "fflat")
    os.makedirs(flat)
    base = time.time() - 100
    for i, f in enumerate(sorted(glob.glob(src + "/f*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))

    stream = funnel_stream(read_event_stream(spark, flat, max_files_per_trigger=1))
    run_available_now(stream, "funnel_s", str(tmp_path / "fckpt"),
                      output_mode="append")
    rows = spark.table("funnel_s").collect()
    by_event = {r["event_id"]: r["funnel_step"] for r in rows}
    assert by_event[1] == 1 and by_event[2] == 2      # key 7 progression
    assert by_event[6] == 3                            # full funnel
    assert by_event[3] == 0                            # click before view
    assert by_event[4] == 1                            # first view anchors
    assert by_event[5] == 1                            # tie: NOT strictly after
    assert by_event[7] is None                         # late: NULL, no rewrite
    assert by_event[8] == 2                            # click after anchor

    # final per-key step equals the batch twin over the in-order events
    # (the late event 7 is excluded from both sides' integrated history)
    final = {7: 3, 8: 2}
    last = {}
    for r in sorted(rows, key=lambda r: (r["ts"] or 0, r["event_id"])):
        if r["funnel_step"] is not None:
            last[r["user_id"]] = r["funnel_step"]
    assert last == final


def test_psi_report_over_maintained_store_matches_batch(spark, tmp_path):
    """Two micro-batches maintain the live bucket counts via
    incremental_agg_sink; psi_report over the store must equal the same
    PSI computed directly over everything ingested (the store is exact,
    so stream maintenance ≡ batch recount), and a shifted live
    distribution must score a larger PSI than an identical one."""
    import glob
    import os
    import shutil
    import time

    import pyspark.sql.functions as F2

    from impc_etl_spark.streaming.jobs import (
        incremental_agg_sink, psi_report, read_event_stream,
    )

    schema = ("event_id bigint, ts bigint, user_id bigint, "
              "event_type string, value double, props string")
    rows1 = [(i, 100 + i, 1, "m", float(i % 4), "{}") for i in range(20)]
    rows2 = [(100 + i, 200 + i, 1, "m", 3.0, "{}") for i in range(20)]  # shifted
    b1 = spark.createDataFrame(rows1, schema).withColumn(
        "ts", F2.col("ts") * F2.lit(1_000_000_000))
    b2 = spark.createDataFrame(rows2, schema).withColumn(
        "ts", F2.col("ts") * F2.lit(1_000_000_000))
    src = str(tmp_path / "psrc")
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")
    flat = str(tmp_path / "pflat")
    os.makedirs(flat)
    base = time.time() - 100
    for i, f in enumerate(sorted(glob.glob(src + "/f*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))

    bucketed = read_event_stream(spark, flat, max_files_per_trigger=1).select(
        "event_type", F2.floor(F2.col("value")).cast("int").alias("b"))
    store = str(tmp_path / "pstore")
    incremental_agg_sink(
        bucketed, store, str(tmp_path / "pckpt"),
        keys=["event_type", "b"], aggs={"n": ("count", "b")},
    )

    # uniform reference over buckets 0..3
    ref = spark.createDataFrame(
        [("m", i, 10) for i in range(4)], "event_type string, b int, n long")
    got = {r["event_type"]: r["psi"]
           for r in psi_report(spark, store, ref).collect()}

    # batch twin: same formula over ALL ingested rows
    all_rows = b1.unionByName(b2).select(
        "event_type", F2.floor(F2.col("value")).cast("int").alias("b"))
    live = all_rows.groupBy("event_type", "b").agg(F2.count(F2.lit(1)).alias("n"))
    import math
    lc = {(r["event_type"], r["b"]): r["n"] for r in live.collect()}
    rc = {("m", i): 10 for i in range(4)}
    buckets = sorted({b for _, b in set(lc) | set(rc)})
    nb = len(buckets)
    sl = sum(lc.values()) + 0.5 * nb
    sr = sum(rc.values()) + 0.5 * nb
    want = 0.0
    for b in buckets:
        pl = (lc.get(("m", b), 0) + 0.5) / sl
        pr = (rc.get(("m", b), 0) + 0.5) / sr
        want += (pl - pr) * (math.floor(math.log(pl / pr) * 1e6 + 0.5) / 1e6)
    want = math.floor(want * 1e6 + 0.5) / 1e6
    assert got["m"] == want
    assert got["m"] > 0.2  # the planted shift is flagged as drift


def test_stream_matches_batch_on_hostile_events(spark, tmp_path):
    """Stream ≡ batch parity must hold on HOSTILE input too: NULL ts rows
    are dropped at the stream source boundary (read_event_stream) exactly
    as the batch twins' explicit guard drops them (r7 hardening) — a
    windowed aggregation over events with planted NULL ts / NULL value
    agrees between the drained stream and the guarded batch plan."""
    import shutil as sh

    from examples.hostile_parity import build_hostile
    from impc_etl_spark.streaming.jobs import (
        read_event_stream, run_available_now, windowed_counts,
    )

    hostile = tmp_path / "hostile"
    build_hostile(SF_SMOKE, str(hostile))
    src = tmp_path / "events_src"
    src.mkdir()
    sh.copy(hostile / "events.parquet", src / "part-0.parquet")

    stream = windowed_counts(read_event_stream(spark, str(src)))
    run_available_now(stream, "wc_hostile", str(tmp_path / "ckpt"))
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"],
                                               round(r["sum_value"] or 0.0, 6))
        for r in spark.table("wc_hostile").collect()
    }

    from impc_etl_spark.queries import _events

    batch = (
        _events(spark, str(hostile))
        .where(F.col("ts").isNotNull())
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             # nanvl mirrors the job's NaN-as-NULL bad-point contract
             F.sum(F.nanvl(F.col("value"), F.lit(None).cast("double")))
             .alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"],
                                               round(r["sum_value"] or 0.0, 6))
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_interval_join_left_outer_emits_unmatched_on_watermark(spark, tmp_path):
    """how='left_outer': an unmatched purchase must surface ONCE with NULL
    click columns — but only after the watermark proves no matching click
    can still arrive. Batch 1 carries a matched purchase (user 8) and an
    unmatched one (user 7); batch 2 is a far-future click by an unrelated
    user that pushes the watermark past user 7's match window."""
    import glob
    import os
    import shutil
    import time

    import pyspark.sql.functions as F2

    from impc_etl_spark.streaming.jobs import (
        interval_join, read_event_stream, run_available_now,
    )

    t0 = 1_000_000_000_000_000  # µs epoch
    mins = 60 * 1_000_000
    b1 = spark.createDataFrame(
        [
            (1, t0, 7, "purchase", 5.0, "{}"),              # no click: organic
            (2, t0 - 10 * mins, 8, "click", 1.0, "{}"),
            (3, t0, 8, "purchase", 9.0, "{}"),              # attributed
        ],
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
    )
    # two watermark pushers: the first advances the watermark PAST user
    # 7's match window; eviction happens at the start of the NEXT batch
    # (watermark used by batch N = max event time of batch N-1 − delay),
    # so a second far-future batch is what actually flushes the outer row
    far = t0 + 14_400 * 1_000_000 * 10
    # the global watermark is the MIN across both watermarked inputs, so
    # the pusher batch must advance BOTH sides: a far-future click alone
    # leaves the purchase-side watermark at t0 and nothing ever evicts
    b2 = spark.createDataFrame(
        [
            (9, far, 99, "click", 0.0, "{}"),
            (11, far, 98, "purchase", 0.0, "{}"),
        ],
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
    )
    b3 = spark.createDataFrame(
        [(10, far + 60 * 1_000_000, 98, "click", 0.0, "{}")],
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
    )
    src_dir = str(tmp_path / "src")
    b1.withColumn("ts", F2.col("ts") * 1000).coalesce(1).write.parquet(src_dir + "/f1")
    b2.withColumn("ts", F2.col("ts") * 1000).coalesce(1).write.parquet(src_dir + "/f2")
    b3.withColumn("ts", F2.col("ts") * 1000).coalesce(1).write.parquet(src_dir + "/f3")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    base = time.time() - 100
    for i, f in enumerate(sorted(glob.glob(src_dir + "/f*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))

    src = read_event_stream(spark, flat, max_files_per_trigger=1)
    stream = interval_join(
        src.where(F.col("event_type") == "purchase"),
        src.where(F.col("event_type") == "click"),
        how="left_outer",
    )
    run_available_now(
        stream, "ij_outer", str(tmp_path / "ckpt"), output_mode="append"
    )
    rows = spark.table("ij_outer").collect()
    got = {(r["purchase_id"], r["click_id"]) for r in rows}
    # exactly one attributed pair and one NULL-click organic purchase;
    # the pusher click never surfaces (right side) and the pusher
    # purchase (11) stays in state — the watermark never passes ITS
    # window before the stream drains, exactly the trailing-tail caveat
    # the operator documents
    assert got == {(3, 2), (1, None)}
    organic = [r for r in rows if r["purchase_id"] == 1][0]
    assert organic["c_ts"] is None and organic["p_user"] == 7
