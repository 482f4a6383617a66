"""Structured Streaming: batch/stream equivalence + foreachBatch
ingestion (streaming mode of the engine, beyond-reference —
the reference is batch-only, SURVEY.md §1.1)."""

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.operators.writers import drop_table
from datanika_core_spark.session import read_table
from datanika_core_spark.streaming import (
    run_available_now_to_memory,
    session_aggregates,
    stream_ingest,
    tumbling_counts,
)
from datanika_core_spark.streaming.jobs import read_event_stream

SF_DIR = "/root/testdata/sf0.001"
EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def events_batch(spark):
    # Cast to TIMESTAMP to match the stream reader (watermarks require
    # TIMESTAMP; session tz is UTC so the instants are identical).
    return read_table(spark, EVENTS).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_stream_tumbling_equals_batch(spark, events_batch):
    sdf = read_event_stream(spark, EVENTS)
    run_available_now_to_memory(
        tumbling_counts(sdf), "t_stream_tumbling", output_mode="complete"
    )
    got = {
        (r.bucket_start, r.event_type): (r.n, r.total_value)
        for r in spark.table("t_stream_tumbling").collect()
    }
    want = {
        (r.bucket_start, r.event_type): (r.n, r.total_value)
        for r in (
            events_batch.groupBy(
                F.window("ts", "1 hour").start.alias("bucket_start"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .collect()
        )
    }
    assert got == want


def test_stream_sessions_match_batch_session_count(spark, events_batch):
    sdf = read_event_stream(spark, EVENTS)
    run_available_now_to_memory(
        session_aggregates(sdf, gap="30 minutes"),
        "t_stream_sessions",
        output_mode="complete",
    )
    stream_sessions = spark.table("t_stream_sessions")
    # Batch twin: lag/cumsum sessionization with the same 30-min gap.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    lag_ts = F.lag("ts").over(w)
    batch_sessions = (
        events_batch.withColumn(
            "new_s",
            F.when(
                lag_ts.isNull()
                | (F.col("ts") > lag_ts + F.expr("INTERVAL 30 MINUTES")),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"))
    )
    got = {
        r.user_id: r.n
        for r in stream_sessions.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {r.user_id: r.n_sessions for r in batch_sessions.collect()}
    assert got == want
    # per-session event counts must cover every event exactly once
    assert (
        stream_sessions.agg(F.sum("n_events")).collect()[0][0]
        == events_batch.count()
    )


def test_stream_ingest_append(spark, tmp_path):
    drop_table(spark, "stream_ingested_events")
    n = stream_ingest(
        spark,
        EVENTS,
        "stream_ingested_events",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    src_n = read_table(spark, EVENTS).count()
    assert n == src_n
    assert spark.table("stream_ingested_events").count() == src_n
    # restart with the same checkpoint: no new files -> no new rows
    n2 = stream_ingest(
        spark,
        EVENTS,
        "stream_ingested_events",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert n2 == 0
    assert spark.table("stream_ingested_events").count() == src_n


def test_stream_sessions_full_parity_sf01(spark):
    """Full-tuple batch/stream parity at sf0.1 (VERDICT r1 item 10):
    the session_window() streaming twin must produce EXACTLY the
    sessions of the events_sessionize_gap batch workload — same
    (user_id, session_start, n_events, total_value) set — under an
    availableNow trigger over 100k events."""
    from datanika_core_spark.workloads.events import events_sessionize_gap

    sf_dir = "/root/testdata/sf0.1"
    sdf = read_event_stream(spark, f"{sf_dir}/events.parquet")
    run_available_now_to_memory(
        session_aggregates(sdf, gap="30 minutes"),
        "t_stream_sessions_01",
        output_mode="complete",
    )
    got = {
        (r.user_id, r.session_start.replace(tzinfo=None), r.n_events,
         r.total_value)
        for r in spark.table("t_stream_sessions_01").collect()
    }
    want = {
        (r.user_id, r.session_start, r.n_events, r.total_value)
        for r in events_sessionize_gap(spark, sf_dir)
        .select("user_id", "session_start", "n_events", "total_value")
        .collect()
    }
    assert len(got) == len(want)
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, events_batch):
    """Stream-stream join parity: purchases × preceding-30-min clicks
    per user, availableNow vs the identical batch join."""
    from datanika_core_spark.streaming.jobs import (
        interval_join_clicks_purchases,
    )

    sdf = read_event_stream(spark, EVENTS)
    clicks_s = sdf.filter(F.col("event_type") == "click")
    purchases_s = sdf.filter(F.col("event_type") == "purchase")
    run_available_now_to_memory(
        interval_join_clicks_purchases(clicks_s, purchases_s),
        "t_ss_join",
        output_mode="append",
    )
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.table("t_ss_join").collect()
    }

    c = events_batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = events_batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r.p_user, r.purchase_id, r.click_id)
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("click_ts")
               >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("click_ts") < F.col("purchase_ts")),
        ).collect()
    }
    assert len(got) > 0
    assert got == want


def test_stream_hopping_equals_batch(spark, events_batch):
    """Full-tuple parity for the hopping-window twin — the one
    windowed family that previously had no stream/batch equality
    test."""
    from datanika_core_spark.streaming.jobs import hopping_totals
    from datanika_core_spark.workloads import load_all

    sdf = read_event_stream(spark, EVENTS)
    run_available_now_to_memory(
        hopping_totals(sdf), "t_stream_hopping", output_mode="complete"
    )
    got = {
        r.win_start: (r.n, r.total_value)
        for r in spark.table("t_stream_hopping").collect()
    }
    want = {
        r.win_start: (r.n, r.total_value)
        for r in load_all()["events_hopping_windows"].fn(
            spark, SF_DIR
        ).collect()
    }
    assert got == want


def test_stream_dedup_within_watermark_key_set(spark, events_batch):
    """dropDuplicatesWithinWatermark with a watermark wider than the
    whole input span == one surviving row per key; the surviving KEY
    set must equal the batch distinct (which row of a dup group
    survives is arrival-order-dependent, so only keys are asserted)."""
    from datanika_core_spark.streaming.jobs import dedup_within_watermark

    sdf = read_event_stream(spark, EVENTS)
    run_available_now_to_memory(
        dedup_within_watermark(
            sdf, ["user_id", "event_type"], watermark="30 days"
        ),
        "t_wm_dedup",
        output_mode="append",
    )
    got = {
        (r.user_id, r.event_type)
        for r in spark.table("t_wm_dedup").collect()
    }
    want = {
        (r.user_id, r.event_type)
        for r in events_batch.select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want
    # and it deduplicated: emitted rows == distinct keys
    assert spark.table("t_wm_dedup").count() == len(want)


def test_stream_stream_left_outer_join(spark, events_batch, tmp_path):
    """Left-outer stream-stream join: matched pairs must equal the
    batch join exactly; null-click rows (unmatched purchases) are
    emitted only after the watermark passes, so with a time-split
    two-batch input the early purchases' nulls must appear and every
    emitted null must be a genuine batch-side non-match."""
    from datanika_core_spark.streaming.jobs import interval_join_left_outer

    # two files split on the median ts so the second batch advances
    # the watermark past the first file's purchases
    stage = tmp_path / "ev_split"
    stage.mkdir()
    mid = events_batch.agg(
        F.expr("percentile(cast(ts as double), 0.5)")
    ).collect()[0][0]
    events_batch.filter(F.col("ts").cast("double") <= mid).coalesce(
        1
    ).write.parquet(str(stage / "a"))
    events_batch.filter(F.col("ts").cast("double") > mid).coalesce(
        1
    ).write.parquet(str(stage / "b"))
    # flatten: file source wants one dir of files
    import shutil

    flat = tmp_path / "ev_flat"
    flat.mkdir()
    i = 0
    for sub in ("a", "b"):
        for f in sorted((stage / sub).glob("*.parquet")):
            shutil.copy(f, flat / f"part-{i:03d}.parquet")
            i += 1

    sdf = (
        spark.readStream.schema(events_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    purchases_s = sdf.filter(F.col("event_type") == "purchase")
    clicks_s = sdf.filter(F.col("event_type") == "click")
    run_available_now_to_memory(
        interval_join_left_outer(
            purchases_s, clicks_s, watermark="10 minutes"
        ),
        "t_ss_louter",
        output_mode="append",
    )
    out = spark.table("t_ss_louter").collect()

    p = events_batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    c = events_batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    batch_pairs = {
        (r.p_user, r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts")
               >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("click_ts") < F.col("purchase_ts")),
        ).collect()
    }
    matched = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in out
        if r.click_id is not None
    }
    assert matched == batch_pairs

    unmatched_purchases = {
        r.purchase_id for r in out if r.click_id is None
    }
    batch_matched_purchases = {pid for (_, pid, _) in batch_pairs}
    # every emitted null row is a genuine non-match
    assert not (unmatched_purchases & batch_matched_purchases)
    # the two-batch split advanced the watermark: early unmatched
    # purchases must have emitted their null rows
    assert unmatched_purchases, (
        "no outer rows emitted - watermark never advanced"
    )


def test_stream_ingest_processing_time_picks_up_new_files(
    spark, tmp_path
):
    """Open-ended trigger smoke test (everything else in the suite is
    availableNow batch-parity): with processing_time the SAME twin
    keeps polling and ingests a file dropped AFTER the stream
    started — the deployment shape — and the checkpoint still makes
    a later availableNow restart a no-op (same lineage, no
    double-count across trigger modes)."""
    import shutil
    import threading

    from tests.planted import _events, _write
    import datetime as dt

    drop_table(spark, "stream_ct_events")
    base = dt.datetime(2024, 3, 1, 10, 0)
    src = tmp_path / "ct_src"
    src.mkdir()

    def stage(i, rows):
        _write(_events(spark, rows), str(tmp_path), f"ct_stage{i}")
        part = next(
            (tmp_path / f"ct_stage{i}.parquet").glob("part-*.parquet")
        )
        shutil.copy(part, src / f"f{i}.parquet")

    stage(0, [(1, base, 1, "click", 1.0, "{}"),
              (2, base, 2, "click", 2.0, "{}")])

    def drop_late_file():
        stage(1, [(3, base, 3, "purchase", 3.0, "{}")])

    t = threading.Timer(6.0, drop_late_file)
    t.start()
    try:
        n = stream_ingest(
            spark, str(src), "stream_ct_events",
            checkpoint_dir=str(tmp_path / "ck_ct"),
            timeout_sec=20,
            processing_time="1 seconds",
        )
    finally:
        t.cancel()
    assert n == 3  # both files — including the one dropped mid-run
    assert spark.table("stream_ct_events").count() == 3
    # same checkpoint, availableNow: lineage carries across trigger
    # modes — nothing re-ingests
    n2 = stream_ingest(
        spark, str(src), "stream_ct_events",
        checkpoint_dir=str(tmp_path / "ck_ct"),
    )
    assert n2 == 0
    assert spark.table("stream_ct_events").count() == 3
