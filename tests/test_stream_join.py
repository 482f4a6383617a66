"""Watermarked stream-stream join twin: exact pair parity with the
batch interval join when nothing arrives late, idempotent replay, and
the defining watermark behavior — rows older than the watermark at
arrival time are DROPPED from the join, pinned with an out-of-order
two-file delivery. The LEFT-OUTER twin's contract is result TIMING:
an unmatched purchase's NULL row must NOT appear while its state is
live (a match could still arrive) and must surface only after a
later batch advances the watermark past its eviction threshold —
pinned from measured per-batch emissions, not inferred."""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import functions as F

from datanika_core_spark.blocks import release_blocks
from datanika_core_spark.session import read_table
from datanika_core_spark.streaming.stream_join import (
    context_report,
    stream_purchase_context,
    stream_purchase_context_outer,
)
from datanika_core_spark.workloads import load_all
from tests.planted import _events, _write

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _stage_single_file(spark, tmp_path, name):
    ev = read_table(spark, f"{SF}/events.parquet")
    src = tmp_path / name
    src.mkdir()
    staged = tmp_path / f"{name}_stage"
    ev.coalesce(1).write.parquet(str(staged))
    shutil.copy(
        next(staged.glob("part-*.parquet")), src / "f0.parquet"
    )
    return src


def test_stream_join_matches_batch_interval_join(spark, tmp_path):
    """One file → one batch → nothing is late: the streamed pairs
    aggregate to EXACTLY the batch workload's matched purchases."""
    spark.sql("DROP TABLE IF EXISTS sj_pairs")
    release_blocks(spark)
    src = _stage_single_file(spark, tmp_path, "sj_src")
    stats = stream_purchase_context(
        spark, str(src), "sj_pairs",
        checkpoint_dir=str(tmp_path / "ck_sj"),
    )
    assert stats.batches >= 1 and stats.pairs > 0
    got = _rows(context_report(spark, "sj_pairs"))
    batch = load_all()["range_join_purchase_context"].fn(spark, SF)
    want = _rows(
        batch.filter(F.col("n_context_events") > 0).select(
            "purchase_id", "n_context_events", "context_value"
        )
    )
    assert got == want

    # replaying the whole input is a no-op (idempotent pair append:
    # a fresh checkpoint re-reads the file; the sink's left_anti
    # guard must not double any pair)
    stream_purchase_context(
        spark, str(src), "sj_pairs",
        checkpoint_dir=str(tmp_path / "ck_sj2"),
    )
    assert _rows(context_report(spark, "sj_pairs")) == want


def test_stream_join_drops_cross_batch_sub_watermark_arrivals(
    spark, tmp_path
):
    """The contract the watermark actually gives a stream-stream
    join, pinned from measured behavior (q.recentProgress):

    - the global watermark is the MIN over every withWatermark
      column, so BOTH sides must see the far-future rows in file 0
      or it never advances;
    - a late pair arriving split ACROSS batches is dropped: the late
      purchase (batch 1) is below the watermark so it cannot be
      buffered for future matches, and the late click (batch 2)
      counts in numRowsDroppedByWatermark — no pair is emitted.
      (A late pair arriving in ONE batch would still join — the
      watermark bounds state and cross-batch lateness, not
      intra-batch matching.)"""
    spark.sql("DROP TABLE IF EXISTS sj_late")
    release_blocks(spark)
    base = dt.datetime(2024, 3, 1, 10, 0)

    def ts(minutes):
        return base + dt.timedelta(minutes=minutes)

    files = [
        _events(spark, [
            (101, ts(0), 1, "click", 5.0, "{}"),
            (102, ts(30), 1, "purchase", 9.0, "{}"),
            # far-future rows on BOTH sides advance the min-watermark
            # (the same-timestamp pair cannot join: c_ts < p_ts)
            (103, ts(60 * 50), 3, "click", 1.0, "{}"),
            (104, ts(60 * 50), 3, "purchase", 1.0, "{}"),
        ]),
        _events(spark, [(202, ts(35), 2, "purchase", 9.0, "{}")]),
        _events(spark, [(201, ts(5), 2, "click", 7.0, "{}")]),
    ]
    src = tmp_path / "sj_late_src"
    src.mkdir()
    for i, df in enumerate(files):
        _write(df, str(tmp_path), f"sj_late_stage{i}")
        part = next(
            (tmp_path / f"sj_late_stage{i}.parquet").glob("part-*.parquet")
        )
        dst = src / f"f{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    stats = stream_purchase_context(
        spark, str(src), "sj_late",
        checkpoint_dir=str(tmp_path / "ck_sj_late"),
        max_files_per_trigger=1,
    )
    assert stats.batches >= 3
    pairs = {
        (r["purchase_id"], r["ctx_id"])
        for r in spark.table("sj_late").collect()
    }
    assert (102, 101) in pairs  # on-time pair joined
    assert (202, 201) not in pairs  # split late pair dropped


def _seq_files(spark, tmp_path, name, files):
    src = tmp_path / name
    src.mkdir()
    for i, rows in enumerate(files):
        _write(_events(spark, rows), str(tmp_path), f"{name}_stage{i}")
        part = next(
            (tmp_path / f"{name}_stage{i}.parquet").glob("part-*.parquet")
        )
        dst = src / f"f{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return src


def test_outer_join_emits_null_only_after_eviction(spark, tmp_path):
    """The left-outer twin, measured: (P1, C1) matches like the inner
    join; unmatched P2's (P2, NULL) row is held while P2's state is
    live — zero null emissions in the batches that deliver it — and
    surfaces only in a LATER batch, after far-future rows on BOTH
    watermark columns push the global watermark past P2's eviction
    threshold. Replay from a fresh checkpoint must not double the
    NULL row (plain equality never matches NULL — the sink's
    anti-join key is null-safe)."""
    spark.sql("DROP TABLE IF EXISTS sj_outer")
    release_blocks(spark)
    base = dt.datetime(2024, 3, 1, 10, 0)

    def ts(minutes):
        return base + dt.timedelta(minutes=minutes)

    files = [
        [
            (11, ts(0), 1, "click", 5.0, "{}"),
            (12, ts(30), 1, "purchase", 9.0, "{}"),   # matched
            (22, ts(40), 2, "purchase", 9.0, "{}"),   # unmatched
        ],
        # far-future rows on BOTH sides (the purchase passes the
        # user cap so the p_ts watermark column sees it); same ts →
        # c_ts < p_ts is false, no accidental pair
        [
            (33, ts(60 * 50), 3, "click", 1.0, "{}"),
            (34, ts(60 * 50), 3, "purchase", 1.0, "{}"),
        ],
        # second advance: batch N's watermark is computed from data
        # through batch N-1, so eviction needs one more batch
        [
            (43, ts(60 * 100), 4, "click", 1.0, "{}"),
            (44, ts(60 * 100), 4, "purchase", 1.0, "{}"),
        ],
    ]
    src = _seq_files(spark, tmp_path, "sj_outer_src", files)
    stats = stream_purchase_context_outer(
        spark, str(src), "sj_outer",
        checkpoint_dir=str(tmp_path / "ck_sj_outer"),
        max_files_per_trigger=1,
    )
    assert stats.batches >= 3
    rows = {
        (r["purchase_id"], r["ctx_id"])
        for r in spark.table("sj_outer").collect()
    }
    assert (12, 11) in rows      # matched pair, inner-join behavior
    assert (22, None) in rows    # unmatched purchase emitted as NULL
    # timing pin: the null row did NOT appear in batch 1 (P2's state
    # was live) nor batch 2 (watermark for batch 2 still reflects
    # batch-1 data); first null emission is batch 3 or later
    emitted = [b for b, n in stats.null_emissions if n > 0]
    assert emitted and min(emitted) >= 3, stats.null_emissions
    assert all(n == 0 for b, n in stats.null_emissions if b <= 2)

    # batch left-join parity on the evicted window: the report shows
    # P1 with its context and P2 with a zero-count NULL-value row
    got = {
        r["purchase_id"]: (r["n_context_events"], r["context_value"])
        for r in context_report(spark, "sj_outer").collect()
        if r["purchase_id"] in (12, 22)
    }
    assert got == {12: (1, 5.0), 22: (0, None)}

    # idempotent replay: fresh checkpoint re-reads everything; the
    # null-safe anti-join must not double (22, NULL)
    stream_purchase_context_outer(
        spark, str(src), "sj_outer",
        checkpoint_dir=str(tmp_path / "ck_sj_outer2"),
        max_files_per_trigger=1,
    )
    dup = (
        spark.table("sj_outer")
        .groupBy("purchase_id", "ctx_id").count()
        .filter(F.col("count") > 1).count()
    )
    assert dup == 0
    assert (22, None) in {
        (r["purchase_id"], r["ctx_id"])
        for r in spark.table("sj_outer").collect()
    }


def test_semi_join_matches_batch_existence_filter(spark, tmp_path):
    """LEFT-SEMI twin: one file → one batch → nothing late: the
    landed purchase_ids are EXACTLY the batch workload's purchases
    with ≥1 context event, one row each (no pair fan-out); replay
    from a fresh checkpoint is a no-op via the purchase_id-only
    dedup key."""
    from datanika_core_spark.streaming.stream_join import (
        stream_purchase_context_semi,
    )

    spark.sql("DROP TABLE IF EXISTS sj_semi")
    release_blocks(spark)
    src = _stage_single_file(spark, tmp_path, "sj_semi_src")
    stats = stream_purchase_context_semi(
        spark, str(src), "sj_semi",
        checkpoint_dir=str(tmp_path / "ck_sj_semi"),
    )
    assert stats.batches >= 1 and stats.pairs > 0
    got = sorted(
        r["purchase_id"] for r in spark.table("sj_semi").collect()
    )
    batch = load_all()["range_join_purchase_context"].fn(spark, SF)
    want = sorted(
        r["purchase_id"]
        for r in batch.filter(F.col("n_context_events") > 0)
        .select("purchase_id").collect()
    )
    assert got == want          # same set…
    assert len(got) == len(set(got))  # …and exactly one row each

    stream_purchase_context_semi(
        spark, str(src), "sj_semi",
        checkpoint_dir=str(tmp_path / "ck_sj_semi2"),
    )
    assert sorted(
        r["purchase_id"] for r in spark.table("sj_semi").collect()
    ) == want

    # context_report has no ctx columns to aggregate on a semi
    # table — it must refuse with a CLEAR error, not an opaque
    # unresolved-column AnalysisException
    import pytest

    with pytest.raises(ValueError, match="ctx_id"):
        context_report(spark, "sj_semi")
