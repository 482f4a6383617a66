"""Streaming Page-Hinkley twin: after streaming the events table in
two files split at the MEDIAN EVENT (which lands mid-day, so the
boundary splits a day's counters across micro-batches — the case a
naive PH fold gets wrong), the monitor's report must EQUAL the batch
workload over the full table at exact equality. Plus replay-safety:
a redelivered batch_id is a no-op."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from datanika_core_spark.blocks import persistent_rdd_ids, release_blocks
from datanika_core_spark.session import read_table
from datanika_core_spark.streaming.ph import (
    StreamPageHinkleyMonitor,
    stream_page_hinkley,
)
from datanika_core_spark.workloads.timeseries import drift_page_hinkley

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _split_mid(spark, tmp_path, name):
    from pyspark.sql import Window as _W

    ev = read_table(spark, f"{SF}/events.parquet")
    n = ev.count()
    ranked = ev.withColumn(
        "_rn", F.row_number().over(_W.orderBy("ts", "event_id"))
    )
    halves = (
        ranked.filter(F.col("_rn") <= n // 2).drop("_rn"),
        ranked.filter(F.col("_rn") > n // 2).drop("_rn"),
    )
    # the split must actually land mid-day for the test to exercise
    # the day-merge path
    d0 = halves[0].agg(F.max(F.to_date("ts"))).collect()[0][0]
    d1 = halves[1].agg(F.min(F.to_date("ts"))).collect()[0][0]
    assert d0 == d1, "median split expected to land mid-day"
    src = tmp_path / name
    src.mkdir()
    for i, b in enumerate(halves):
        staged = tmp_path / f"{name}_s{i}"
        b.coalesce(1).write.parquet(str(staged))
        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"f{i}.parquet"
        )
    return ev, src


def test_stream_ph_matches_batch(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS ph_mon")
    release_blocks(spark)
    ev, src = _split_mid(spark, tmp_path, "ph_src")
    mon = StreamPageHinkleyMonitor(spark, "ph_mon")
    stats = stream_page_hinkley(
        spark, str(src), mon, checkpoint_dir=str(tmp_path / "ckph")
    )
    assert stats.batches == 2
    assert stats.arrived == ev.count()
    assert _rows(mon.report()) == _rows(drift_page_hinkley(spark, SF))
    # replay: a redelivered batch_id must not double the counters
    before = _rows(mon.report())
    mon.absorb(read_table(spark, f"{SF}/events.parquet"), batch_id=0)
    assert _rows(mon.report()) == before
    assert persistent_rdd_ids(spark) == set()


def test_stream_ph_day_counters_merge_exactly(spark, tmp_path):
    """The stored grid (not just the report) must equal the batch
    daily aggregate — the direct proof the mid-day boundary merged
    instead of forking the day."""
    spark.sql("DROP TABLE IF EXISTS ph_mon2")
    release_blocks(spark)
    ev, src = _split_mid(spark, tmp_path, "ph_src2")
    mon = StreamPageHinkleyMonitor(spark, "ph_mon2")
    stream_page_hinkley(
        spark, str(src), mon, checkpoint_dir=str(tmp_path / "ckph2")
    )
    want = _rows(
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("bigint").alias("day"),
        ).agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint").alias("cents"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    got = _rows(
        spark.table("ph_mon2").filter(F.col("day") >= 0)
    )
    assert got == want


def test_stream_daily_grid_powers_runs_and_mk(spark, tmp_path):
    """The SAME persisted counter grid must reproduce the runs-test
    and Mann-Kendall batch reports exactly — three monitors, one
    state table."""
    from datanika_core_spark.workloads.stats import stats_runs_test
    from datanika_core_spark.workloads.timeseries import (
        stats_mann_kendall,
    )

    spark.sql("DROP TABLE IF EXISTS ph_mon3")
    release_blocks(spark)
    ev, src = _split_mid(spark, tmp_path, "ph_src3")
    mon = StreamPageHinkleyMonitor(spark, "ph_mon3")
    stream_page_hinkley(
        spark, str(src), mon, checkpoint_dir=str(tmp_path / "ckph3")
    )
    assert _rows(mon.report_runs_test()) == _rows(
        stats_runs_test(spark, SF)
    )
    assert _rows(mon.report_mann_kendall()) == _rows(
        stats_mann_kendall(spark, SF)
    )
