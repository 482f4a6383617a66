"""Streaming Holt-Winters twin: level + trend + the 7-slot seasonal
ring carried in ValueState must match the batch applyInPandas fold
(events_holt_winters_weekly) bit-exactly across micro-batch
boundaries. Input staged as THREE files — the first boundary lands
MID-BURN-IN (day 5 of the seed week), so the buffer itself must
survive the state round-trip, and the second lands mid-recurrence."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.streaming.jobs import (
    read_event_stream,
    run_available_now_to_memory,
)
from datanika_core_spark.streaming.stateful import streaming_holt_winters
from datanika_core_spark.workloads import load_all
from datanika_core_spark.workloads.timeseries import _daily

SF = "/root/testdata/sf0.001"
SPLITS = ("2024-01-06", "2024-01-21")  # mid-burn-in, mid-recurrence


@pytest.fixture(scope="module")
def staged_daily(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hw_stream") / "daily")
    daily = _daily(spark, SF)
    parts = [
        daily.filter(F.col("day") < SPLITS[0]),
        daily.filter(
            (F.col("day") >= SPLITS[0]) & (F.col("day") < SPLITS[1])
        ),
        daily.filter(F.col("day") >= SPLITS[1]),
    ]
    for p in parts:
        p.repartition(1).write.mode("append").parquet(d)
        time.sleep(1.1)  # distinct mtimes -> deterministic file order
    return d


def test_streaming_holt_winters_matches_batch_fold(spark, staged_daily):
    sdf = read_event_stream(spark, staged_daily, max_files_per_trigger=1)
    out = streaming_holt_winters(
        sdf, key="event_type", order_col="day", value_col="cents"
    )
    run_available_now_to_memory(out, "t_hw", output_mode="append")
    # round IN SPARK on both comparison sides (the Holt convention)
    got = {
        (r.event_type, str(r.day)): (
            r.value, r.level, r.trend, r.seasonal, r.forecast_next
        )
        for r in spark.table("t_hw").select(
            "event_type", "day",
            F.round("value", 2).alias("value"),
            F.round("level", 4).alias("level"),
            F.round("trend", 4).alias("trend"),
            F.round("seasonal", 4).alias("seasonal"),
            F.round("forecast_next", 4).alias("forecast_next"),
        ).collect()
    }

    batch = load_all()["events_holt_winters_weekly"].fn(spark, SF).collect()
    assert len(got) == len(batch) and len(batch) > 0
    for r in batch:
        assert got[(r.event_type, str(r.day))] == (
            r.value, r.level, r.trend, r.seasonal, r.forecast_next
        ), (r.event_type, r.day)

    # the seed week emits nothing; output starts at day 8
    assert all(k[1] >= "2024-01-08" for k in got)
    # post-split days must reflect pre-split ring state: with weekly
    # seasonality the seasonal component is generally nonzero
    late = [v for k, v in got.items() if k[1] >= SPLITS[1]]
    assert late and any(abs(v[3]) > 1e-9 for v in late), (
        "seasonal ring reset across the boundary"
    )
