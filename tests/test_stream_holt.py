"""Streaming Holt twin: the per-key (level, trend) ValueState
recurrence must match the batch applyInPandas fold
(events_holt_linear) bit-exactly across micro-batch boundaries —
identical IEEE op sequence, so no tolerance beyond the batch side's
display rounding. Input staged as two files consumed one per trigger
so the two-scalar state carry crosses a batch boundary."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.streaming.jobs import (
    read_event_stream,
    run_available_now_to_memory,
)
from datanika_core_spark.streaming.stateful import streaming_holt
from datanika_core_spark.workloads import load_all
from datanika_core_spark.workloads.timeseries import _daily

SF = "/root/testdata/sf0.001"
SPLIT = "2024-01-16"


@pytest.fixture(scope="module")
def staged_daily(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("holt_stream") / "daily")
    daily = _daily(spark, SF)
    daily.filter(F.col("day") < SPLIT).repartition(1) \
        .write.mode("append").parquet(d)
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    daily.filter(F.col("day") >= SPLIT).repartition(1) \
        .write.mode("append").parquet(d)
    return d


def test_streaming_holt_matches_batch_fold(spark, staged_daily):
    sdf = read_event_stream(spark, staged_daily, max_files_per_trigger=1)
    out = streaming_holt(sdf, key="event_type", order_col="day",
                         value_col="cents")
    run_available_now_to_memory(out, "t_holt", output_mode="append")
    # round IN SPARK (same half-away shortest-decimal semantics as the
    # batch workload's F.round — Python's round() is half-even and
    # reads the double's full binary expansion, so it can differ by
    # one ulp-digit on values like 306.73125)
    got = {
        (r.event_type, str(r.day)): (r.value, r.level, r.trend,
                                     r.forecast_next)
        for r in spark.table("t_holt").select(
            "event_type", "day",
            F.round("value", 2).alias("value"),
            F.round("level", 4).alias("level"),
            F.round("trend", 4).alias("trend"),
            F.round("forecast_next", 4).alias("forecast_next"),
        ).collect()
    }

    batch = load_all()["events_holt_linear"].fn(spark, SF).collect()
    assert len(got) == len(batch) and len(batch) > 0
    for r in batch:
        sv, sl, sb, sf_ = got[(r.event_type, str(r.day))]
        # identical IEEE recurrence + identical rounding -> exact
        assert (sv, sl, sb, sf_) == (
            r.value, r.level, r.trend, r.forecast_next
        ), (r.event_type, r.day)

    # late-half days must reflect early-half state: with a drifting
    # level the trend is generally nonzero; a fresh-seeded second
    # batch would restart every key at (x, 0)
    late_first = [
        (k, v) for k, v in got.items() if k[1] == SPLIT
    ]
    assert late_first
    assert any(abs(v[2]) > 1e-9 for _, v in late_first), (
        "trend reset to 0 at the split: state lost across the boundary"
    )
