"""Streaming EWMA twin: the per-key ValueState recurrence must match
the batch closed form (events_ewma_daily) across micro-batch
boundaries — the state carry is the point, so the input is staged as
two files consumed one per trigger."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.streaming.jobs import (
    read_event_stream,
    run_available_now_to_memory,
)
from datanika_core_spark.streaming.stateful import streaming_ewma
from datanika_core_spark.workloads import load_all
from datanika_core_spark.workloads.timeseries import _daily

SF = "/root/testdata/sf0.001"
SPLIT = "2024-01-16"


@pytest.fixture(scope="module")
def staged_daily(spark, tmp_path_factory):
    """Daily pre-agg written as two sequential files (early days,
    then late days) so maxFilesPerTrigger=1 forces the recurrence to
    cross a micro-batch boundary with only its ValueState."""
    d = str(tmp_path_factory.mktemp("ewma_stream") / "daily")
    daily = _daily(spark, SF)
    daily.filter(F.col("day") < SPLIT).repartition(1) \
        .write.mode("append").parquet(d)
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    daily.filter(F.col("day") >= SPLIT).repartition(1) \
        .write.mode("append").parquet(d)
    return d


def test_streaming_ewma_matches_batch_recurrence(spark, staged_daily):
    sdf = read_event_stream(spark, staged_daily, max_files_per_trigger=1)
    out = streaming_ewma(sdf, key="event_type", order_col="day",
                         value_col="cents")
    run_available_now_to_memory(out, "t_ewma", output_mode="append")
    # round IN SPARK on both comparison sides (the Holt convention,
    # tests/test_stream_holt.py): the batch recursive CTE and the
    # ValueState recurrence run the identical IEEE sequence
    # s = (x + s)/2, so after identical rounding they are EQUAL —
    # no tolerance
    got = {
        (r.event_type, str(r.day)): (r.value, r.ewma)
        for r in spark.table("t_ewma").select(
            "event_type", "day",
            F.round("value", 2).alias("value"),
            F.round("ewma", 4).alias("ewma"),
        ).collect()
    }

    batch = load_all()["events_ewma_daily"].fn(spark, SF).collect()
    assert len(got) == len(batch) and len(batch) > 0
    for r in batch:
        sv, se = got[(r.event_type, str(r.day))]
        assert (sv, se) == (r.value, r.ewma), (r.event_type, r.day)

    # the late-half days MUST have been smoothed against early-half
    # state (a fresh-seeded second batch would restart at value)
    late = [r for r in batch if str(r.day) >= SPLIT]
    drifted = [r for r in late if abs(r.ewma - r.value) > 0.01]
    assert drifted, "late days all equal their raw value: state lost"
