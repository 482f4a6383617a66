"""Edge-semantics tests for operators/temporal.py (as-of + range join).

Covers what the oracle corpus can't isolate: inclusive-equality
matching, no-prior-match NULLs, tolerance cutoff exactly at the
boundary, and range-join bucket fan-out producing no duplicates.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.operators.temporal import asof_join, range_join


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", ts("2024-01-01 10:00:00")),   # before any quote
            (2, "A", ts("2024-01-01 10:05:00")),   # exactly at quote q1
            (3, "A", ts("2024-01-01 10:30:00")),   # after q2
            (4, "B", ts("2024-01-01 11:00:00")),   # other key
        ],
        "trade_id long, sym string, t timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:05:00"), 100.0),  # q1
            ("A", ts("2024-01-01 10:20:00"), 101.0),  # q2
            ("B", ts("2024-01-01 10:59:00"), 55.0),
        ],
        "sym string, qt timestamp, px double",
    )
    return trades, quotes


def test_asof_inclusive_and_null(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="qt",
        right_cols=["px"],
    )
    rows = {r.trade_id: (r.px, r.qt) for r in out.collect()}
    assert rows[1] == (None, None)                       # no prior quote
    assert rows[2] == (100.0, ts("2024-01-01 10:05:00"))  # t == qt matches
    assert rows[3] == (101.0, ts("2024-01-01 10:20:00"))  # latest, not first
    assert rows[4] == (55.0, ts("2024-01-01 10:59:00"))   # per-key isolation
    assert out.count() == 4                               # left preserved


def test_asof_tolerance_boundary(quotes_trades):
    trades, quotes = quotes_trades
    # trade 3 is 600 s after q2: tolerance 600 keeps it, 599 drops it.
    keep = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="qt",
        right_cols=["px"], tolerance_seconds=600,
    )
    drop = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="qt",
        right_cols=["px"], tolerance_seconds=599,
    )
    assert {r.trade_id: r.px for r in keep.collect()}[3] == 101.0
    assert {r.trade_id: r.px for r in drop.collect()}[3] is None


def test_asof_name_collision_suffix(spark):
    left = spark.createDataFrame(
        [(1, "A", ts("2024-01-01 10:10:00"), 9.0)],
        "id long, sym string, t timestamp, px double",
    )
    right = spark.createDataFrame(
        [("A", ts("2024-01-01 10:00:00"), 100.0)],
        "sym string, qt timestamp, px double",
    )
    out = asof_join(left, right, on=["sym"], left_ts="t", right_ts="qt",
                    right_cols=["px"])
    row = out.collect()[0]
    assert row.px == 9.0           # left column untouched
    assert row.px_right == 100.0   # right column suffixed


def test_range_join_no_duplicates_across_buckets(spark):
    # Interval spans 3 one-hour buckets; each contained left row must
    # appear exactly once despite the 3-way explode.
    left = spark.createDataFrame(
        [
            (1, "k", ts("2024-01-01 10:30:00")),
            (2, "k", ts("2024-01-01 12:10:00")),
            (3, "k", ts("2024-01-01 12:40:00")),  # == end, excluded
            (4, "k", ts("2024-01-01 09:59:59")),  # before start
        ],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [("k", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:40:00"), "w1")],
        "k string, s timestamp, e timestamp, w string",
    )
    out = range_join(left, right, on=["k"], left_ts="t",
                     right_start="s", right_end="e", bucket_seconds=3600)
    got = sorted(r.id for r in out.collect())
    assert got == [1, 2]

    incl = range_join(left, right, on=["k"], left_ts="t",
                      right_start="s", right_end="e", bucket_seconds=3600,
                      end_inclusive=True)
    assert sorted(r.id for r in incl.collect()) == [1, 2, 3]


def test_range_join_plan_is_equi_join(spark):
    left = spark.createDataFrame(
        [(1, "k", ts("2024-01-01 10:30:00"))], "id long, k string, t timestamp"
    )
    right = spark.createDataFrame(
        [("k", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"))],
        "k string, s timestamp, e timestamp",
    )
    plan = range_join(
        left, right, on=["k"], left_ts="t", right_start="s", right_end="e"
    )._jdf.queryExecution().executedPlan().toString()
    # The point of bucketing: no BroadcastNestedLoopJoin in the plan.
    assert "BroadcastNestedLoop" not in plan
