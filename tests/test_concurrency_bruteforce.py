"""Brute-force oracle for the sweep-line concurrency workload: an
independent pure-Python reimplementation (sessionize -> intervals ->
per-hour peak with carry-in) over the real sf0.001 events must match
the Spark plan hour for hour. The DuckDB oracle mirrors the Spark
formulation; this test is the INDEPENDENT derivation that guards both
against a shared misconception (e.g. the carry-in rule)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from datanika_core_spark.session import read_table
from datanika_core_spark.workloads import load_all

SF = "/root/testdata/sf0.001"
GAP = dt.timedelta(minutes=30)
HOUR = dt.timedelta(hours=1)


def _brute_force(rows):
    # sessionize per user on (ts, event_id) order with a 30-min gap
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id))
    sessions = []  # (user, session_no, start, end)
    for uid, evs in by_user.items():
        evs.sort()
        start = end = None
        n = 0
        for ts, _ in evs:
            if start is None or ts > end + GAP:
                if start is not None:
                    sessions.append((uid, n, start, end))
                n += 1
                start = ts
            end = ts
        sessions.append((uid, n, start, end))

    # sweep: boundaries ordered by (ts, delta, user, session_no);
    # ends (-1) sort before starts (+1) at the same instant
    bounds = []
    for uid, sno, s, e in sessions:
        bounds.append((s, 1, uid, sno))
        bounds.append((e, -1, uid, sno))
    bounds.sort()

    level = 0
    floor = lambda ts: ts.replace(minute=0, second=0, microsecond=0)
    per_hour_max = {}
    per_hour_last = {}
    per_hour_n = defaultdict(int)
    for ts, delta, _, _ in bounds:
        h = floor(ts)
        level += delta
        per_hour_max[h] = max(per_hour_max.get(h, level), level)
        per_hour_last[h] = level
        per_hour_n[h] += 1

    # dense grid with carry-in
    hours = sorted(per_hour_max)
    out = {}
    carry = 0
    h = hours[0]
    while h <= hours[-1]:
        if h in per_hour_max:
            out[h] = (max(carry, per_hour_max[h]), per_hour_n[h])
            carry = per_hour_last[h]
        else:
            out[h] = (carry, 0)
        h += HOUR
    return out


def test_sweep_line_matches_bruteforce(spark):
    ev = read_table(spark, f"{SF}/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    want = _brute_force(ev.collect())

    got = {
        r.hour: (r.max_concurrent, r.n_boundaries)
        for r in load_all()["events_concurrent_sessions"]
        .fn(spark, SF)
        .collect()
    }
    assert got == want
