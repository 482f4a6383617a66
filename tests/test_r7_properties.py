"""Planted-mutant property tests for the round-7 statistical and
dedup operators: each test constructs a corpus with a KNOWN planted
signal in a temp sf-dir and asserts the operator finds exactly it —
the behavioral check the DuckDB parity gate (which would agree with
a wrong-but-symmetric implementation) cannot give."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.workloads import load_all

pytestmark = pytest.mark.usefixtures("spark")


def _write(df, path, name):
    # write timestamps as TIMESTAMP_MICROS (not INT96): pyarrow reads
    # INT96 as timestamp[ns], which read_table would then try to
    # rebuild from an int64 nanos column that doesn't exist
    df.sparkSession.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/{name}.parquet")


def test_fastss_finds_planted_typos(spark, tmp_path):
    """A corpus with 'pipeline' (frequent) plus planted 'pipelin'
    (deletion, lev 1... but distance-1 pairs need lev<=2 coverage) and
    'pipelime' (substitution) must surface both pairs; an unrelated
    word must not pair with anything."""
    rows = []
    for i in range(40):
        rows.append((i, "pipeline shuffle partition broadcast"))
    rows.append((100, "pipelin shuffle"))      # deletion of 'pipeline'
    rows.append((101, "pipelime broadcast"))   # substitution
    rows.append((102, "zebra zebra zebra"))    # unrelated
    docs = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
    _write(docs, str(tmp_path), "documents")

    wl = load_all()["token_typo_pairs_fastss"]
    got = {(r["tok_a"], r["tok_b"]): r["lev"]
           for r in wl.fn(spark, str(tmp_path)).collect()}
    assert got[("pipelin", "pipeline")] == 1
    assert got[("pipelime", "pipeline")] == 1
    assert not any("zebra" in k for pair in got for k in pair)


def test_mann_whitney_matches_hand_computed(spark, tmp_path):
    """Tiny two-arm case with hand-computed U: the md5 arm hash is
    replicated in the test so arm membership is known, then U, z and
    the rank-biserial follow the textbook formulas exactly."""
    import duckdb

    # build 40 purchase events; compute each user's arm the same way
    # the workload does, then give arm 0 systematically higher values
    con = duckdb.connect()
    arms = {
        uid: con.execute(
            "SELECT ('0x'||substring(md5('ab-' || ?),1,15))::BIGINT % 2",
            [str(uid)],
        ).fetchone()[0]
        for uid in range(40)
    }
    rows = []
    for uid in range(40):
        v = 100.0 + uid if arms[uid] == 0 else 10.0 + uid
        rows.append((uid, uid, "purchase", float(v)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    ).withColumn("ts", F.expr("timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,event_id)"))
    _write(ev, str(tmp_path), "events")

    wl = load_all()["abtest_mann_whitney_u"]
    [r] = wl.fn(spark, str(tmp_path)).collect()

    # hand computation (no ties by construction)
    vals = sorted(
        (100.0 + uid if arms[uid] == 0 else 10.0 + uid, arms[uid])
        for uid in range(40)
    )
    r1 = sum(i + 1 for i, (v, a) in enumerate(vals) if a == 0)
    n1 = sum(1 for a in arms.values() if a == 0)
    n2 = 40 - n1
    u1 = r1 - n1 * (n1 + 1) / 2
    assert (r["n_a"], r["n_b"]) == (n1, n2)
    assert r["u_a"] == u1
    # arm 0 dominates completely -> U = n1*n2, rank-biserial = -1
    assert r["u_a"] == n1 * n2
    assert r["rank_biserial"] == -1.0
    mu = n1 * n2 / 2
    var = n1 * n2 * (40 + 1) / 12  # tie term zero
    assert abs(r["z"] - (u1 - mu) / math.sqrt(var)) < 1e-6


def test_ks_flags_planted_drift(spark, tmp_path):
    """Values shifted by 10x in the second half-period must trip the
    KS verdict; an undrifted type must not."""
    rows = []
    for i in range(400):
        day = 1 + (i % 20)  # days 1..20, midpoint split at day 11
        drifted = day >= 11
        # type 'shift': second period values 10x larger
        rows.append((i, i % 37, "shift",
                     float((i % 50) + 1) * (10.0 if drifted else 1.0), day))
        # type 'steady': same distribution in both periods
        rows.append((1000 + i, i % 37, "steady", float((i % 50) + 1), day))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string,"
        " value double, day int"
    ).withColumn(
        "ts",
        F.expr("timestamp'2024-01-01' + make_interval(0,0,0,day,0,0,0)"),
    ).drop("day")
    _write(ev, str(tmp_path), "events")

    wl = load_all()["drift_ks_two_period"]
    got = {r["event_type"]: r for r in wl.fn(spark, str(tmp_path)).collect()}
    assert got["shift"]["drifted"] is True
    assert got["steady"]["drifted"] is False
    assert got["shift"]["ks_stat"] > got["steady"]["ks_stat"]


def test_theil_sen_ignores_outlier_day(spark, tmp_path):
    """A clean +5/day trend with ONE corrupted day must still report
    slope 5 exactly — the point of the median-of-slopes estimator
    (least squares would be dragged)."""
    rows = []
    eid = 0
    for day in range(1, 22):  # 21 days
        n = 100 + 5 * day if day != 10 else 5000  # day 10 corrupted
        for _ in range(n):
            rows.append((eid, eid % 13, "trend", 1.0, day))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string,"
        " value double, day int"
    ).withColumn(
        "ts",
        F.expr("timestamp'2024-01-01' + make_interval(0,0,0,day,0,0,0)"),
    ).drop("day")
    _write(ev, str(tmp_path), "events")

    wl = load_all()["theil_sen_daily_trend"]
    [r] = wl.fn(spark, str(tmp_path)).collect()
    assert r["ts_slope_per_day"] == 5.0
    assert r["n_days"] == 21


def test_t_closeness_flags_planted_skew(spark, tmp_path):
    """A class whose values all sit in the global top decile must
    violate t=0.2 (its EMD is ~0.9 x 10/9 of the prefix mass); a
    class sampling the global distribution must not."""
    rows = []
    eid = 0
    # 9 'normal' days: values uniform over 1..100
    for day in range(1, 10):
        for i in range(200):
            rows.append((eid, eid % 7, "et", float((i % 100) + 1), day))
            eid += 1
    # 1 skewed day: all values at the very top of the range
    for i in range(200):
        rows.append((eid, eid % 7, "et", 1000.0 + i, 10))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string,"
        " value double, day int"
    ).withColumn(
        "ts",
        F.expr("timestamp'2024-01-01' + make_interval(0,0,0,day,0,0,0)"),
    ).drop("day")
    _write(ev, str(tmp_path), "events")

    wl = load_all()["privacy_t_closeness"]
    [r] = wl.fn(spark, str(tmp_path)).collect()
    assert r["n_classes"] == 10
    assert r["n_violating_classes"] == 1
    assert r["rows_at_risk"] == 200
    assert r["max_emd"] > 0.2


def test_jsd_ranks_alien_source_first(spark, tmp_path):
    """A source with a disjoint vocabulary must top the divergence
    ranking; two sources sharing one distribution must sit at the
    bottom together."""
    rows = []
    for i in range(50):
        rows.append((i, "common words shared by both normal sources",
                     "en", "srcA"))
        rows.append((100 + i, "common words shared by both normal sources",
                     "en", "srcB"))
        rows.append((200 + i, "zzq xxv qqj totally alien vocabulary here",
                     "en", "srcC"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    _write(docs, str(tmp_path), "documents")

    wl = load_all()["source_divergence_jsd"]
    out = wl.fn(spark, str(tmp_path)).collect()
    assert out[0]["source"] == "srcC"
    assert out[0]["jsd_nats"] > out[1]["jsd_nats"] * 2
    assert {out[1]["source"], out[2]["source"]} == {"srcA", "srcB"}
    assert abs(out[1]["jsd_nats"] - out[2]["jsd_nats"]) < 1e-9
