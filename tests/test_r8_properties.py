"""Planted-signal property tests for the round-8 session-2 operators
(runs test, Hodges-Lehmann, Nelson-Aalen, retention triangle, Hurst,
Page-Hinkley, MATTR, DSIR KL): each constructs an input with a KNOWN
answer in a temp sf-dir (or asserts a cross-workload invariant on the
real corpus) — the behavioral check the DuckDB parity gate cannot
give."""

from __future__ import annotations

import datetime as dt

import pytest

from datanika_core_spark.workloads import load_all
from tests.planted import (  # noqa: F401
    _ab_variant,
    _day,
    _docs,
    _events,
    _write,
)

pytestmark = pytest.mark.usefixtures("spark")

SF = "/root/testdata/sf0.001"


# -- runs test ---------------------------------------------------------------


def test_runs_test_alternating_vs_monotonic(spark, tmp_path):
    """'alt' alternates daily counts 1,3,1,3,... → every sign flips:
    runs = n_signs and z > 0 (excess runs). 'mono' strictly grows →
    a single all-plus run, z undefined (NULL)."""
    rows, eid = [], 0
    for d in range(12):
        for _ in range(1 if d % 2 == 0 else 3):
            eid += 1
            rows.append((eid, _day(d), 1, "alt", 1.0, "{}"))
        for _ in range(d + 1):
            eid += 1
            rows.append((eid, _day(d), 2, "mono", 1.0, "{}"))
    _write(_events(spark, rows), str(tmp_path), "events")
    got = {
        r["event_type"]: r
        for r in load_all()["stats_runs_test"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    alt, mono = got["alt"], got["mono"]
    assert alt["n_pos"] + alt["n_neg"] == 11
    assert alt["runs"] == 11  # every consecutive sign differs
    # hand-computed Wald-Wolfowitz z for a=6, b=5, R=11:
    # E[R] = 60/11 + 1, Var[R] = 60·49/(121·10) → z = 2.9161
    assert alt["z"] == 2.9161
    assert mono["n_pos"] == 11 and mono["n_neg"] == 0
    assert mono["runs"] == 1
    assert mono["z"] is None


# -- Hodges-Lehmann -----------------------------------------------------------


def test_hodges_lehmann_recovers_planted_shift(spark, tmp_path):
    """Treatment users all spend 30, control all spend 10 → every
    pairwise difference is exactly 20, so HL = mean shift = 20."""
    users_t = [u for u in range(1, 200) if _ab_variant(u) == 1][:20]
    users_c = [u for u in range(1, 200) if _ab_variant(u) == 0][:20]
    rows, eid = [], 0
    for u in users_t:
        eid += 1
        rows.append((eid, _day(eid % 20), u, "purchase", 30.0, "{}"))
    for u in users_c:
        eid += 1
        rows.append((eid, _day(eid % 20), u, "purchase", 10.0, "{}"))
    _write(_events(spark, rows), str(tmp_path), "events")
    got = load_all()["stats_hodges_lehmann"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["event_type"] == "purchase"
    assert r["n_a"] == 20 and r["n_b"] == 20
    assert r["hl_shift"] == 20
    assert r["mean_shift"] == 20.0


# -- Nelson-Aalen vs Kaplan-Meier --------------------------------------------


def test_nelson_aalen_dominates_km_on_real_corpus(spark):
    """exp(−H(t)) ≥ S_KM(t) for every t (−ln(1−x) ≥ x termwise), H
    is nondecreasing, and both estimators see the identical risk
    sets — the standard relationship between the two estimators,
    checked on the real corpus."""
    reg = load_all()
    na = {
        r["t_days"]: r
        for r in reg["survival_nelson_aalen"].fn(spark, SF).collect()
    }
    km = {
        r["t_days"]: r
        for r in reg["survival_kaplan_meier"].fn(spark, SF).collect()
    }
    assert set(na) == set(km)
    prev_h = 0.0
    for t in sorted(na):
        assert na[t]["n_risk"] == km[t]["n_risk"]
        assert na[t]["d_events"] == km[t]["d_events"]
        assert na[t]["cum_hazard"] >= prev_h - 1e-9
        prev_h = na[t]["cum_hazard"]
        assert na[t]["na_survival"] >= km[t]["survival"] - 1e-6


# -- retention triangle --------------------------------------------------------


def test_retention_triangle_planted_cohorts(spark, tmp_path):
    """u1 active weeks 0 and 1, u2 week 0 only, u3 signs up week 1 →
    cohort 0: size 2, age0 = 1.0, age1 = 0.5; cohort 1: size 1,
    age0 = 1.0."""
    rows = [
        (1, _day(0), 1, "view", 1.0, "{}"),
        (2, _day(8), 1, "view", 1.0, "{}"),
        (3, _day(0), 2, "view", 1.0, "{}"),
        (4, _day(8), 3, "view", 1.0, "{}"),
    ]
    _write(_events(spark, rows), str(tmp_path), "events")
    got = {
        (r["cohort_week"], r["age_week"]): r
        for r in load_all()["cohort_retention_triangle"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got[(0, 0)]["cohort_users"] == 2
    assert got[(0, 0)]["retention"] == 1.0
    assert got[(0, 1)]["active_users"] == 1
    assert got[(0, 1)]["retention"] == 0.5
    assert got[(1, 0)]["cohort_users"] == 1
    assert got[(1, 0)]["retention"] == 1.0


def test_retention_triangle_age0_is_always_one(spark):
    """On the real corpus every cohort is fully active at age 0 by
    construction, and activity never exceeds cohort size."""
    rows = load_all()["cohort_retention_triangle"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        if r["age_week"] == 0:
            assert r["retention"] == 1.0
        assert r["active_users"] <= r["cohort_users"]


# -- Hurst exponent ------------------------------------------------------------


def test_hurst_trending_beats_alternating(spark, tmp_path):
    """A linear ramp (persistent trend) must score near H≈1; a
    period-2 oscillation (maximal anti-persistence) near H≈0. The
    estimator only has to ORDER them decisively."""

    def build(counts):
        rows, eid = [], 0
        base = dt.datetime(2024, 3, 1)
        for h, k in enumerate(counts):
            for _ in range(k):
                eid += 1
                rows.append(
                    (eid, base + dt.timedelta(hours=h, minutes=30),
                     1, "view", 1.0, "{}")
                )
        return _events(spark, rows)

    wl = load_all()["timeseries_hurst_exponent"]
    _write(build([h + 1 for h in range(216)]), str(tmp_path), "events")
    h_ramp = wl.fn(spark, str(tmp_path)).collect()[0]["hurst"]
    _write(build([1 if h % 2 == 0 else 9 for h in range(216)]),
           str(tmp_path), "events")
    h_alt = wl.fn(spark, str(tmp_path)).collect()[0]["hurst"]
    assert h_ramp > 0.75
    assert h_alt < 0.4
    assert h_ramp > h_alt + 0.3


def test_hurst_single_surviving_block_size_yields_null(spark, tmp_path):
    """Ten hours of data complete only the n=8 block, so the log-log
    fit has ONE point and the slope denominator is exactly zero: the
    guarded division must emit NULL (matching the oracle's CASE), not
    divide by zero or diverge between engines."""
    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)
    for h in range(10):
        for _ in range(h + 1):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=30),
                 1, "view", 1.0, "{}")
            )
    _write(_events(spark, rows), str(tmp_path), "events")
    got = load_all()["timeseries_hurst_exponent"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    assert got[0]["block_n"] == 8
    assert got[0]["hurst"] is None
    # the oracle agrees on the same degenerate input
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    oracle = con.execute(
        load_all()["timeseries_hurst_exponent"].oracle
    ).fetchall()
    assert len(oracle) == 1 and oracle[0][3] is None


# -- Page-Hinkley ---------------------------------------------------------------


def test_page_hinkley_flags_planted_level_shift(spark, tmp_path):
    """'shift' jumps from 10 to 50 at day 10 → PH⁺ climbs every
    post-shift day and peaks at the LAST day; 'steady' never drifts,
    so its peak statistic stays an order of magnitude smaller."""
    rows, eid = [], 0
    for d in range(20):
        eid += 1
        rows.append((eid, _day(d), 1, "shift",
                     10.0 if d < 10 else 50.0, "{}"))
        eid += 1
        rows.append((eid, _day(d), 2, "steady", 25.0, "{}"))
    _write(_events(spark, rows), str(tmp_path), "events")
    got = {
        r["event_type"]: r
        for r in load_all()["drift_page_hinkley"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    shift, steady = got["shift"], got["steady"]
    assert shift["inc_day"] == _day(19).date()
    assert shift["ph_inc"] > 10 * max(steady["ph_inc"], 0.01)
    assert shift["ph_inc"] > shift["ph_dec"]
    assert steady["ph_inc"] == 0.0 and steady["ph_dec"] == 0.0


# -- MATTR ----------------------------------------------------------------------


def test_mattr_exact_on_degenerate_docs(spark, tmp_path):
    """One token repeated 60× → every 25-window holds 1 type:
    MATTR = 1/25 exactly. 60 distinct tokens → MATTR = 1.0. Docs
    shorter than the window must be excluded entirely."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(["echo"] * 60), "rep", "s", 60),
            (2, " ".join(f"w{i}" for i in range(60)), "uniq", "s", 60),
            (3, "too short to count", "skip", "s", 18),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    _write(docs, str(tmp_path), "documents")
    got = {
        r["lang"]: r
        for r in load_all()["text_mattr_diversity"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert "skip" not in got
    assert got["rep"]["n_windows"] == 36
    assert got["rep"]["mattr"] == round(1 / 25, 6)
    assert got["rep"]["ttr"] == round(1 / 60, 6)
    assert got["uniq"]["mattr"] == 1.0
    assert got["uniq"]["ttr"] == 1.0


# -- DSIR KL diagnostics ---------------------------------------------------------


def test_dsir_kl_ranks_alien_source_farthest(spark, tmp_path):
    """srcA IS the English target slice (its unigram LM equals the
    target's, KL ≈ 0 up to smoothing); srcB uses a disjoint
    vocabulary — its divergence must dominate in both directions."""
    vocab_a = [f"eng{i}" for i in range(40)]
    vocab_b = [f"xx{i}" for i in range(40)]
    docs = []
    for d in range(10):
        docs.append(
            (d, " ".join(vocab_a[(d * 7 + j) % 40] for j in range(50)),
             "en", "srcA", 200)
        )
        docs.append(
            (100 + d, " ".join(vocab_b[(d * 7 + j) % 40]
                               for j in range(50)),
             "de", "srcB", 200)
        )
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    _write(df, str(tmp_path), "documents")
    got = {
        r["source"]: r
        for r in load_all()["curation_dsir_kl_diagnostics"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    a, b = got["srcA"], got["srcB"]
    assert a["n_tokens"] == 500 and b["n_tokens"] == 500
    for r in (a, b):
        assert r["kl_target_source"] >= 0
        assert r["kl_source_target"] >= 0
        assert r["jeffreys"] == pytest.approx(
            round(r["kl_target_source"] + r["kl_source_target"], 6),
            abs=2e-6,
        )
    assert b["jeffreys"] > 5 * max(a["jeffreys"], 1e-6)
    assert b["jeffreys"] > 1.0  # disjoint vocab is far in nats


# -- Mann-Kendall ----------------------------------------------------------------


def test_mann_kendall_detects_planted_trend(spark, tmp_path):
    """Strictly increasing daily counts over 12 days → S = C(12,2) =
    66 with zero ties (18·Var = 12·11·29 = 3828) and verdict
    'increasing'; a constant series is all ties → variance 0 and
    verdict 'undefined'."""
    rows, eid = [], 0
    for d in range(12):
        for _ in range(d + 1):
            eid += 1
            rows.append((eid, _day(d), 1, "up", 1.0, "{}"))
        for _ in range(7):
            eid += 1
            rows.append((eid, _day(d), 2, "flat", 1.0, "{}"))
    _write(_events(spark, rows), str(tmp_path), "events")
    got = {
        r["event_type"]: r
        for r in load_all()["stats_mann_kendall"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    up, flat = got["up"], got["flat"]
    assert up["s_stat"] == 66 and up["var18"] == 3828
    assert up["trend"] == "increasing" and up["z"] > 1.96
    assert flat["s_stat"] == 0 and flat["var18"] == 0
    assert flat["trend"] == "undefined" and flat["z"] is None


# -- Horvitz-Thompson ---------------------------------------------------------------


def test_ht_estimate_is_exact_on_uniform_weights(spark, tmp_path):
    """Equal-weight docs with n = population size: every doc is hit
    exactly once and each HT term telescopes to its own y — both
    estimates EQUAL the truth with zero relative error."""
    rows = [
        (i, " ".join(f"a{i:02d}b{j:02d}" for j in range(9)), "en", "s", 0)
        for i in range(20)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    _write(docs, str(tmp_path), "documents")
    got = load_all()["sample_pps_ht_estimate"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_sample"] == 20
    assert r["true_tokens"] == 180 and r["ht_tokens"] == 180.0
    assert r["tok_rel_err"] == 0.0
    assert r["true_docs"] == 20 and r["ht_docs"] == 20.0
    assert r["doc_rel_err"] == 0.0
