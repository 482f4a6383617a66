"""Planted-signal property tests for the round-7 batch-5 operators
(isotonic PAV, Poisson bootstrap, CUPED, binseg changepoint, HHI,
PCA deflation): each test constructs a corpus with a KNOWN answer in
a temp sf-dir and asserts the operator recovers exactly it — the
behavioral check the DuckDB parity gate cannot give."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.workloads import load_all

pytestmark = pytest.mark.usefixtures("spark")


def _write(df, path, name):
    df.sparkSession.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/{name}.parquet")


def test_isotonic_pools_planted_violation(spark, tmp_path):
    """Two score bins with INVERTED rates (low-score bin all-positive,
    high-score bin all-negative) must pool to one flat block at the
    weighted mean — the defining PAV behavior."""
    # low-z docs: 6 stopwords + filler to length 100, no digits →
    # f_len=.5, f_stop=.3, f_digits=0 → y=1 (0.5+0.6>1), z≈-1.038
    lo = "the the the the the the " + "x" * 76
    assert len(lo) == 100
    # high-z docs: 20 digits + filler to length 400, no stopwords →
    # f_len=2, f_stop=0, f_digits=2 → y=0 (2-2<1), z≈3.759
    hi = "9" * 20 + "y" * 380
    assert len(hi) == 400
    rows = [(i, lo) for i in range(10)] + [(100 + i, hi) for i in range(10)]
    docs = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
    )
    _write(docs, str(tmp_path), "documents")

    got = load_all()["calibration_isotonic_pav"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 2
    by_bin = sorted(got, key=lambda r: r["bin_idx"])
    assert by_bin[0]["raw_rate"] == 1.0 and by_bin[1]["raw_rate"] == 0.0
    # pooled: both fitted values collapse to the weighted mean 0.5
    assert by_bin[0]["iso_rate"] == 0.5 and by_bin[1]["iso_rate"] == 0.5
    # and the fit is (weakly) monotone
    assert by_bin[0]["iso_rate"] <= by_bin[1]["iso_rate"]


def test_isotonic_monotone_and_mean_preserving_on_testdata(spark):
    """On the real corpus: iso_rate is non-decreasing within each
    language, and isotonic regression preserves the weighted mean."""
    got = load_all()["calibration_isotonic_pav"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_lang: dict[str, list] = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["bin_idx"])
        for a, b in zip(rows, rows[1:]):
            assert a["iso_rate"] <= b["iso_rate"] + 1e-9, lang
        wsum_iso = sum(r["n"] * r["iso_rate"] for r in rows)
        wsum_raw = sum(r["n"] * r["raw_rate"] for r in rows)
        assert abs(wsum_iso - wsum_raw) <= 1e-3 * len(rows), lang


def test_bootstrap_ci_degenerate_on_constant_metric(spark, tmp_path):
    """If every order has the same price, every Poisson-reweighted
    replicate mean equals it: CI width must be exactly 0."""
    rows = [
        (i, 1 + (i % 7), "O", 250.0,
         dt.datetime(2024, 1, 1 + i % 28), "1-URGENT")
        for i in range(300)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    _write(orders, str(tmp_path), "orders")

    got = load_all()["bootstrap_ci_poisson"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["mean_value"] == 250.0
    assert r["ci_lo"] == 250.0 and r["ci_hi"] == 250.0
    assert r["ci_width"] == 0.0


def test_cuped_fully_explained_by_covariate(spark, tmp_path):
    """When each user's experiment-period revenue EQUALS their
    pre-period revenue, the covariate explains everything: theta≈1,
    rho²≈1, and the CUPED lift is ~0 even though the raw lift is
    not."""
    rows = []
    eid = 0
    for u in range(1, 61):
        v = float(10 * u)
        rows.append((eid, dt.datetime(2024, 1, 10), u, "purchase", v, ""))
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 20), u, "purchase", v, ""))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    r = load_all()["abtest_cuped_readout"].fn(spark, str(tmp_path)).collect()[0]
    assert abs(r["theta"] - 1.0) < 1e-6
    assert abs(r["rho2"] - 1.0) < 1e-6
    assert abs(r["lift_cuped"]) < 1e-6
    assert r["var_remaining_pct"] < 1e-4


def test_binseg_finds_planted_level_shift(spark, tmp_path):
    """10 days at 5 events/day then 10 days at 50/day: the split must
    land after day 10 with the exact segment means."""
    rows = []
    eid = 0
    for d in range(20):
        n = 5 if d < 10 else 50
        for k in range(n):
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + d, 12, 0, k % 60), 1,
                 "burst", 1.0, "")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    r = load_all()["events_binseg_changepoint"].fn(
        spark, str(tmp_path)
    ).collect()[0]
    assert r["split_day"] == dt.date(2024, 3, 10)
    assert r["mean_before"] == 5.0
    assert r["mean_after"] == 50.0
    assert r["pct_change"] == 900.0
    assert r["n_days"] == 20


def test_hhi_monopoly_and_even_market(spark, tmp_path):
    """A single-supplier nation scores HHI=1 (effective n=1); a
    4-equal-supplier nation scores HHI=0.25 (effective n=4)."""
    nat = spark.createDataFrame(
        [(0, "MONO"), (1, "QUAD")], "n_nationkey long, n_name string"
    )
    sup = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 1), (4, 1), (5, 1)],
        "s_suppkey long, s_nationkey long",
    )
    li = spark.createDataFrame(
        [(i, s, 100.0, 0.0) for i, s in enumerate([1, 1, 2, 3, 4, 5])],
        "l_orderkey long, l_suppkey long, l_extendedprice double,"
        " l_discount double",
    )
    _write(nat, str(tmp_path), "nation")
    _write(sup, str(tmp_path), "supplier")
    _write(li, str(tmp_path), "lineitem")

    got = {r["nation"]: r for r in load_all()[
        "market_hhi_concentration"
    ].fn(spark, str(tmp_path)).collect()}
    assert got["MONO"]["hhi"] == 1.0
    assert got["MONO"]["effective_n"] == 1.0
    assert got["MONO"]["top_share"] == 1.0
    assert got["QUAD"]["hhi"] == 0.25
    assert got["QUAD"]["effective_n"] == 4.0
    assert got["QUAD"]["top_share"] == 0.25


def test_pca_deflation_recovers_planted_axes(spark, tmp_path):
    """Vectors along e0 (large) and e1 (smaller): PC1 must be e0,
    PC2 must be e1, the components orthogonal, and together they
    explain ALL the variance."""
    dim = 64
    rows = []
    for i in range(30):
        v = [0.0] * dim
        v[0] = 8.0
        rows.append((i, v, 0))
    for i in range(30):
        v = [0.0] * dim
        v[1] = 4.0
        rows.append((100 + i, v, 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    _write(emb, str(tmp_path), "embeddings")

    got = load_all()["pca_top2_deflation"].fn(spark, str(tmp_path)).collect()
    by_dim = {r["dim"]: r for r in got}
    assert abs(by_dim[0]["pc1_loading"]) > 0.999999
    assert abs(by_dim[1]["pc1_loading"]) < 1e-6
    assert abs(by_dim[1]["pc2_loading"]) > 0.999999
    assert abs(by_dim[0]["pc2_loading"]) < 1e-6
    r0 = by_dim[0]
    assert abs(r0["dot12"]) < 1e-6
    assert abs(r0["eig1"] - 30 * 64.0) < 0.01   # 30 vectors × 8²
    assert abs(r0["eig2"] - 30 * 16.0) < 0.01   # 30 vectors × 4²
    assert abs(r0["evr2"] - 1.0) < 1e-6


def test_target_encoding_excludes_own_fold(spark, tmp_path):
    """Plant one fold whose orders have wildly different prices: the
    OOF encoding for that fold must NOT move with its own prices,
    while the naive encoding does."""
    import duckdb as _dd

    # find orderkeys landing in fold 0 vs others with the md5 rule
    con = _dd.connect()
    folds = {
        k: con.sql(
            f"SELECT ('0x'||substring(md5('te-' || CAST({k} AS VARCHAR))"
            ",1,15))::BIGINT % 5"
        ).fetchone()[0]
        for k in range(200)
    }
    f0 = [k for k, f in folds.items() if f == 0][:20]
    rest = [k for k, f in folds.items() if f != 0][:80]
    rows = (
        [(k, 1, "O", 10000.0, dt.datetime(2024, 1, 2), "1-URGENT")
         for k in f0]
        + [(k, 1, "O", 100.0, dt.datetime(2024, 1, 2), "1-URGENT")
           for k in rest]
    )
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    cust = spark.createDataFrame([(1, 0)], "c_custkey long, c_nationkey int")
    nat = spark.createDataFrame([(0, "X")], "n_nationkey long, n_name string")
    _write(orders, str(tmp_path), "orders")
    _write(cust, str(tmp_path), "customer")
    _write(nat, str(tmp_path), "nation")

    got = {r["fold"]: r for r in load_all()[
        "feature_target_encoding_oof"
    ].fn(spark, str(tmp_path)).collect()}
    # fold 0's encoding is built from the 100-dollar rest plus the
    # α=20 global-mean prior: (80·100 + 20·2080)/(80+20) = 496 —
    # far below the naive all-data encoding of 2080
    assert got[0]["oof_encoding"] == 496.0
    assert got[0]["naive_encoding"] == 2080.0
    # the other folds DO see fold 0's planted 10k orders
    assert all(got[f]["oof_encoding"] > got[0]["oof_encoding"]
               for f in got if f != 0)


def test_bh_rejects_planted_shift_not_steady(spark, tmp_path):
    """One event type with a huge post-split mean shift and several
    steady types: BH must reject exactly the shifted one."""
    rows = []
    eid = 0
    for day in range(1, 29):
        ts = dt.datetime(2024, 1, day, 10, 0, 0)
        post = day >= 16
        for k in range(30):
            # shifted type: mean jumps 10x after the split
            rows.append((eid, ts, 1, "shifted",
                         1000.0 if post else 100.0 + k % 7, ""))
            eid += 1
            for tname in ("steady_a", "steady_b", "steady_c"):
                rows.append((eid, ts, 1, tname, 50.0 + (eid + k) % 11, ""))
                eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    got = {r["event_type"]: r for r in load_all()[
        "multiple_testing_bh"
    ].fn(spark, str(tmp_path)).collect()}
    assert got["shifted"]["rejected"] is True
    assert got["shifted"]["rank"] == 1
    assert got["shifted"]["p_value"] < 1e-6
    for tname in ("steady_a", "steady_b", "steady_c"):
        assert got[tname]["rejected"] is False, tname


def test_shapley_credits_only_causal_channel(spark, tmp_path):
    """Conversions happen iff the user touched 'click': click must
    carry ALL the credit, view none."""
    rows = []
    eid = 0
    for u in range(1, 31):  # click → purchase
        rows.append((eid, dt.datetime(2024, 1, 5, 10, 0), u, "click", 1.0, ""))
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 5, 10, 5), u, "purchase",
                     50.0, ""))
        eid += 1
    for u in range(31, 61):  # view only, no conversion
        rows.append((eid, dt.datetime(2024, 1, 5, 11, 0), u, "view", 1.0, ""))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    got = {r["channel"]: r for r in load_all()[
        "attribution_shapley_coalitions"
    ].fn(spark, str(tmp_path)).collect()}
    assert set(got) == {"click", "error", "signup", "view"}
    # 30 conversions over 60 users, all attributable to click
    assert got["click"]["shapley_rate"] == 0.5
    assert got["click"]["credit_share"] == 1.0
    for ch in ("view", "error", "signup"):
        assert got[ch]["phi_units"] == 0, ch


def test_markov_horizon_deterministic_chain(spark, tmp_path):
    """view→click→purchase for every user: p_within_1 is exact
    {view: 0, click: 1}; view reaches purchase by step 2 so
    p_within_4(view) = 1; purchase is absorbing at 1."""
    rows = []
    eid = 0
    for u in range(1, 11):
        t0 = dt.datetime(2024, 2, 1, 9, 0)
        rows.append((eid, t0, u, "view", 1.0, "")); eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=1), u, "click",
                     1.0, "")); eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=2), u, "purchase",
                     20.0, "")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    got = {r["state"]: r for r in load_all()[
        "markov_conversion_horizon"
    ].fn(spark, str(tmp_path)).collect()}
    assert got["purchase"]["p_within_1"] == 1.0
    assert got["click"]["p_within_1"] == 1.0
    assert got["view"]["p_within_1"] == 0.0
    assert got["view"]["p_within_4"] == 1.0


def test_did_recovers_planted_treatment_effect(spark, tmp_path):
    """Treatment arm gains exactly $50 post-split while control is
    flat: DiD must be exactly 50 with a large z."""
    import duckdb as _dd

    con = _dd.connect()
    arm = {
        u: con.sql(
            f"SELECT ('0x'||substring(md5('ab-' || CAST({u} AS VARCHAR))"
            ",1,15))::BIGINT % 2"
        ).fetchone()[0]
        for u in range(1, 81)
    }
    rows = []
    eid = 0
    for u, a in arm.items():
        pre_v = 100.0 + (u % 5)          # small between-user noise
        post_v = pre_v + (50.0 if a == 1 else 0.0)
        rows.append((eid, dt.datetime(2024, 1, 10), u, "purchase",
                     pre_v, "")); eid += 1
        rows.append((eid, dt.datetime(2024, 1, 20), u, "purchase",
                     post_v, "")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    r = load_all()["abtest_did_readout"].fn(spark, str(tmp_path)).collect()[0]
    assert r["did"] == 50.0
    assert r["mean_trt_post"] - r["mean_trt_pre"] == 50.0
    assert abs(r["mean_ctl_post"] - r["mean_ctl_pre"]) < 1e-9
    assert r["z"] > 5.0


def test_eigenvector_centrality_triangle_with_pendant(spark, tmp_path):
    """Triangle 1-2-3 plus pendant edge 1-4: part 1 (the extra-edge
    triangle vertex) must rank first, the symmetric pair 2/3 next
    with EQUAL rounded scores (partkey tiebreak), the pendant last."""
    orders = [(10, 1), (10, 2), (11, 1), (11, 3), (12, 2), (12, 3),
              (13, 1), (13, 4)]
    li = spark.createDataFrame(
        [(ok, pk, 1.0, 0.0) for ok, pk in orders],
        "l_orderkey long, l_partkey long, l_extendedprice double,"
        " l_discount double",
    )
    _write(li, str(tmp_path), "lineitem")

    got = load_all()["graph_eigenvector_centrality"].fn(
        spark, str(tmp_path)
    ).collect()
    by_rank = {r["rank"]: r for r in got}
    assert by_rank[1]["partkey"] == 1
    assert {by_rank[2]["partkey"], by_rank[3]["partkey"]} == {2, 3}
    assert by_rank[2]["centrality"] == by_rank[3]["centrality"]
    assert by_rank[4]["partkey"] == 4
    assert by_rank[4]["centrality"] < by_rank[2]["centrality"]


def test_pinball_zero_loss_on_constant_series(spark, tmp_path):
    """A type with a constant 10 events/day in train AND test: every
    quantile forecast equals 10, every pinball loss is exactly 0,
    and q90 coverage is 1.0."""
    rows = []
    eid = 0
    for d in range(1, 29):  # Jan 1..28 — split at Jan 16
        for k in range(10):
            rows.append(
                (eid, dt.datetime(2024, 1, d, 8, 0, k), 1, "flat",
                 1.0, "")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    r = load_all()["forecast_pinball_eval"].fn(
        spark, str(tmp_path)
    ).collect()[0]
    assert r["pinball_q10"] == 0.0
    assert r["pinball_q50"] == 0.0
    assert r["pinball_q90"] == 0.0
    assert r["cover_q90"] == 1.0
    assert r["n_test_days"] == 13


def test_dp_release_noise_matches_closed_form(spark, tmp_path):
    """The Laplace draw is the documented inverse CDF of the md5
    uniform: recompute it independently for one (type, release) and
    assert the released value matches; the budget column must be
    (r+1)·epsilon exactly."""
    import math

    import duckdb as _dd

    rows = [(i, dt.datetime(2024, 1, 5), i % 7, "click", 1.0, "")
            for i in range(40)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    got = {r["release"]: r for r in load_all()[
        "privacy_dp_laplace_release"
    ].fn(spark, str(tmp_path)).collect()}
    assert all(got[r]["n_true"] == 7 for r in range(4))
    con = _dd.connect()
    for r in range(4):
        u = con.sql(
            f"SELECT ('0x'||substring(md5('dp-click-{r}'),1,15))::BIGINT"
            f" / {float(1 << 60)!r}"
        ).fetchone()[0]
        noise = -2.0 * (-1.0 if u < 0.5 else 1.0) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        )
        assert abs(got[r]["released"] - round(7 + noise, 4)) < 1e-9
        assert got[r]["eps_spent"] == round((r + 1) * 0.5, 2)
    means = [got[r]["released"] for r in range(4)]
    assert abs(
        got[3]["running_mean"] - round(sum(means) / 4, 4)
    ) <= 0.0002  # rounded-vs-unrounded display drift only


def test_bigram_lm_flags_alien_heldout_text(spark, tmp_path):
    """Held-out text drawn from the training distribution scores low
    perplexity with zero OOV; an alien-vocabulary held-out doc
    scores oov_rate 1.0 and far higher perplexity."""
    rows = []
    for i in range(1, 41):
        if i % 5 == 0:
            continue
        rows.append((i, "the cat sat on the mat", "en", "s"))
        rows.append((1000 + i, "aaa bbb ccc ddd eee", "xx", "s"))
    rows.append((5, "the cat sat on the mat", "en", "s"))      # test
    rows.append((1005, "zzz qqq www rrr", "xx", "s"))          # test
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    _write(docs, str(tmp_path), "documents")

    got = {r["lang"]: r for r in load_all()[
        "perplexity_bigram_interpolated"
    ].fn(spark, str(tmp_path)).collect()}
    assert got["en"]["oov_rate"] == 0.0
    assert got["xx"]["oov_rate"] == 1.0
    assert got["xx"]["perplexity"] > 3 * got["en"]["perplexity"]


def test_join_order_advisor_prefers_small_build(spark, tmp_path):
    """Constructed counts where (orders x customer) first is
    provably cheaper, and the cartesian start is ranked last with
    its |L|·|C| intermediate."""
    li = spark.createDataFrame(
        [(k % 20, 1, 1.0, 0.0) for k in range(100)],
        "l_orderkey long, l_partkey long, l_extendedprice double,"
        " l_discount double",
    )
    orders = spark.createDataFrame(
        [(k, k % 10, "O", 1.0, dt.datetime(2024, 1, 2), "1-URGENT")
         for k in range(20)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    cust = spark.createDataFrame(
        [(k, 0) for k in range(10)], "c_custkey long, c_nationkey int"
    )
    _write(li, str(tmp_path), "lineitem")
    _write(orders, str(tmp_path), "orders")
    _write(cust, str(tmp_path), "customer")

    got = load_all()["join_order_advisor"].fn(
        spark, str(tmp_path)
    ).collect()
    by_rank = {r["rank"]: r for r in got}
    assert by_rank[1]["plan"].startswith("(orders x customer)")
    assert by_rank[1]["recommended"] is True
    assert by_rank[1]["cost_cout"] == 20 + 100        # e_oc=20, f=100
    assert by_rank[2]["cost_cout"] == 100 + 100       # e_lo=100, f=100
    assert by_rank[3]["est_intermediate"] == 1000     # |L|·|C|
    assert by_rank[3]["plan"].endswith("cartesian start")


def test_kcenter_greedy_picks_planted_extremes(spark, tmp_path):
    """A tight cluster at the origin plus one far point on e0 and a
    medium point on e1: greedy from the lowest vec_id (in the
    cluster) must pick the far point first, the medium point second,
    with exact integer d² values, and selection distances must be
    non-increasing (the greedy invariant)."""
    dim = 64
    rows = []
    for i in range(20):  # cluster at origin (vec_id 0..19)
        rows.append((i, [0.0] * dim, 0))
    far = [0.0] * dim
    far[0] = 10.0      # d² to origin = (10·1000)² = 1e8
    rows.append((100, far, 1))
    med = [0.0] * dim
    med[1] = 5.0       # d² to origin = 25e6
    rows.append((101, med, 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    _write(emb, str(tmp_path), "embeddings")

    got = load_all()["coreset_kcenter_greedy"].fn(
        spark, str(tmp_path)
    ).collect()
    by_rank = {r["sel_rank"]: r for r in got}
    assert by_rank[0]["vec_id"] == 0
    assert by_rank[1]["vec_id"] == 100
    assert by_rank[1]["d2_at_selection"] == 100_000_000
    assert by_rank[2]["vec_id"] == 101
    assert by_rank[2]["d2_at_selection"] == 25_000_000
    sels = [by_rank[r]["d2_at_selection"] for r in range(1, 8)]
    assert all(a >= b for a, b in zip(sels, sels[1:]))
    assert by_rank[0]["radius_after_k"] == 0  # everything else at origin


def test_max_coverage_greedy_orders_by_marginal_gain(spark, tmp_path):
    """Ten docs with disjoint vocabularies of decreasing size: the
    greedy must select them largest-first with exact gains and a
    non-increasing gain sequence."""
    rows = []
    for i in range(10):
        n_tok = 22 - i  # → 20 − i distinct shingles, all unique
        toks = [f"w{i}x{j}" for j in range(n_tok)]
        rows.append((i, " ".join(toks), "en", "s"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    _write(docs, str(tmp_path), "documents")

    got = load_all()["select_max_coverage_greedy"].fn(
        spark, str(tmp_path)
    ).collect()
    assert [r["doc_id"] for r in got] == list(range(8))
    assert [r["gain"] for r in got] == [20 - i for i in range(8)]
    assert got[-1]["cum_coverage"] == sum(20 - i for i in range(8))
    gains = [r["gain"] for r in got]
    assert all(a >= b for a, b in zip(gains, gains[1:]))


def test_stl_flat_weekly_series_has_zero_interior_remainder(
    spark, tmp_path
):
    """A perfectly periodic series (flat level + fixed weekday
    bonus): seasonal must absorb the weekly pattern and the interior
    remainder must be ~0 (edges carry truncated-window bias)."""
    rows = []
    eid = 0
    for d in range(28):
        day = dt.date(2024, 3, 1) + dt.timedelta(days=d)
        wd = (day - dt.date(1970, 1, 1)).days % 7
        n = 100 + (50 if wd == 0 else 0)
        for k in range(n):
            rows.append(
                (eid,
                 dt.datetime(day.year, day.month, day.day, 9, k % 60),
                 1, "weekly", 1.0, "")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    got = load_all()["events_stl_decomposition"].fn(
        spark, str(tmp_path)
    ).collect()
    got.sort(key=lambda r: r["day"])
    interior = got[3:-3]
    assert all(abs(r["remainder"]) < 2.0 for r in interior)
    # seasonal carries the weekday-0 spike
    by_wd = {}
    for r in got:
        wd = (r["day"] - dt.date(1970, 1, 1)).days % 7
        by_wd.setdefault(wd, []).append(r["seasonal"])
    assert min(by_wd[0]) > 30.0
    assert all(max(v) < 5.0 for w, v in by_wd.items() if w != 0)


def test_wasserstein_exact_on_point_masses(spark, tmp_path):
    """Point masses at $1 vs $2 are exactly $1 apart; identical
    distributions are exactly 0 apart and rank closest."""
    rows = []
    eid = 0
    for _ in range(50):
        rows.append((eid, dt.datetime(2024, 1, 5), 1, "a", 1.0, ""))
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 5), 1, "b", 2.0, ""))
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 5), 1, "c", 1.0, ""))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    got = {(r["t1"], r["t2"]): r for r in load_all()[
        "dist_wasserstein_1d_pairs"
    ].fn(spark, str(tmp_path)).collect()}
    assert got[("a", "c")]["w1_dollars"] == 0.0
    assert got[("a", "c")]["closeness_rank"] == 1
    assert got[("a", "b")]["w1_dollars"] == 1.0
    assert got[("b", "c")]["w1_dollars"] == 1.0


def test_doremi_upweights_hard_source(spark, tmp_path):
    """A source of rare singleton tokens (high cross-entropy) must
    gain weight; the repetitive easy source must lose it; the new
    weights sum to 1."""
    rows = []
    for i in range(40):
        rows.append((i, "the the the the the", "en", "easy"))
    for i in range(40):
        toks = " ".join(f"rare{i}x{j}" for j in range(5))
        rows.append((1000 + i, toks, "en", "hard"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    _write(docs, str(tmp_path), "documents")

    got = {r["source"]: r for r in load_all()[
        "mixture_doremi_step"
    ].fn(spark, str(tmp_path)).collect()}
    assert got["hard"]["ce_nats"] > got["easy"]["ce_nats"]
    assert got["hard"]["delta_pct"] > 0
    assert got["easy"]["delta_pct"] < 0
    assert abs(
        got["hard"]["w_doremi"] + got["easy"]["w_doremi"] - 1.0
    ) < 1e-5


def test_stratified_att_recovers_planted_effect(spark, tmp_path):
    """Outcome = f(covariate) + exactly $50 if treated, with
    treatment CORRELATED with the covariate: the stratified
    estimator must return exactly 50.0 (every within-stratum diff
    is 50), which the confounded naive difference would not."""
    rows = []
    eid = 0
    for u in range(200):
        g = u % 10
        blk = u // 10  # 0..19, independent of g
        treated = (blk % 2 == 0) if g >= 5 else (blk % 4 == 0)
        # pre-period: (3+g) views + 2 errors if treated else 2 views
        for k in range(3 + g + (0 if treated else 2)):
            rows.append((eid, dt.datetime(2024, 1, 5, 8, k % 60), u,
                         "view", 1.0, "")); eid += 1
        if treated:
            for k in range(2):
                rows.append((eid, dt.datetime(2024, 1, 6, 8, k), u,
                             "error", 1.0, "")); eid += 1
        # post-period outcome: purchase of (100+10g) + 50·treated
        y = 100.0 + 10.0 * g + (50.0 if treated else 0.0)
        rows.append((eid, dt.datetime(2024, 1, 20, 9, 0), u,
                     "purchase", y, "")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    got = load_all()["causal_stratified_att"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 10
    for r in got:
        assert r["diff"] == 50.0, r
    assert got[0]["att_total"] == 50.0
    # covariate gradient is visible across strata
    assert got[-1]["mean_treated"] > got[0]["mean_treated"]


def test_dispersion_index_flags_bursty_not_constant(spark, tmp_path):
    """A constant 10/day series has dispersion 0 (not flagged); an
    alternating 2/40 series is strongly overdispersed."""
    rows = []
    eid = 0
    for d in range(20):
        for k in range(10):
            rows.append((eid, dt.datetime(2024, 4, 1 + d, 8, k), 1,
                         "steady", 1.0, "")); eid += 1
        n = 2 if d % 2 == 0 else 40
        for k in range(n):
            rows.append((eid, dt.datetime(2024, 4, 1 + d, 9, k), 1,
                         "bursty", 1.0, "")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    _write(ev, str(tmp_path), "events")

    got = {r["event_type"]: r for r in load_all()[
        "events_dispersion_index"
    ].fn(spark, str(tmp_path)).collect()}
    assert got["steady"]["dispersion_index"] == 0.0
    assert got["steady"]["overdispersed"] is False
    assert got["bursty"]["dispersion_index"] > 1.5
    assert got["bursty"]["overdispersed"] is True


def test_assortativity_star_is_minus_one(spark, tmp_path):
    """A pure star co-purchase graph (hub in every order, one leaf
    each) is perfectly disassortative: r = −1 exactly."""
    li = spark.createDataFrame(
        [(k, 1, 1.0, 0.0) for k in range(2, 12)]
        + [(k, k, 1.0, 0.0) for k in range(2, 12)],
        "l_orderkey long, l_partkey long, l_extendedprice double,"
        " l_discount double",
    )
    _write(li, str(tmp_path), "lineitem")

    r = load_all()["graph_degree_assortativity"].fn(
        spark, str(tmp_path)
    ).collect()[0]
    assert r["n_edges"] == 10
    assert r["assortativity"] == -1.0


def test_label_propagation_fills_separated_clusters(spark, tmp_path):
    """Two well-separated clusters with 20% seeds: propagation must
    label every masked node correctly (accuracy 1.0, full
    coverage)."""
    dim = 64
    rows = []
    # ids all EVEN (the workload runs on the vec_id % 2 = 0 pilot
    # sample); %10==0 ids become the 20% seeds of each cluster
    for i in range(50):          # cluster 0 along e0
        v = [0.0] * dim
        v[0] = 5.0 + 0.001 * (i % 7)
        rows.append((i * 2, v, 0))
    for i in range(50):          # cluster 1 along e1
        v = [0.0] * dim
        v[1] = 5.0 + 0.001 * (i % 7)
        rows.append((1000 + i * 2, v, 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    _write(emb, str(tmp_path), "embeddings")

    got = {r["label"]: r for r in load_all()[
        "ssl_label_propagation"
    ].fn(spark, str(tmp_path)).collect()}
    for lab in (0, 1):
        assert got[lab]["n_predicted"] == got[lab]["n_masked"], lab
        assert got[lab]["accuracy"] == 1.0, lab
