"""Planted-signal property tests for the round-7 session-3 operators
(Fellegi-Sunter, Naive Bayes, binary-Hamming ANN, OLS, GBDT split,
growth accounting, HRW resharding, permutation test): each test
constructs an input with a KNOWN answer in a temp sf-dir (or asserts
a structural invariant on the real corpus) — the behavioral check
the DuckDB parity gate cannot give."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.workloads import load_all

pytestmark = pytest.mark.usefixtures("spark")

SF = "/root/testdata/sf0.001"


def _write(df, path, name):
    df.sparkSession.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/{name}.parquet")


# -- Fellegi-Sunter ---------------------------------------------------------


def test_fs_unique_prefixes_make_every_candidate_true(spark, tmp_path):
    """With every part name under a UNIQUE 2-char prefix, blocking
    admits only the true pair per dirty record — every candidate is
    a truth pair, all land in the top band, and the m/u weights are
    all-agreement positives."""
    rows = []
    for i in range(1, 141):
        # unique prefix per part: combine two cycling chars with i
        prefix = chr(65 + i % 26) + chr(65 + (i // 26) % 26)
        rows.append((i, f"{prefix}name{i:04d}", f"B{i % 5}",
                     f"T{i % 3}", 10 + i % 7, 100.0))
    part = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string,"
        " p_type string, p_size int, p_retailprice double",
    )
    _write(part, str(tmp_path), "part")
    got = load_all()["record_linkage_fellegi_sunter"].fn(
        spark, str(tmp_path)
    ).collect()
    assert got, "no candidate pairs survived blocking"
    n_dirty = sum(1 for i in range(1, 141) if i % 7 == 0)
    assert sum(r["n_pairs"] for r in got) == n_dirty
    for r in got:
        assert bool(r["is_true"]) is True  # zero false candidates
    # truth pairs agree on brand/type/size and name<=1 edit: with
    # all-true evidence the LLR is positive for every pair
    assert all(r["avg_llr"] > 0 for r in got)


def test_fs_bands_order_truth_on_testdata(spark):
    """On the real corpus: the mean LLR of true pairs exceeds the
    mean LLR of false pairs (the defining FS separation), and every
    'match'-band row with is_true has higher avg score than any
    'non_match' false row."""
    got = load_all()["record_linkage_fellegi_sunter"].fn(spark, SF).collect()
    true_llr = [r["avg_llr"] for r in got if r["is_true"]]
    false_llr = [r["avg_llr"] for r in got if not r["is_true"]]
    assert true_llr and false_llr
    assert min(true_llr) > max(false_llr)


# -- Naive Bayes ------------------------------------------------------------


def test_nb_disjoint_vocabularies_classify_perfectly(spark, tmp_path):
    """Two sources with disjoint vocabularies: the test confusion
    matrix must be purely diagonal."""
    rows = []
    for i in range(20):
        rows.append((i, "alpha beta alpha beta alpha", "en", "srcA", 27))
    for i in range(20, 40):
        rows.append((i, "gamma delta gamma delta gamma", "en", "srcB", 29))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    _write(docs, str(tmp_path), "documents")
    got = load_all()["classifier_naive_bayes_source"].fn(
        spark, str(tmp_path)
    ).collect()
    assert got
    for r in got:
        assert r["true_source"] == r["pred_source"], r
    # every test doc classified: doc_id % 5 == 0 -> 8 test docs
    assert sum(r["n_docs"] for r in got) == 8


# -- Binary sign-Hamming ANN --------------------------------------------------


def test_binary_hamming_recovers_sign_clusters(spark, tmp_path):
    """Three sign-orthogonal clusters of 12 vectors: every query's
    exact top-5 lives in its own cluster, the Hamming shortlist is
    distance-0 within the cluster, so recall@5 must be 1.0."""
    import itertools

    def vec(pattern, jitter_idx):
        # magnitudes vary within the cluster (cosine stays ~1, sign
        # pattern identical); jitter keeps vectors distinct
        return [
            s * (1.0 + 0.01 * jitter_idx + 0.001 * d)
            for d, s in enumerate(pattern)
        ]

    p0 = [1.0] * 64
    p1 = [1.0 if d % 2 == 0 else -1.0 for d in range(64)]
    p2 = [1.0 if d < 32 else -1.0 for d in range(64)]
    rows = []
    vid = itertools.count()
    # vec_id < 10 are queries: interleave clusters so each cluster
    # has queries and enough same-cluster candidates
    for j in range(12):
        for lbl, p in ((0, p0), (1, p1), (2, p2)):
            rows.append((next(vid), vec(p, j), lbl))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    _write(emb, str(tmp_path), "embeddings")
    got = load_all()["embedding_binary_sign_hamming"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 10
    for r in got:
        assert r["recall_at_k"] == 1.0, r


# -- OLS normal equations -----------------------------------------------------


def test_ols_recovers_planted_coefficients_exactly(spark, tmp_path):
    """Per-order revenue planted as y = 10 + 2*x1 + 3*x2 (whole
    dollars) → betas recover exactly and R² = 1."""
    rows = []
    lk = 0
    # (n_lines, qty per line) varied for full column rank
    for ok, (x1, q) in enumerate(
        [(1, 1), (2, 3), (5, 7), (1, 2), (2, 5), (5, 4), (1, 9), (2, 8)]
    ):
        for ln in range(x1):
            lk += 1
            # per-line price: 10/x1 + 2 + 3*q  (x1 divides 10)
            price = 10.0 / x1 + 2.0 + 3.0 * q
            rows.append((ok + 1, ln + 1, float(q), price))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_quantity double,"
        " l_extendedprice double",
    )
    _write(li, str(tmp_path), "lineitem")
    [r] = load_all()["regression_ols_normal_eq"].fn(
        spark, str(tmp_path)
    ).collect()
    assert r["n_orders"] == 8
    assert r["beta0_dollars"] == 10.0
    assert r["beta1_per_item"] == 2.0
    assert r["beta2_per_qty"] == 3.0
    assert r["r2"] == 1.0


# -- GBDT histogram split -----------------------------------------------------


def test_gbdt_finds_pure_split_on_separable_labels(spark, tmp_path):
    """10 short all-positive docs vs 10 long all-negative docs:
    the f_len split must be PURE (children one-class) with gain
    equal to the parent SSE = n·p·(1−p) = 20·0.5·0.5 = 5."""
    lo = "the the the the the the " + "x" * 76   # y=1, f_len=0.5
    hi = "9" * 20 + "y" * 380                     # y=0, f_len=2.0
    rows = [(i, lo, "en", "s", len(lo)) for i in range(10)]
    rows += [(100 + i, hi, "en", "s", len(hi)) for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    _write(docs, str(tmp_path), "documents")
    got = {
        r["feature"]: r
        for r in load_all()["gbdt_histogram_split"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    r = got["f_len"]
    assert r["gain"] == 5.0
    # pure children: one side all-positive, the other all-negative
    assert r["pos_left"] in (0, r["n_left"])
    assert r["pos_right"] in (0, r["n_right"])
    assert r["n_left"] + r["n_right"] == 20


# -- Growth accounting --------------------------------------------------------


def test_lifecycle_recovers_planted_states(spark, tmp_path):
    """u1 active weeks 0,1; u2 week 0 only; u3 weeks 0,2 →
    w0: 3 new; w1: 1 retained, 2 churned; w2: 1 resurrected,
    1 churned; retention(w1) = 1/3."""
    week_us = 604800000000

    def ts(week):
        return dt.datetime(1970, 1, 1) + dt.timedelta(
            microseconds=week * week_us + 3600_000_000
        )

    rows = [
        (1, ts(0), 1, "view", 1.0, "{}"),
        (2, ts(1), 1, "view", 1.0, "{}"),
        (3, ts(0), 2, "view", 1.0, "{}"),
        (4, ts(0), 3, "view", 1.0, "{}"),
        (5, ts(2), 3, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )
    _write(ev, str(tmp_path), "events")
    got = {
        r["week_idx"]: r
        for r in load_all()["events_user_lifecycle"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got[0]["n_new"] == 3 and got[0]["n_churned"] == 0
    assert got[1]["n_retained"] == 1 and got[1]["n_churned"] == 2
    assert got[1]["retention_rate"] == round(1 / 3, 6)
    assert got[2]["n_resurrected"] == 1 and got[2]["n_churned"] == 1


# -- HRW resharding -----------------------------------------------------------


def test_hrw_new_shards_only_receive_moved_keys(spark):
    """Scaling 8 → 10: a doc landing on shard 8 or 9 cannot have
    been there before (old argmax ranged 0-7) — n_stayed must be 0
    there; overall movement stays near the 2/10 HRW bound, far from
    modulo's ~0.8."""
    got = load_all()["shard_rebalance_hrw"].fn(spark, SF).collect()
    assert len(got) == 10
    by = {r["shard"]: r for r in got}
    assert by[8]["n_stayed"] == 0 and by[9]["n_stayed"] == 0
    total = sum(r["n_docs"] for r in got)
    moved = sum(r["n_moved_in"] for r in got)
    assert 0.08 <= moved / total <= 0.40  # ≈0.2 expected


# -- Permutation test ---------------------------------------------------------


def test_permutation_p_value_identity_and_welch_consistency(spark):
    """The add-one p-value identity holds, and t_obs equals the
    Welch workload's lift (same assignment hash, same cents metric,
    same 4dp rounding)."""
    reg = load_all()
    [p] = reg["abtest_permutation_test"].fn(spark, SF).collect()
    assert p["p_value"] == round((p["n_extreme"] + 1) / (p["n_perms"] + 1), 6)
    [w] = reg["abtest_welch_readout"].fn(spark, SF).collect()
    assert p["t_obs"] == w["lift"]
    assert p["n_users"] == w["n_control"] + w["n_treatment"]


# -- misc invariants on the real corpus ---------------------------------------


def test_ooo_cum_share_reaches_one(spark):
    rows = load_all()["events_out_of_order_depth"].fn(spark, SF).collect()
    assert rows[-1]["cum_share"] == 1.0
    assert all(r["n_events"] > 0 for r in rows)


def test_compaction_balance_bounds(spark):
    import math

    for r in load_all()["compaction_plan_advisor"].fn(spark, SF).collect():
        assert r["balance_ratio"] >= 1.0 - 1e-9
        assert r["max_bin_bytes"] <= r["total_bytes"]
        assert r["n_bins"] == max(
            1, math.ceil(r["total_bytes"] / 32768)
        )


def test_decile_lift_identities(spark):
    """Cumulative capture ends at 1.0; lift-weighted sizes reproduce
    the base rate; deciles ordered by score have decreasing capture
    marginal utility only in aggregate (no per-row assert)."""
    rows = load_all()["eval_decile_lift"].fn(spark, SF).collect()
    assert len(rows) == 10
    assert rows[-1]["cum_capture"] == 1.0
    n = sum(r["n"] for r in rows)
    pos = sum(r["n_pos"] for r in rows)
    # sum(lift_k * n_k * base) == total positives (identity)
    base = pos / n
    approx = sum(r["lift"] * r["n"] * base for r in rows)
    assert abs(approx - pos) < 0.01 * pos + 1e-6
