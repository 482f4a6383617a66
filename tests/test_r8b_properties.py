"""Planted-signal property tests for the round-8 session-1 operators
(Cramér's V, Ljung-Box, group-sequential, UCB1, pass@k, interval
union, Gopher word rules, CCNet buckets, DSIR importance, RAKE, FFD,
k-core): each constructs an input with a KNOWN answer in a temp
sf-dir (or asserts a structural invariant on the real corpus) — the
behavioral check the DuckDB parity gate cannot give."""

from __future__ import annotations

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


# -- Cramér's V ----------------------------------------------------------------


def test_cramers_v_is_one_under_perfect_association(spark, tmp_path):
    """lang fully determined by source (2×2) → χ² = n and V = 1."""
    rows = [(i, "w", "en" if i < 25 else "de",
             "srcA" if i < 25 else "srcB", 1) for i in range(50)]
    _write(_docs(spark, rows), str(tmp_path), "documents")
    got = load_all()["stats_cramers_v"].fn(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n"] == 50 and r["min_dim"] == 1
    assert r["chi2"] == 50.0
    assert r["cramers_v"] == 1.0


# -- Ljung-Box ------------------------------------------------------------------


def test_ljung_box_exact_rho_on_alternating_series(spark, tmp_path):
    """Perfectly alternating daily counts a,b,a,b over 2m days give
    n-scaled deviations ±d, so ρ_k = ±(n−k)/n EXACTLY — ρ₁ = −19/20
    at 20 days. The cleanest closed-form check of the whole
    autocorrelation path."""
    rows, eid = [], 0
    for d in range(20):
        for _ in range(5 if d % 2 == 0 else 15):
            eid += 1
            rows.append((eid, _day(d), 1, "view", 1.0, "{}"))
    _write(_events(spark, rows), str(tmp_path), "events")
    got = {
        r["lag"]: r
        for r in load_all()["stats_ljung_box"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    for k in got:
        sign = -1 if k % 2 == 1 else 1
        assert got[k]["rho"] == round(sign * (20 - k) / 20, 6), k
    # Q accumulates ρ² — strictly increasing in lag
    qs = [got[k]["q_stat"] for k in sorted(got)]
    assert all(b > a for a, b in zip(qs, qs[1:]))


# -- group-sequential A/B --------------------------------------------------------


def test_group_sequential_crosses_on_planted_effect(spark, tmp_path):
    """Treatment purchases ~50× control: the cumulative Welch z
    dwarfs the O'Brien-Fleming boundary at every look, so the first
    crossing is look 1 and every row reports crossed."""
    users_t = [u for u in range(1, 400) if _ab_variant(u) == 1][:40]
    users_c = [u for u in range(1, 400) if _ab_variant(u) == 0][:40]
    rows, eid = [], 0
    for d in range(10):
        for j in range(4):
            ut, uc = users_t[d * 4 + j], users_c[d * 4 + j]
            eid += 1
            rows.append((eid, _day(d), ut, "purchase",
                         500.0 + (ut % 7), "{}"))
            eid += 1
            rows.append((eid, _day(d), uc, "purchase",
                         10.0 + (uc % 3), "{}"))
    _write(_events(spark, rows), str(tmp_path), "events")
    got = sorted(
        load_all()["abtest_group_sequential"].fn(
            spark, str(tmp_path)
        ).collect(),
        key=lambda r: r["look"],
    )
    assert [r["look"] for r in got] == [1, 2, 3, 4, 5]
    for r in got:
        assert r["z"] > r["boundary"]
        assert bool(r["crossed"]) is True
        assert r["stop_look"] == 1


# -- UCB1 -------------------------------------------------------------------------


def test_ucb1_exploits_the_dominant_arm(spark, tmp_path):
    """Two arms with equal pull counts; 'good' rewards every pull,
    'bad' never → identical exploration bonus, so UCB1 must choose
    'good' on every reported day."""
    rows, eid = [], 0
    for d in range(12):
        for j in range(5):
            eid += 1
            rows.append((eid, _day(d), 1, "good", 100.0, "{}"))
            eid += 1
            rows.append((eid, _day(d), 2, "bad", 1.0, "{}"))
    _write(_events(spark, rows), str(tmp_path), "events")
    got = load_all()["bandit_ucb1_daily_choice"].fn(
        spark, str(tmp_path)
    ).collect()
    assert got
    assert all(r["chosen_arm"] == "good" for r in got)


# -- pass@k -----------------------------------------------------------------------


def test_pass_at_k_exact_on_uniform_tasks(spark, tmp_path):
    """Every task has n=8 trials, c=4 passes → pass@1 = 1/2,
    pass@2 = 11/14, pass@5 = 1 exactly (n−c < 5), and k=10 rows are
    excluded (n < k)."""
    rows, eid = [], 0
    for u in range(1, 11):
        for i in range(8):
            eid += 1
            rows.append(
                (eid, _day(i), u,
                 "purchase" if i < 4 else "view", 1.0, "{}")
            )
    _write(_events(spark, rows), str(tmp_path), "events")
    got = {
        r["k"]: r
        for r in load_all()["eval_pass_at_k"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {1, 2, 5}  # k=10 undefined at n=8
    assert all(r["n_tasks"] == 10 for r in got.values())
    assert got[1]["pass_at_k"] == 0.5
    assert got[2]["pass_at_k"] == round(11 / 14, 6)
    assert got[5]["pass_at_k"] == 1.0


# -- interval union ----------------------------------------------------------------


def test_interval_union_merges_and_splits_islands(spark, tmp_path):
    """Supplier 1: [D,D+6] ∪ [D+3,D+9] → one island, 10 covered
    days, utilization 1. Supplier 2: [D,D+2] ∪ [D+10,D+12] → two
    islands, 6 of 13 span days."""
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", _day(0)),
            (2, 1, 1, 2, 5.0, 1.0, 0.0, 0.0, "N", "O", _day(3)),
            (3, 1, 2, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _day(0)),
            (4, 1, 2, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", _day(10)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    _write(li, str(tmp_path), "lineitem")
    got = {
        r["suppkey"]: r
        for r in load_all()["interval_union_coverage"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    s1, s2 = got[1], got[2]
    assert s1["n_islands"] == 1
    assert s1["covered_days"] == 10
    assert s1["span_days"] == 10
    assert s1["utilization"] == 1.0
    assert s2["n_islands"] == 2
    assert s2["covered_days"] == 6
    assert s2["span_days"] == 13


def test_interval_union_tie_at_island_boundary(spark, tmp_path):
    """Hand-planted tie at an island boundary: after a gap, TWO
    intervals start the same day (lo ties) and the row that sorts
    first by the flag-window key (lo, ok, ln) has the LARGER hi.
    If the island-id running sum used any other ordering (the old
    (lo, hi) key), the smaller-hi twin would sort before the flagged
    row, land in the PREVIOUS island, and bridge the gap —
    overcounting covered_days 14 → 24. Both windows must share the
    (lo, ok, ln) key.

    Intervals (supplier 1): [D, D+2] (q=1), then a 7-day gap, then
    the tie pair [D+10, D+20] (ok=6, q=9 — flagged, bigger hi) and
    [D+10, D+12] (ok=7, q=1 — unflagged, smaller hi).
    Correct: islands {[D,D+2]}, {[D+10,D+20]∪[D+10,D+12]} →
    covered = 3 + 11 = 14 of span 21."""
    li = spark.createDataFrame(
        [
            (5, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _day(0)),
            (6, 1, 1, 1, 9.0, 1.0, 0.0, 0.0, "N", "O", _day(10)),
            (7, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _day(10)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    _write(li, str(tmp_path), "lineitem")
    got = load_all()["interval_union_coverage"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_islands"] == 2
    assert r["covered_days"] == 14
    assert r["span_days"] == 21
    assert r["utilization"] == round(14 / 21, 6)


# -- Gopher word-level rules --------------------------------------------------------


def test_gopher_rules_isolate_each_violation(spark, tmp_path):
    """One doc per source, each violating exactly one rule (or
    none) → the per-source pass rates read as indicator bits."""
    ok = " ".join(["word"] * 38 + ["the", "and"])
    short = "the and foo bar baz"
    longw = " ".join(["extravagantly1x"] * 38 + ["the", "and"])
    numeric = " ".join(["123"] * 30 + ["word"] * 8 + ["the", "and"])
    nostop = " ".join(["word"] * 40)
    rows = [
        (1, ok, "en", "s_ok", len(ok)),
        (2, short, "en", "s_short", len(short)),
        (3, longw, "en", "s_longw", len(longw)),
        (4, numeric, "en", "s_num", len(numeric)),
        (5, nostop, "en", "s_nostop", len(nostop)),
    ]
    _write(_docs(spark, rows), str(tmp_path), "documents")
    got = {
        r["source"]: r
        for r in load_all()["quality_gopher_wordlevel"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert got["s_ok"]["pass_all"] == 1.0
    assert got["s_short"]["pass_len"] == 0.0
    assert got["s_short"]["pass_word_len"] == 1.0
    assert got["s_longw"]["pass_word_len"] == 0.0
    assert got["s_longw"]["pass_len"] == 1.0
    assert got["s_num"]["pass_alpha"] == 0.0
    assert got["s_nostop"]["pass_stopword"] == 0.0
    for s in ("s_short", "s_longw", "s_num", "s_nostop"):
        assert got[s]["pass_all"] == 0.0


# -- CCNet buckets -------------------------------------------------------------------


def test_ccnet_bucket_means_are_monotone(spark):
    """head = lowest perplexity by construction: within every
    language the bucket mean perplexities must be nondecreasing,
    and bucket doc counts are equal-count ntiles (±1)."""
    rows = load_all()["ccnet_perplexity_buckets"].fn(spark, SF).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["bucket"])
        ppls = [r["avg_ppl"] for r in rs]
        assert ppls == sorted(ppls), lang
        counts = [r["n_docs"] for r in rs]
        assert max(counts) - min(counts) <= 1, lang


# -- DSIR importance -------------------------------------------------------------------


def test_dsir_upweights_target_like_documents(spark, tmp_path):
    """Two non-English docs: one written in the English slice's
    vocabulary, one in an alien vocabulary → the target-like doc
    must carry the higher per-token DSIR weight (and rank first)."""
    vocab = [f"eng{i}" for i in range(30)]
    rows = [
        (i, " ".join(vocab[(i * 3 + j) % 30] for j in range(40)),
         "en", "srcA", 160)
        for i in range(8)
    ]
    rows.append(
        (100, " ".join(vocab[j % 30] for j in range(40)),
         "de", "srcB", 160)
    )
    rows.append(
        (101, " ".join(f"zz{j}" for j in range(40)), "de", "srcB", 160)
    )
    _write(_docs(spark, rows), str(tmp_path), "documents")
    got = {
        r["doc_id"]: r
        for r in load_all()["curation_dsir_importance"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {100, 101}  # only non-target docs are ranked
    assert got[100]["dsir_weight"] > got[101]["dsir_weight"]
    assert got[100]["rank"] < got[101]["rank"]


# -- RAKE -----------------------------------------------------------------------------


def test_rake_finds_planted_keyphrase(spark, tmp_path):
    """'deep learning' repeats between stopword separators in every
    doc — it must surface as the top phrase with the full occurrence
    count, beating the lone single words."""
    text = ("deep learning is the deep learning of deep learning"
            " and training")
    rows = [(i, text, "en", "s", len(text)) for i in range(5)]
    _write(_docs(spark, rows), str(tmp_path), "documents")
    got = load_all()["text_keyphrase_rake"].fn(
        spark, str(tmp_path)
    ).collect()
    top = min(got, key=lambda r: r["rank"])
    assert top["phrase"] == "deep learning"
    assert top["occurrences"] == 15  # 3 per doc × 5 docs
    assert top["n_words"] == 2


# -- FFD compaction ---------------------------------------------------------------------


def test_ffd_packs_known_sizes_exactly(spark, tmp_path):
    """Sizes 1000/600/500/400/300, cap = 2·1000: FFD fills bin 1 to
    exactly 2000 (1000+600+400) and bin 2 to 800 (500+300)."""
    rows = [
        (1, "x", "en", "s1000", 1000),
        (2, "x", "en", "s600", 600),
        (3, "x", "en", "s500", 500),
        (4, "x", "en", "s400", 400),
        (5, "x", "en", "s300", 300),
    ]
    _write(_docs(spark, rows), str(tmp_path), "documents")
    got = {
        r["source"]: r
        for r in load_all()["pack_ffd_compaction"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert {s: r["bin_id"] for s, r in got.items()} == {
        "s1000": 1, "s600": 1, "s400": 1, "s500": 2, "s300": 2,
    }
    assert got["s1000"]["bin_load"] == 2000
    assert got["s500"]["bin_load"] == 800
    assert all(r["n_bins"] == 2 for r in got.values())


# -- bounded k-core -----------------------------------------------------------------------


def test_kcore_peel_is_monotone_on_real_corpus(spark):
    """Per-round node/edge counts never increase, K is constant,
    and a converged peel means the last two rounds agree."""
    rows = sorted(
        load_all()["graph_kcore_bounded"].fn(spark, SF).collect(),
        key=lambda r: r["round"],
    )
    assert rows
    assert len({r["k"] for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]
    if bool(rows[-1]["converged"]):
        assert rows[-1]["n_nodes"] == rows[-2]["n_nodes"]
        assert rows[-1]["n_edges"] == rows[-2]["n_edges"]
