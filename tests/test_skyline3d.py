"""operators/skyline.skyline_3d: exact parity with brute-force
dominance, the planted case the partition-and-merge shape exists for
(a point whose ONLY dominator lives in a different grid cell — the
local pass alone would wrongly keep it), degenerate single-cell
inputs, and plan hygiene (equi-joins only: no CartesianProduct, no
BroadcastNestedLoopJoin, no unbounded global window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.operators.skyline import skyline_3d


def _brute(points):
    out = []
    for a in points:
        dominated = any(
            b[0] <= a[0] and b[1] <= a[1] and b[2] <= a[2]
            and (b[0] < a[0] or b[1] < a[1] or b[2] < a[2])
            for b in points
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def _planted():
    # anti-chain base: d1 rises while d2 falls → no base point
    # dominates another
    base = [(float(i), float(2000 - i), 500.0) for i in range(0, 2000, 5)]
    a = (1800.0, 1500.0, 100.0)  # dominated by b and ONLY b
    b = (1000.0, 1400.0, 99.0)   # dominates nothing else; on skyline
    return base + [a, b], a, b


def test_matches_brute_force_with_cross_cell_dominator(spark):
    pts, a, b = _planted()
    df = spark.createDataFrame(pts, "d1 double, d2 double, d3 double")
    got = sorted(
        (r["d1"], r["d2"], r["d3"])
        for r in skyline_3d(df, "d1", "d2", "d3").collect()
    )
    want = _brute(pts)
    assert got == want
    assert a not in got and b in got
    # the planted pair spans cells on BOTH axes (same frozen-quantile
    # bucketing the operator uses), so a's only dominator is invisible
    # to the local pass — pruning it proves the cross-cell merge ran
    from datanika_core_spark.operators.ranking import quantile_boundaries

    b1, b2 = quantile_boundaries(df, ["d1", "d2"], n_parts=8)
    cell_a = (sum(x <= a[0] for x in b1), sum(x <= a[1] for x in b2))
    cell_b = (sum(x <= b[0] for x in b1), sum(x <= b[1] for x in b2))
    assert cell_a[0] != cell_b[0] and cell_a[1] != cell_b[1]


def test_extra_columns_ride_along_and_ties_kept(spark):
    # equal triples never dominate each other → both survive with
    # their payloads
    pts = [
        (1.0, 9.0, 5.0, "x"),
        (1.0, 9.0, 5.0, "y"),
        (2.0, 9.0, 5.0, "gone"),  # dominated by both above
        (0.5, 99.0, 99.0, "solo"),
    ]
    df = spark.createDataFrame(pts, "d1 double, d2 double, d3 double, tag string")
    got = sorted(r["tag"] for r in skyline_3d(df, "d1", "d2", "d3").collect())
    assert got == ["solo", "x", "y"]


def test_degenerate_single_cell_and_single_row(spark):
    # constant d1/d2 → empty boundaries → everything in cell (0, 0);
    # the local pass must carry the whole skyline alone
    pts = [(1.0, 1.0, float(v)) for v in (7, 3, 9, 3)]
    df = spark.createDataFrame(pts, "d1 double, d2 double, d3 double")
    got = sorted(
        (r["d1"], r["d2"], r["d3"])
        for r in skyline_3d(df, "d1", "d2", "d3").collect()
    )
    assert got == [(1.0, 1.0, 3.0), (1.0, 1.0, 3.0)]
    one = spark.createDataFrame(
        [(5.0, 5.0, 5.0)], "d1 double, d2 double, d3 double"
    )
    assert skyline_3d(one, "d1", "d2", "d3").count() == 1


def test_maximize_dim_via_negation(spark):
    # minimize d1, maximize d3 (as -d3): (1, 1, 10) beats (1, 1, 2)
    pts = [(1.0, 1.0, 10.0), (1.0, 1.0, 2.0), (0.5, 1.0, 1.0)]
    df = spark.createDataFrame(
        pts, "d1 double, d2 double, v double"
    ).withColumn("d3", -F.col("v"))
    got = sorted(
        (r["d1"], r["d2"], r["v"])
        for r in skyline_3d(df, "d1", "d2", "d3").collect()
    )
    assert got == [(0.5, 1.0, 1.0), (1.0, 1.0, 10.0)]


def test_plan_is_equi_join_only(spark):
    pts, _, _ = _planted()
    df = spark.createDataFrame(pts, "d1 double, d2 double, d3 double")
    sky = skyline_3d(df, "d1", "d2", "d3")
    plan = sky._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    from tools.plan_signals_all import unbounded_global_windows

    assert unbounded_global_windows(sky) == 0
