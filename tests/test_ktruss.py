"""graph_ktruss_bounded's support kernel (_edge_support) on planted
graphs: exact per-edge triangle counts, the defining truss property
(a peel at s_min = 2 keeps the K4 and sheds the lone triangle + the
bridge), and the sum(s) = 3·triangles identity the workload's free
per-round triangle count leans on."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.workloads.graph import _edge_support

#: K4 on {1..4} (every edge in 2 triangles) + triangle {5,6,7}
#: (support 1) + bridge (4,5) (support 0 — in NO triangle).
K4 = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
TRI = [(5, 6), (5, 7), (6, 7)]
BRIDGE = [(4, 5)]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "u bigint, v bigint"
    )


def test_support_exact_on_planted(spark):
    sup = {
        (r["u"], r["v"]): r["s"]
        for r in _edge_support(
            _edges(spark, K4 + TRI + BRIDGE)
        ).collect()
    }
    assert all(sup[e] == 2 for e in K4)
    assert all(sup[e] == 1 for e in TRI)
    assert (4, 5) not in sup  # zero-support edges are omitted


def test_support_sum_is_three_times_triangles(spark):
    sup = _edge_support(_edges(spark, K4 + TRI + BRIDGE))
    total = sup.agg(F.sum("s")).first()[0]
    # K4 has C(4,3)=4 triangles, plus the lone one: 5 -> sum 15
    assert total == 15


def test_peel_at_smin2_keeps_exactly_the_k4(spark):
    """One peel round at s_min = 2 (truss k = 4): the filtered
    support frame IS the surviving edge set — the K4's 6 edges — and
    re-counting support on it shows it is a fixed point."""
    e = _edges(spark, K4 + TRI + BRIDGE)
    surv = _edge_support(e).filter(F.col("s") >= 2).select("u", "v")
    got = sorted((r["u"], r["v"]) for r in surv.collect())
    assert got == sorted(K4)
    again = _edge_support(surv).filter(F.col("s") >= 2).select("u", "v")
    assert sorted((r["u"], r["v"]) for r in again.collect()) == sorted(K4)
