"""Planted-graph pin for the compact-forward triangle kernel
(r11 optimization: graph_triangle_count's wedge-enumeration closure
join was replaced by per-edge oriented-adjacency intersections —
guide §2.3/§2.4). The workload reads lineitem from an sf dir, so the
plants are written as tiny synthetic lineitem.parquet files: every
order is a part-clique in the co-purchase projection, which lets us
plant exact triangle counts by hand.

Covers the cases the join rewrite could plausibly break:
- a triangle and a K4 sharing a vertex (overlap across orders);
- a duplicate edge contributed by two orders (the DISTINCT);
- a pure star (wedges but ZERO closing edges — exercises the
  inner-join drop of dst nodes with no out-neighbors);
- a zero-triangle graph (the coalesce(sum, 0) empty-aggregate path).
"""

from __future__ import annotations

import pytest

from datanika_core_spark.workloads import load_all


def _write_lineitem(spark, tmp_path, orders):
    """orders: list of part-id lists; order k gets l_orderkey = k."""
    rows = [
        (ok, pk)
        for ok, parts in enumerate(orders, start=1)
        for pk in parts
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_planted_triangles_exact(spark, tmp_path):
    # triangle {1,2,3}; K4 {3,4,5,6} (4 triangles, shares node 3);
    # duplicate edge (1,2) from a second order; isolated edge (7,8).
    sf_dir = _write_lineitem(
        spark, tmp_path,
        [[1, 2, 3], [3, 4, 5, 6], [1, 2], [7, 8]],
    )
    row = load_all()["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert row.n_nodes == 8
    assert row.n_edges == 10  # 3 + 6 + 0 (dup) + 1
    assert row.n_triangles == 5  # 1 + C(4,3)
    # degrees: 1:2, 2:2, 3:5, 4:3, 5:3, 6:3, 7:1, 8:1 -> sum C(d,2)
    assert row.n_wedges == 1 + 1 + 10 + 3 + 3 + 3
    assert row.transitivity == pytest.approx(15 / 21, abs=1e-6)


def test_star_has_wedges_but_no_triangles(spark, tmp_path):
    # star around 20: wedges exist, no edge ever closes one, and the
    # triangle aggregate must come back 0 (not null) — the empty-sum
    # path behind coalesce(sum(c), 0).
    sf_dir = _write_lineitem(
        spark, tmp_path,
        [[20, 21], [20, 22], [20, 23]],
    )
    row = load_all()["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert row.n_triangles == 0
    assert row.n_edges == 3
    assert row.n_wedges == 3  # C(3,2) at the hub
    assert row.transitivity == 0.0
