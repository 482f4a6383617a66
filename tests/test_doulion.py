"""DOULION edge-sampled triangle count: the estimate must land
within its OWN reported standard-error bound (×5) of the exact
count, at every SF — the self-measuring contract. The bound includes
the shared-edge covariance term (the leading-term-only bound
underestimates ~8x on the dense sf0.001 graph)."""

from __future__ import annotations

import pytest

from datanika_core_spark.workloads import load_all


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
)
def test_doulion_within_reported_bound(spark, sf_dir):
    reg = load_all()
    est = reg["graph_triangle_doulion"].fn(spark, sf_dir).collect()[0]
    exact = reg["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert exact.n_triangles > 0
    rel_err = (
        abs(est.est_triangles - exact.n_triangles) / exact.n_triangles
    )
    assert rel_err <= 5 * est.rel_stderr_bound, (
        rel_err,
        est.rel_stderr_bound,
    )
    # unbiasedness sanity: the scale-up is exactly 1/p^3 in BIGINT
    assert est.est_triangles == est.tri_sampled * 64


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
)
def test_doulion_multi_p_nested_and_within_bounds(spark, sf_dir):
    reg = load_all()
    rows = {
        r.p_denom: r
        for r in reg["graph_triangle_doulion_multi_p"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {4, 16}
    exact = reg["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    # the p=1/4 leg must equal graph_triangle_doulion exactly (same
    # coin, same sample — the nested pass adds no noise to it)
    single = reg["graph_triangle_doulion"].fn(spark, sf_dir).collect()[0]
    assert rows[4].tri_sampled == single.tri_sampled
    assert rows[4].est_triangles == single.est_triangles
    # nesting: the 1/16 sample is a subset of the 1/4 sample
    assert rows[16].n_edges_sampled <= rows[4].n_edges_sampled
    assert rows[16].tri_sampled <= rows[4].tri_sampled
    for p, scale in ((4, 64), (16, 4096)):
        r = rows[p]
        assert r.est_triangles == r.tri_sampled * scale
        rel_err = abs(r.est_triangles - exact.n_triangles) / exact.n_triangles
        assert rel_err <= 5 * r.rel_stderr_bound, (p, rel_err, r.rel_stderr_bound)
