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
