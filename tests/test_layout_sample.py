"""Sample-mode z-order advisor: the 1%-class hash-sample variant
must land within its stated tolerance of the full-table skip-rate
measurement (the docstring's accuracy contract)."""

from __future__ import annotations

from datanika_core_spark.workloads.layout import (
    zorder_file_skipping,
    zorder_skip_rate_sampled,
)

SF = "/root/testdata/sf0.01"  # ~60k lineitem rows

#: stated tolerance at ~90 sampled rows per file (fraction=0.1,
#: 64 files over ~60k rows) — see zorder_skip_rate_sampled docstring
TOL = 0.05


def _frame_to_map(df):
    return {
        (r["layout"], r["dim"]): (r["avg_span_frac"], r["est_skip_frac"])
        for r in df.collect()
    }


def test_sampled_skip_rate_within_tolerance(spark):
    full = _frame_to_map(zorder_file_skipping(spark, SF))
    samp = _frame_to_map(zorder_skip_rate_sampled(spark, SF, fraction=0.1))
    assert set(full) == set(samp) and len(full) == 4
    for key in full:
        f_span, f_skip = full[key]
        s_span, s_skip = samp[key]
        assert abs(f_span - s_span) <= TOL, (key, f_span, s_span)
        assert abs(f_skip - s_skip) <= TOL, (key, f_skip, s_skip)


def test_sampled_preserves_layout_ranking(spark):
    """The advisor's DECISION signal — z-order beats lexicographic on
    the trailing dimension, and by a wide margin — must survive
    sampling (the ranking is what the rewrite decision thresholds
    on, not the third decimal)."""
    samp = _frame_to_map(zorder_skip_rate_sampled(spark, SF, fraction=0.1))
    z_trail = samp[("zorder", "l_suppkey")][1]
    lex_trail = samp[("lexicographic", "l_suppkey")][1]
    assert z_trail > lex_trail + 0.3


def test_sampled_is_deterministic(spark):
    a = _frame_to_map(zorder_skip_rate_sampled(spark, SF, fraction=0.1))
    b = _frame_to_map(zorder_skip_rate_sampled(spark, SF, fraction=0.1))
    assert a == b
