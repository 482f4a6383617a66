"""Plan-quality regression guard: the physical plans of every
headline workload must stay free of accidental cartesian products,
and join-heavy queries must keep their dimension broadcasts. This
pins the properties docs/PLANS.md documents — a plan regression
(lost pushdown, join degrading to nested-loop) fails the suite
instead of silently shipping.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from datanika_core_spark.workloads import load_all

SF = "/root/testdata/sf0.001"

# intentional BroadcastNestedLoop: exact kNN broadcasts the tiny query
# set into a non-equi scan — the documented exact baseline; BM25 and
# the unigram-perplexity scorer cross-join a ONE-row broadcast frame
# (corpus stats / LM prob map) into the scan — a 1-row build side,
# not a quadratic join.
BNL_ALLOWED = {"knn_cosine_topk", "bm25_topk_docs",
               "perplexity_unigram_score",
               # 1-row corpus-size frame (N) broadcast into the scan
               "tfidf_topk_terms",
               # 1-row dangling-mass frame cross-joined per iteration
               "pagerank_event_transitions",
               # 1-row BM25 stats broadcast + a non-equi query-vs-self
               # guard on the tiny semantic branch
               "hybrid_search_rrf",
               # three 1-row summary frames (counts, triangles, open
               # triads) cross-joined for the single output row
               "graph_triangle_count",
               # same shape: 1-row sampled-count/triangles/shared-edge
               # frames cross-joined for the single output row
               "graph_triangle_doulion"}

# queries whose plan must contain dimension broadcasts
MUST_BROADCAST = {
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q10_returned_items",
    "q18_large_orders",
    "dedup_minhash_lsh",
    # benchmark shingle set must broadcast (never shuffle the corpus
    # against it)
    "decontaminate_ngram_overlap",
    # the composite pipeline embeds the same broadcast joins
    "corpus_curation_pipeline",
    # right side semi-pruned via a broadcast of left keys
    "asof_join_click_purchase",
    # the ≤1024-row bloom word table must broadcast into the probe
    "bloom_dedup_incoming_batch",
}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def headline_plans(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plans = {
            name: _plan(wl.fn(spark, SF))
            for name, wl in load_all().items()
            if wl.headline
        }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    return plans


def test_no_cartesian_products(headline_plans):
    offenders = [
        n for n, p in headline_plans.items() if "CartesianProduct" in p
    ]
    assert offenders == []


def test_no_unexpected_nested_loop_joins(headline_plans):
    offenders = [
        n for n, p in headline_plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNL_ALLOWED
    ]
    assert offenders == []


def test_dimension_joins_stay_broadcast(headline_plans):
    missing = [
        n for n in MUST_BROADCAST
        if "BroadcastHashJoin" not in headline_plans[n]
    ]
    assert missing == []


def test_tpch_scans_keep_pushed_filters(headline_plans):
    for name in ("q3_shipping_priority", "q6_forecast_revenue",
                 "q10_returned_items"):
        assert "PushedFilters: [" in headline_plans[name], name
