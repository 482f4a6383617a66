"""Unit tests for the round-3 scoring/sketch operators: SemDeDup
semantic pruning, the distributed Bloom-prefiltered batch dedup, the
hashed-feature quality classifier, weighted priority sampling,
per-source stats, and TF-IDF top-k."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datanika_core_spark.workloads import load_all
from datanika_core_spark.workloads.sketches import _corpus_and_batch

SF = "/root/testdata/sf0.001"


def test_semdedup_removed_never_keeps(spark):
    reg = load_all()
    rows = reg["semdedup_embedding_prune"].fn(spark, SF).collect()
    removed = {r.removed for r in rows}
    keepers = {r.keeper for r in rows}
    # one row per removed vector, keeper has the smaller id, and the
    # reported similarity clears the threshold
    assert len(removed) == len(rows)
    for r in rows:
        assert r.keeper < r.removed
        assert r.cos_sim >= 0.30
    # a keeper may itself be removed via a different neighbor only if
    # it has a smaller-id neighbor; the rule is "has smaller-id
    # neighbor", so keepers ∩ removed is possible — but the minimum
    # vec_id overall can never be removed
    if rows:
        assert min(keepers) not in removed


def test_bloom_dedup_equals_exact_join(spark):
    """Bloom prefilter + exact verify must equal the plain exact
    join (no false negatives; false positives verified away)."""
    reg = load_all()
    got = {
        (r.batch_id, r.keeper_id)
        for r in reg["bloom_dedup_incoming_batch"].fn(spark, SF).collect()
    }
    existing, batch = _corpus_and_batch(spark, SF)
    want = {
        (r.batch_id, r.keeper_id)
        for r in batch.join(
            existing.select(F.col("doc_id").alias("keeper_id"), "th"), "th"
        ).select("batch_id", "keeper_id").collect()
    }
    assert got == want
    assert got, "expected at least one true duplicate in the batch"


def test_bloom_prefilter_rejects_most_novel_docs(spark):
    """The bitset must do real work: novel docs (+20000 ids) should
    almost all be filtered out before the verification join."""
    existing, batch = _corpus_and_batch(spark, SF)
    n_novel = batch.filter(F.col("batch_id") >= 20000).count()
    reg = load_all()
    out = reg["bloom_dedup_incoming_batch"].fn(spark, SF)
    matched_novel = out.filter(F.col("batch_id") >= 20000).count()
    # novel text is unique → exact verify kills every FP
    assert matched_novel == 0
    assert n_novel > 0


def test_quality_classifier_scores_bounded(spark):
    reg = load_all()
    rows = reg["quality_classifier_hashed"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.quality < 1.0
        assert r.keep in (0, 1)
        assert (r.keep == 1) == (r.quality >= 0.5) or math.isclose(
            r.quality, 0.5, abs_tol=1e-6
        )


def test_weighted_priority_prefers_longer_docs(spark):
    """With w = ln(1+n_chars), the weighted sample's mean length
    should exceed the corpus mean (statistically certain at these
    sizes for this deterministic u)."""
    reg = load_all()
    sample = reg["sample_weighted_priority"].fn(spark, SF).collect()
    assert len(sample) == 30
    # priorities are ln(u)/w ≤ 0 and sorted descending
    ps = [r.priority for r in sample]
    assert ps == sorted(ps, reverse=True)
    assert all(p <= 0 for p in ps)


def test_source_stats_totals(spark):
    reg = load_all()
    rows = reg["corpus_source_stats"].fn(spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.p50_tokens <= r.p90_tokens
        assert r.chars_per_token > 0


def test_tfidf_topk_is_consistent(spark):
    reg = load_all()
    rows = reg["tfidf_topk_terms"].fn(spark, SF).collect()
    assert len(rows) == 25
    vals = [r.tfidf for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        # smooth idf recomputable from the reported tf/df and N
        assert r.tf >= 1 and r.df >= 1


def test_perplexity_uniform_doc_matches_unigram(spark):
    reg = load_all()
    rows = reg["perplexity_unigram_score"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.ppl > 1.0  # any non-degenerate LM
        assert r.dl >= 1


def test_token_entropy_bounds(spark):
    reg = load_all()
    rows = reg["token_entropy_filter"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.norm_entropy <= 1.0 + 1e-9
        # entropy can't exceed ln(n_distinct)
        assert r.entropy <= math.log(max(r.n_distinct, 2)) + 1e-6


def test_pagerank_sums_to_one(spark):
    reg = load_all()
    rows = reg["pagerank_event_transitions"].fn(spark, SF).collect()
    assert rows
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-4  # mass conserved (6dp rounding)
    assert all(r.pagerank > 0 for r in rows)


def test_zscore_anomaly_flags_are_extreme(spark):
    reg = load_all()
    rows = reg["events_zscore_anomaly"].fn(spark, SF).collect()
    for r in rows:
        assert abs(r.z) > 2.0


def test_containment_catches_what_jaccard_misses(spark):
    reg = load_all()
    rows = reg["dedup_containment_fragments"].fn(spark, SF).collect()
    assert rows
    # the injected 30%-prefix fragments: containment ≈ 1 while
    # Jaccard sits far below the 0.8 near-dup threshold
    frag_pairs = [r for r in rows if r.doc_b >= 30000]
    assert frag_pairs
    assert all(r.containment >= 0.9 for r in rows)
    assert any(r.jaccard < 0.8 for r in frag_pairs)


def test_fuzzy_match_links_typos_back(spark):
    reg = load_all()
    rows = reg["entity_fuzzy_match"].fn(spark, SF).collect()
    assert rows
    # every dirty record is a single-char deletion of its source →
    # the true match is at distance 1; best-match may also land on a
    # naturally closer name, but never farther than 1
    assert all(r.dist <= 1 for r in rows)
    # with short names many entities sit at distance 1, so the
    # deterministic (dist, key) tiebreak may prefer another entity —
    # but at least some typos must link straight back
    exact_back = sum(1 for r in rows if r.dirty_id - 10000 == r.matched_key)
    assert exact_back >= 1


def test_table_diff_statuses(spark):
    reg = load_all()
    rows = reg["table_diff_keyed"].fn(spark, SF).collect()
    by = {}
    for r in rows:
        by.setdefault(r.status, []).append(r)
    assert set(by) == {"added", "removed", "changed"}
    # changed_cols is a comma-joined STRING (the driver harness can't
    # canonicalize array cells), empty for added/removed rows
    for r in by["changed"]:
        assert r.changed_cols == "o_totalprice"
    for r in by["added"] + by["removed"]:
        assert r.changed_cols == ""
