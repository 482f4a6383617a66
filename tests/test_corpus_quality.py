"""Semantic checks for the corpus-quality workloads (the oracle gate
covers value parity; these assert the *properties* the operators
promise)."""

from __future__ import annotations

import math

from datanika_core_spark.workloads.corpus_quality import (
    corpus_filter_funnel,
    corpus_gopher_repetition,
    corpus_mixture_weights,
    pii_redact_injected,
)

from tests.conftest import SF_SMOKE


def test_gopher_repetition_bounds(spark):
    rows = corpus_gopher_repetition(spark, SF_SMOKE).collect()
    assert rows, "empty corpus"
    for r in rows:
        assert 0.0 < r.top_tok_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac < 1.0
        # keep is computed pre-rounding; reconstruct with a rounding
        # epsilon so boundary docs (e.g. true 0.050004 → shown 0.05)
        # don't false-alarm
        eps = 1e-6
        if r.keep:
            assert r.top_tok_frac <= 0.12 + eps
            assert r.dup_bigram_frac <= 0.05 + eps
        else:
            assert (
                r.top_tok_frac > 0.12 - eps or r.dup_bigram_frac > 0.05 - eps
            )
    # thresholds must actually split the corpus (not all-true/false)
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)


def test_filter_funnel_monotonic(spark):
    rows = corpus_filter_funnel(spark, SF_SMOKE).collect()
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True), "funnel must be monotonic"
    assert rows[0].stage == "total" and rows[0].frac == 1.0
    assert rows[-1].n > 0, "every stage should keep some docs"


def test_mixture_weights_normalized(spark):
    rows = corpus_mixture_weights(spark, SF_SMOKE).collect()
    total = sum(r.weight for r in rows)
    assert math.isclose(total, 1.0, abs_tol=1e-3)
    # temperature < 1 compresses: largest bucket's weight share must
    # be smaller than its token share
    tokens = sum(r.tokens for r in rows)
    big = max(rows, key=lambda r: r.tokens)
    assert big.weight < big.tokens / tokens


def test_pii_redaction_complete(spark):
    rows = pii_redact_injected(spark, SF_SMOKE).collect()
    assert rows
    assert sum(r.emails_redacted for r in rows) > 0
    assert sum(r.phones_redacted for r in rows) > 0
    for r in rows:
        assert r.residual_matches == 0, f"PII left in {r.source}"
        assert r.email_docs <= r.n_docs
