"""Semantic checks for benchmark decontamination."""

from __future__ import annotations

from datanika_core_spark.session import read_table
from datanika_core_spark.workloads.contamination import (
    decontaminate_ngram_overlap,
)

from tests.conftest import SF_SMOKE


def test_all_injected_leaks_flagged(spark):
    out = decontaminate_ngram_overlap(spark, SF_SMOKE)
    flagged = {r.doc_id for r in out.collect()}
    docs = read_table(spark, f"{SF_SMOKE}/documents.parquet")
    bench_ids = [
        r.doc_id for r in docs.filter("doc_id % 40 = 0").collect()
    ]
    assert bench_ids, "no benchmark docs at this sf"
    for b in bench_ids:
        assert b + 30000 in flagged, f"leaked quote of {b} not flagged"


def test_clean_docs_not_flagged(spark):
    """Flagged set must stay a small fraction of the corpus (the
    operator flags collisions, not everything)."""
    out = decontaminate_ngram_overlap(spark, SF_SMOKE)
    n_corpus = read_table(spark, f"{SF_SMOKE}/documents.parquet").count()
    assert out.count() < 0.2 * n_corpus
