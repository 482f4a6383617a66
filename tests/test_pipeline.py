"""Semantic checks for the end-to-end curation pipeline."""

from __future__ import annotations

from datanika_core_spark.session import read_table
from datanika_core_spark.workloads.pipeline import corpus_curation_pipeline

from tests.conftest import SF_CORRECT


def test_pipeline_covers_corpus_once(spark):
    out = corpus_curation_pipeline(spark, SF_CORRECT)
    rows = out.collect()
    n_base = read_table(
        spark, f"{SF_CORRECT}/documents.parquet"
    ).count()
    n_mutants = sum(1 for r in rows if r.doc_id >= 20000)
    assert len(rows) == n_base + n_mutants
    assert len({r.doc_id for r in rows}) == len(rows), "one verdict/doc"


def test_pipeline_stage_semantics(spark):
    rows = corpus_curation_pipeline(spark, SF_CORRECT).collect()
    by_verdict: dict[str, list] = {}
    for r in rows:
        by_verdict.setdefault(r.verdict, []).append(r)
    # all filter families must actually fire on sf0.01
    for v in ("kept", "lang_filter", "repetition", "near_dup",
              "benchmark_member", "over_quota"):
        assert v in by_verdict, f"stage {v} never fired"
    # precedence: non-en docs are always lang_filter, never anything
    # else
    for r in rows:
        if r.lang != "en":
            assert r.verdict == "lang_filter"
    # benchmark members (base ids) never survive
    for r in by_verdict.get("kept", []):
        assert not (r.doc_id % 40 == 0 and r.doc_id < 20000)
    # quota: kept docs per source stay within budget
    used: dict[str, int] = {}
    for r in sorted(by_verdict["kept"], key=lambda r: r.doc_id):
        used[r.source] = used.get(r.source, 0) + r.tokens
        assert used[r.source] <= 300
