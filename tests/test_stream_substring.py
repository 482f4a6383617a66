"""Streaming exact-substring dedup twin: at-arrival report parity
with independently computed one-shot spans per arrival prefix,
full-store one-shot parity after the drain, and idempotent replay
(fresh checkpoint → 0 new gram rows, 0 new report rows)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from datanika_core_spark.operators.substring_store import (
    ExactSubstringIndexStore,
)
from datanika_core_spark.operators.writers import drop_table
from datanika_core_spark.streaming.substring import stream_exact_substring
from datanika_core_spark.workloads.text_dedup import (
    _corpus_neardup,
    _exact_dup_spans,
)

SF = "/root/testdata/sf0.001"


def _stage_files(spark, tmp_path):
    """Two arrival files cut at doc_id 250: file 0 = first half of
    the base docs, file 1 = second half + the injected near-dup
    mutants (the batch workload's arrival order, collapsed to two
    files)."""
    corpus = _corpus_neardup(spark, SF).select("doc_id", "text")
    src = tmp_path / "arrivals"
    parts = (
        corpus.filter("doc_id < 250"),
        corpus.filter("doc_id >= 250"),
    )
    for i, b in enumerate(parts):
        b.coalesce(1).write.parquet(str(src / f"f{i}"))
    flat = tmp_path / "flat"
    flat.mkdir()
    base_t = 1_700_000_000
    for i in range(2):
        part = next((src / f"f{i}").glob("part-*.parquet"))
        dst = flat / f"batch{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (base_t + i * 60, base_t + i * 60))
    return str(flat), corpus


def _report(spans, docs):
    """{doc_id: (n_spans, covered_chars)} for every eligible doc of
    ``docs`` (len >= 20), zero-filled — the twin's report mirrors
    every indexed doc, not just the dup ones."""
    out = {
        r["doc_id"]: (0, 0)
        for r in docs.filter(F.length("text") >= 20)
        .select("doc_id").collect()
    }
    out.update({
        r["doc_id"]: (r["n"], r["cov"])
        for r in spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("hi") - F.col("lo") + 1).alias("cov"),
        )
        .collect()
    })
    return out


def test_stream_substring_at_arrival_and_full_parity(spark, tmp_path):
    for tbl in ("st_es", "st_es_docs", "st_es_hsum", "st_es_hsum_stage",
                "st_es_report"):
        drop_table(spark, tbl)
    path, corpus = _stage_files(spark, tmp_path)
    store = ExactSubstringIndexStore(spark, "st_es")
    stats = stream_exact_substring(
        spark, path, store, "st_es_report",
        checkpoint_dir=str(tmp_path / "ck_es"),
    )
    assert stats.batches >= 2 and stats.arrived == corpus.count()
    assert stats.gram_rows_indexed > 0

    # at-arrival expectations, computed INDEPENDENTLY of the store:
    # file-0 docs dedup against file 0 alone; file-1 docs against
    # the whole corpus (file 0 ∪ file 1 — everything ingested by
    # their arrival)
    first = corpus.filter("doc_id < 250")
    want = _report(_exact_dup_spans(first), first)
    full_spans = _exact_dup_spans(corpus)
    later = corpus.filter("doc_id >= 250")
    want.update({
        d: v
        for d, v in _report(
            full_spans.join(
                later.select("doc_id"), "doc_id", "left_semi"
            ),
            later,
        ).items()
    })
    got = {
        r["doc_id"]: (r["n_spans"], r["covered_chars"])
        for r in spark.table("st_es_report").collect()
    }
    assert got == want
    assert stats.report_rows == len(got)
    # the at-arrival report and the retroactive readout genuinely
    # differ: some file-0 doc has 0 spans at arrival but spans now
    retro = {r["doc_id"] for r in full_spans.collect()}
    assert any(d < 250 and got[d] == (0, 0) for d in retro if d in got)

    # retroactive full readout: one-shot parity (d < 250 docs whose
    # dups only arrived in file 1 appear HERE, not in the report)
    got_full = sorted(
        (r["doc_id"], r["lo"], r["hi"]) for r in store.spans().collect()
    )
    want_full = sorted(
        (r["doc_id"], r["lo"], r["hi"]) for r in full_spans.collect()
    )
    assert got_full == want_full

    # replay from a fresh checkpoint: file-level re-read, row-level
    # no-op — 0 gram rows appended, 0 report rows added
    stats2 = stream_exact_substring(
        spark, path, store, "st_es_report",
        checkpoint_dir=str(tmp_path / "ck_es2"),
    )
    assert stats2.gram_rows_indexed == 0
    assert stats2.report_rows == 0
    got2 = {
        r["doc_id"]: (r["n_spans"], r["covered_chars"])
        for r in spark.table("st_es_report").collect()
    }
    assert got2 == got
