"""Streaming curation: cross-batch dedup against the persisted
signature store, quality gating, idempotent accounting."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from datanika_core_spark.operators.minhash import MinHashSignatureStore
from datanika_core_spark.session import read_table
from datanika_core_spark.streaming.curate import stream_curate

from tests.conftest import SF_SMOKE


def _stage_files(spark, tmp_path):
    """batch 0: docs 0..24. batch 1: docs 25..249 + exact copies of
    docs 0..4 re-keyed to 10000+ (dups vs batch 0, found via the
    store) + one garbage doc (fails the quality gate). batch 2: the
    remaining docs + exact copies of docs 30..32 re-keyed to 11000+
    (dups vs batch 1 — catches stale store reads after append)."""
    docs = read_table(spark, f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    src = tmp_path / "arrivals"
    b0 = docs.filter("doc_id < 25")
    dups1 = (
        docs.filter("doc_id < 5")
        .withColumn("doc_id", F.col("doc_id") + 10000)
    )
    garbage = spark.createDataFrame(
        [(99999, "spam spam", "en", "srcX", 9)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    b1 = (
        docs.filter("doc_id >= 25 AND doc_id < 250")
        .unionByName(dups1)
        .unionByName(garbage)
    )
    dups2 = (
        docs.filter("doc_id >= 30 AND doc_id < 33")
        .withColumn("doc_id", F.col("doc_id") + 11000)
    )
    b2 = docs.filter("doc_id >= 250").unionByName(dups2)
    for i, b in enumerate((b0, b1, b2)):
        b.coalesce(1).write.parquet(str(src / f"f{i}"))
    # flatten: the file stream wants files in ONE dir
    flat = tmp_path / "flat"
    flat.mkdir()
    base_t = 1_700_000_000
    for i in range(3):
        part = next((src / f"f{i}").glob("part-*.parquet"))
        dst = flat / f"batch{i}.parquet"
        shutil.copy(part, dst)
        # FileStreamSource orders batches by mtime, not name — pin
        # strictly increasing times so arrival order is batch0..2
        os.utime(dst, (base_t + i * 60, base_t + i * 60))
    return str(flat), docs.count()


def test_stream_curate_cross_batch_dedup(spark, tmp_path):
    from datanika_core_spark.blocks import persistent_rdd_ids, release_blocks

    path, n_docs = _stage_files(spark, tmp_path)
    store = MinHashSignatureStore(spark, "default.curate_sigs_t")
    spark.sql("DROP TABLE IF EXISTS default.curate_sigs_t")
    spark.sql("DROP TABLE IF EXISTS default.curate_corpus_t")
    release_blocks(spark)

    stats = stream_curate(
        spark,
        path,
        corpus_table="default.curate_corpus_t",
        store=store,
        min_tokens=5,
        max_dup_bigram=0.5,
        checkpoint_dir=str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )

    assert stats.batches == 3
    assert stats.arrived == n_docs + 9  # 5 + 3 dups + 1 garbage
    assert stats.dropped_quality == 1  # the 2-token spam doc
    # every injected exact copy collides with its earlier-batch
    # original through the signature store (the 11000+ set proves
    # appends from batch 1 are visible in batch 2 — no stale reads);
    # the corpus also contains NATURAL >=0.7-Jaccard near-dups,
    # which the operator correctly rejects too (their count is data,
    # not operator behavior)
    injected = {10000 + i for i in range(5)} | {11030, 11031, 11032}
    assert injected <= set(stats.rejected_ids)
    assert stats.dropped_dup >= len(injected)
    kept_expected = stats.arrived - stats.dropped_quality - stats.dropped_dup
    corpus = spark.table("default.curate_corpus_t")
    assert corpus.count() == kept_expected
    assert stats.loaded == kept_expected
    # store holds signatures for exactly the kept docs
    assert spark.table("default.curate_sigs_t").count() == kept_expected
    # no injected dup survived
    assert corpus.filter("doc_id >= 10000").count() == 0
    # block hygiene: every micro-batch freed its own checkpoint
    # blocks at sink exit — a 3-batch stream pins nothing afterwards
    assert persistent_rdd_ids(spark) == set()


def test_verification_shingles_only_candidate_ids(spark):
    """The exact-verification plan must NOT re-shingle the stored
    corpus: the candidate-id semi join has to sit BELOW the shingle
    projection, so only band-colliding rows are shingled. In the
    top-down optimized-plan print, the parent prints first — the
    shingle expression (concat_ws trigram) must therefore appear
    BEFORE the LeftSemi join node, never after it (after would mean
    shingles are computed on the corpus scan under the join)."""
    from datanika_core_spark.streaming.curate import (
        _candidate_old_shingles,
    )

    docs = read_table(spark, f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    cand = spark.createDataFrame(
        [(100, 3), (101, 7)], "doc_new bigint, doc_old bigint"
    )
    out = _candidate_old_shingles(docs, cand)

    # semantics: exactly the candidate old ids, shingled
    rows = {r.doc_old for r in out.select("doc_old").collect()}
    assert rows == {3, 7}

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan
    shingle_pos = plan.index("concat_ws")
    semi_pos = plan.index("LeftSemi")
    assert shingle_pos < semi_pos, (
        "shingle projection must be ABOVE the candidate semi join "
        "(corpus rows outside candidates must not be shingled)"
    )


def test_stream_decontaminate_matches_batch_twin(spark, tmp_path):
    """Stream-static anti-join drops exactly the docs the batch
    decontamination workload flags (same corpus, same bench set)."""
    from pyspark.sql import functions as F

    from datanika_core_spark.operators.minhash import spark_hash_expr
    from datanika_core_spark.streaming.curate import stream_decontaminate
    from datanika_core_spark.streaming.jobs import (
        read_event_stream,
        run_available_now_to_memory,
    )
    from datanika_core_spark.workloads.contamination import (
        _shingle8_spark,
        decontaminate_ngram_overlap,
    )

    docs_path = f"{SF_SMOKE}/documents.parquet"
    docs = read_table(spark, docs_path)

    # static side: distinct bench shingle hashes (doc_id % 40 == 0)
    bench_sh = (
        docs.filter("doc_id % 40 = 0")
        .withColumn(
            "toks", F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        )
        .select(F.explode(F.expr(_shingle8_spark("toks"))).alias("s"))
        .select(F.expr(spark_hash_expr("s")).alias("sh"))
        .distinct()
    )

    sdf = read_event_stream(spark, docs_path)
    out = stream_decontaminate(spark, sdf, bench_sh)
    run_available_now_to_memory(
        out.select("doc_id"), "t_decon", output_mode="append"
    )
    kept_stream = {r.doc_id for r in spark.table("t_decon").collect()}

    # batch twin flags bench members' own shingles too; replicate the
    # stream's semantics: a doc is dropped iff it shares a shingle
    # with the bench set INCLUDING itself when it is a bench member
    flagged = {
        r.doc_id
        for r in decontaminate_ngram_overlap(spark, SF_SMOKE).collect()
        if r.doc_id < 20000  # workload adds injected leak docs
    }
    bench_members = {
        r.doc_id for r in docs.filter("doc_id % 40 = 0").collect()
    }
    expect_dropped = flagged | bench_members  # self-collision drops
    expect_kept = {
        r.doc_id for r in docs.collect()
    } - expect_dropped
    assert kept_stream == expect_kept
    assert bench_members & kept_stream == set()
