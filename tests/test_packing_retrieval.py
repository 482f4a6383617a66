"""Unit tests for the round-4 tokenizer-side operators: global
prefix sum (operators/ordering.py), sequence packing, sliding-window
chunking, BM25 top-k, and k-means Lloyd training."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datanika_core_spark.operators.ordering import with_global_offset
from datanika_core_spark.workloads import load_all

SF = "/root/testdata/sf0.001"


def test_global_offset_matches_single_partition_window(spark):
    # Ground truth: the naive unpartitioned window on the same data.
    df = spark.range(0, 997).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7919 + 13) % 101).alias("val"),
    )
    got = {
        r.k: r.off
        for r in with_global_offset(df, "k", "val", "off", 8).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.k: r.off
        for r in df.select(
            "k", F.coalesce(F.sum("val").over(w), F.lit(0)).alias("off")
        ).collect()
    }
    assert got == want
    assert got[0] == 0


def test_global_offset_uses_multiple_partitions(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), F.lit(1).alias("val")
    )
    # AQE coalesces the (tiny) test output to one partition; disable
    # coalescing so the partition count reflects the designed layout.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        out = with_global_offset(df, "k", "val", "off", 8)
        npart = out.rdd.getNumPartitions()
    finally:
        spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    assert npart > 1  # not funneled through one task
    # exclusive prefix of all-ones == rank
    rows = out.orderBy("k").collect()
    assert [r.off for r in rows] == list(range(500))


def test_pack_sequences_budget_and_coverage(spark):
    reg = load_all()
    packs = reg["pack_sequences_concat_chunk"].fn(spark, SF).collect()
    assert packs, "no packs produced"
    # pack ids are the contiguous prefix 0..P-1 (concat-and-chunk
    # never leaves a hole: every token window that contains a doc
    # start appears)
    ids = [p.pack_id for p in packs]
    assert ids == sorted(ids)
    assert ids[0] == 0
    # total packed tokens == total corpus tokens
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_tok = docs.select(
        F.sum(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")))
    ).first()[0]
    assert sum(p.pack_tokens for p in packs) == n_tok


def test_doc_chunk_sliding_invariants(spark):
    reg = load_all()
    chunks = reg["doc_chunk_sliding"].fn(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert len(by_doc) == docs  # every doc chunked
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c.chunk_idx)
        assert [c.chunk_idx for c in cs] == list(range(len(cs)))
        # every chunk but the last is full-width
        assert all(c.chunk_len == 64 for c in cs[:-1])
        assert 0 < cs[-1].chunk_len <= 64
        assert all(c.head_tok is not None for c in cs)


def test_bm25_scores_positive_and_ranked(spark):
    reg = load_all()
    rows = reg["bm25_topk_docs"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 15
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_kmeans_partitions_corpus(spark):
    reg = load_all()
    rows = reg["kmeans_lloyd_embeddings"].fn(spark, SF).collect()
    total = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == total  # a partition of the corpus
    assert 1 < len(rows) <= 8
    assert all(r.mean_sq_dist >= 0 for r in rows)
