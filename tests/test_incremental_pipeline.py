"""End-to-end incremental curation+index pipeline: two batches flow
through ALL the persistent stores — exact-dup Bloom prefilter,
MinHash signature index, curated warehouse table, IVF-PQ vector
index — and the second batch must pay only new-data cost everywhere.

This is the integration proof of the 100 TB operating mode each
store documents individually: nothing re-reads, re-signs, re-encodes
or re-scans the first batch when the second arrives.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.operators.bloom_store import BloomFilterStore
from datanika_core_spark.operators.minhash import MinHashSignatureStore
from datanika_core_spark.operators.pq import IVFPQIndexStore
from datanika_core_spark.operators.writers import TableWriter, drop_table
from datanika_core_spark.session import read_table

SF = "/root/testdata/sf0.001"

TABLES = [
    "t_pipe_bloom", "t_pipe_sigs", "t_pipe_curated",
    "t_pipe_ivfpq", "t_pipe_ivfpq__pq_codebook",
    "t_pipe_ivfpq__coarse", "t_pipe_ivfpq__coarse__centroids",
]


@pytest.fixture()
def clean_tables(spark):
    for t in TABLES:
        drop_table(spark, t)
    yield
    for t in TABLES:
        drop_table(spark, t)


def _curate_batch(spark, docs, bloom, sigs, writer):
    """One pipeline pass: Bloom-prefiltered exact dedup vs everything
    already CURATED, quality length filter, then admit; update the
    stores with what was admitted."""
    batch = docs.withColumn(
        "h", F.md5(F.lower(F.trim(F.col("text"))))
    )
    if spark.catalog.tableExists("t_pipe_curated"):
        maybe_dup = bloom.probe(batch, "h", ["doc_id", "h"])
        # exact verify ONLY the Bloom survivors
        dup_ids = (
            maybe_dup.join(
                spark.table("t_pipe_curated").select(
                    F.col("h").alias("h2")
                ).distinct(),
                F.col("h") == F.col("h2"),
                "inner",
            ).select("doc_id")
        )
        batch = batch.join(dup_ids, "doc_id", "left_anti")
    # materialize BEFORE mutating the stores the plan reads: the
    # lazy `admitted` embeds the Bloom-probe subtree, and
    # sigs.update would re-execute it AFTER bloom.update replaced
    # the bitset table's files (FILE_NOT_EXIST) — same
    # stage-then-mutate rule as the incremental materializer
    # (plans/materialize.py sync_all_columns)
    admitted = (
        batch.filter(F.length("text") >= 40)
        .select("doc_id", "text", "h")
        .localCheckpoint(eager=True)
    )
    n = writer.write(admitted, "t_pipe_curated", "append").rows_loaded
    bloom.update(admitted, "h")
    n_signed = sigs.update(admitted)
    return n, n_signed


def test_two_batch_incremental_pipeline(spark, clean_tables):
    docs = read_table(spark, f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    n_total = docs.count()
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    # batch 2 = the other half PLUS a replay of batch 1 (the crawler
    # re-fetch case) — the replayed half must dedup away
    b2 = docs.filter(F.col("doc_id") % 2 == 1).unionByName(b1)

    writer = TableWriter(spark)
    bloom = BloomFilterStore(spark, "t_pipe_bloom")
    sigs = MinHashSignatureStore(spark, "t_pipe_sigs")

    n1, signed1 = _curate_batch(spark, b1, bloom, sigs, writer)
    assert n1 == b1.filter(F.length("text") >= 40).count()

    n2, signed2 = _curate_batch(spark, b2, bloom, sigs, writer)
    # replayed batch-1 docs are exact dups of curated rows -> dropped;
    # only the odd half's quality-pass docs are admitted
    odd_ok = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .filter(F.length("text") >= 40)
        .count()
    )
    assert n2 == odd_ok
    # signature store signed only the newly admitted docs
    assert signed2 <= n2  # (<=: docs with <3 tokens sign nothing)
    assert spark.table("t_pipe_curated").count() == n1 + n2
    # no doc curated twice
    assert (
        spark.table("t_pipe_curated").select("doc_id").distinct().count()
        == n1 + n2
    )

    # vector index: same two-batch shape over embeddings
    vecs = read_table(spark, f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    v1 = vecs.filter(F.col("vec_id") % 2 == 0)
    v2 = vecs  # includes v1 — must be skipped incrementally
    store = IVFPQIndexStore(spark, "t_pipe_ivfpq", dim=64, iters=1)
    store.train(v1)
    k1 = store.update(v1)
    k2 = store.update(v2)
    assert k1 == v1.count()
    assert k2 == vecs.count() - v1.count()
    assert store.update(v2) == 0
