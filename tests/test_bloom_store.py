"""Persisted Bloom store: incremental union, no false negatives,
effective rejection of unseen values."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.operators.bloom_store import BloomFilterStore

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.lower(F.trim(F.col("text"))).alias("text"))
        .withColumn("th", F.md5("text"))
    )


def test_incremental_union_has_no_false_negatives(spark):
    spark.sql("DROP TABLE IF EXISTS bf_store_t")
    docs = _docs(spark)
    store = BloomFilterStore(spark, "bf_store_t")

    first = docs.filter(F.col("doc_id") < 100)
    rest = docs.filter(F.col("doc_id") >= 100)
    store.update(first, "th")
    store.update(rest, "th")        # union-merge, old data not rescanned
    assert spark.table("bf_store_t").count() <= 1024

    # EVERY ingested value must pass the probe (no false negatives)
    hits = store.probe(docs, "th", ["doc_id"])
    assert hits.count() == docs.count()


def test_probe_rejects_most_unseen_values(spark):
    spark.sql("DROP TABLE IF EXISTS bf_store_u")
    docs = _docs(spark)
    store = BloomFilterStore(spark, "bf_store_u")
    store.update(docs, "th")

    novel = docs.select(
        "doc_id", F.md5(F.concat(F.col("text"), F.lit(" #unseen"))).alias("th")
    )
    fp = store.probe(novel, "th", ["doc_id"]).count()
    n = novel.count()
    # with m=64Ki bits, k=3 and ~500 inserted values the FP rate is
    # far below 1%; allow generous slack
    assert fp <= max(2, n // 50)


def test_probe_handles_duplicated_input_rows(spark):
    spark.sql("DROP TABLE IF EXISTS bf_store_dup")
    docs = _docs(spark)
    store = BloomFilterStore(spark, "bf_store_dup")
    store.update(docs, "th")
    doubled = docs.unionByName(docs)   # every row twice
    hits = store.probe(doubled, "th", ["doc_id"])
    # still no false negatives: every distinct ingested id passes
    assert hits.count() == docs.count()
