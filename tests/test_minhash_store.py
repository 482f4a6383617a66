"""Persisted-signature MinHash: incremental update + parity with the
in-flight workload pipeline (VERDICT r1 item 8 — the 100 TB operating
mode the workload docstring promises)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.operators.minhash import MinHashSignatureStore
from datanika_core_spark.workloads.text_dedup import (
    _corpus_neardup,
    dedup_minhash_lsh,
)

SF = "/root/testdata/sf0.001"


def _signable(df):
    """Docs that produce ≥1 shingle (≥3 tokens)."""
    return df.filter(
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 3
    )


def test_incremental_update_signs_only_new_docs(spark):
    spark.sql("DROP TABLE IF EXISTS mh_sigs_inc")
    corpus = _corpus_neardup(spark, SF)
    first = corpus.filter(F.col("doc_id") < 250)
    store = MinHashSignatureStore(spark, "mh_sigs_inc")

    n1 = store.update(first)
    assert n1 == _signable(first).count()
    assert spark.table("mh_sigs_inc").count() == n1

    # second run over the FULL corpus: only unseen docs get signed
    n2 = store.update(corpus)
    assert n2 == _signable(corpus).count() - n1
    assert spark.table("mh_sigs_inc").count() == n1 + n2

    # idempotent: nothing new → nothing signed, nothing appended
    assert store.update(corpus) == 0
    assert spark.table("mh_sigs_inc").count() == n1 + n2
    spark.sql("DROP TABLE IF EXISTS mh_sigs_inc")


def test_store_pairs_match_inflight_workload(spark):
    """Store-backed dedup is bit-identical to the one-shot workload
    (same hash design ⇒ same signatures ⇒ same candidates/pairs)."""
    spark.sql("DROP TABLE IF EXISTS mh_sigs_parity")
    corpus = _corpus_neardup(spark, SF)
    store = MinHashSignatureStore(spark, "mh_sigs_parity")
    store.update(corpus)

    got = {tuple(r) for r in store.pairs(corpus).collect()}
    want = {tuple(r) for r in dedup_minhash_lsh(spark, SF).collect()}
    assert got == want and len(want) > 0
    spark.sql("DROP TABLE IF EXISTS mh_sigs_parity")
