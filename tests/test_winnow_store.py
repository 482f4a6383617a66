"""Winnowing fingerprint store: incremental char-level verbatim-
overlap dedup — cross-batch detection through the persisted index,
new-docs-only fingerprinting, replay idempotency, and a store that
physically cannot re-fingerprint the corpus (it holds no text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.operators.winnow import (
    WN_K,
    WN_W,
    WinnowingFingerprintStore,
    with_fingerprints,
)
from datanika_core_spark.session import read_table

from tests.conftest import SF_SMOKE


def _docs(spark):
    return read_table(spark, f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )


def test_guarantee_on_planted_overlap(spark):
    """Two docs sharing a verbatim >= K+W-1-char substring MUST share
    a fingerprint; unrelated docs built from disjoint alphabets must
    share none."""
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "PREFIX one " + shared + " SUFFIX alpha"),
        (2, "totally different lead-in " + shared + " other tail"),
        (3, "zzz " * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fp = {r.doc_id: set(r.fp) for r in with_fingerprints(df).collect()}
    assert len(shared) >= WN_K + WN_W - 1
    assert fp[1] & fp[2], "guaranteed shared fingerprint missing"
    assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])


def test_store_cross_batch_dedup_and_idempotency(spark):
    docs = _docs(spark)
    store = WinnowingFingerprintStore(spark, "default.winnow_fps_t")
    spark.sql("DROP TABLE IF EXISTS default.winnow_fps_t")

    b0 = docs.filter("doc_id < 100")
    kept0, rejected0 = store.dedup_batch(b0)
    n0 = kept0.count()
    assert n0 > 0

    # batch 1: fresh docs + exact copies of two batch-0 docs under
    # new ids — the copies must be flagged THROUGH THE STORE
    copies = docs.filter("doc_id IN (3, 7)").withColumn(
        "doc_id", F.col("doc_id") + 50000
    )
    b1 = docs.filter(
        "doc_id >= 100 AND doc_id < 200"
    ).unionByName(copies)
    kept1, rejected1 = store.dedup_batch(b1)
    assert {50003, 50007} <= set(rejected1)
    assert kept1.filter("doc_id >= 50000").count() == 0

    # store grew by kept docs only; no text column anywhere
    stored = spark.table("default.winnow_fps_t")
    assert stored.columns == ["doc_id", "f"]
    stored_ids = {r.doc_id for r in stored.select("doc_id").distinct().collect()}
    kept_ids = {r.doc_id for r in kept0.select("doc_id").collect()} | {
        r.doc_id for r in kept1.select("doc_id").collect()
    }
    # short docs (< K+W-1 chars) legitimately contribute no rows
    assert stored_ids <= kept_ids

    # replaying batch 0 through the dedup path is IDEMPOTENT: kept
    # docs are already stored (update's anti-join skips them; the
    # kept set shares < min_shared fingerprints pairwise by
    # construction, so none re-flag), and previously-rejected docs
    # re-reject against their stored originals — the store does not
    # grow. (Raw update() on the full batch WOULD re-admit the
    # rejected ids: update means "index these docs", dedup_batch
    # means "admit if novel".)
    before = stored.count()
    _, rejected_replay0 = store.dedup_batch(b0)
    assert set(rejected_replay0) == set(rejected0)
    assert spark.table("default.winnow_fps_t").count() == before

    # replayed docs match their own stored fingerprints -> rejected
    _, rejected_replay = store.dedup_batch(
        docs.filter("doc_id IN (3, 7)").withColumn(
            "doc_id", F.col("doc_id") + 60000
        )
    )
    assert set(rejected_replay) == {60003, 60007}
    spark.sql("DROP TABLE IF EXISTS default.winnow_fps_t")


def test_match_batch_agrees_with_batch_workload(spark):
    """One-shot store over the near-dup corpus must flag the same
    high-confidence pairs the oracle-paired batch workload reports
    (restricted to cross-group pairs where doc_new > doc_old, the
    store's direction)."""
    from datanika_core_spark.workloads import load_all
    from datanika_core_spark.workloads.text_dedup import _corpus_neardup

    corpus = _corpus_neardup(spark, SF_SMOKE)
    store = WinnowingFingerprintStore(spark, "default.winnow_parity_t")
    spark.sql("DROP TABLE IF EXISTS default.winnow_parity_t")
    store.update(corpus)
    got = {
        (r.doc_new, r.doc_old)
        for r in store.match_batch(corpus).collect()
        if r.doc_new > r.doc_old
    }
    want = {
        (r.doc_b, r.doc_a)
        for r in load_all()["dedup_winnowing_fingerprints"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    assert want <= got  # store sees at least every workload pair
    # and nothing below the shared-fingerprint floor sneaks in: the
    # sets are equal because both use the same K/W/min_shared
    assert got == want
    spark.sql("DROP TABLE IF EXISTS default.winnow_parity_t")
