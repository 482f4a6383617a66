"""Persisted IVF index: train → incremental update → partition-pruned
probe (the ANN twin of test_minhash_store — the 100 TB operating mode
the similarity workloads document)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.operators.ann_store import IVFIndexStore
from datanika_core_spark.workloads.similarity import _vectors

SF = "/root/testdata/sf0.001"


def _store(spark, name) -> IVFIndexStore:
    for t in (name, f"{name}__centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return IVFIndexStore(spark, name, k=4, iters=2)


def test_train_update_probe_roundtrip(spark):
    vecs = _vectors(spark, SF).select("vec_id", "v")
    store = _store(spark, "ivf_idx_rt")
    cents = store.train(vecs)
    assert len(cents) == 4 and all(len(c) == 64 for c in cents.values())

    first = vecs.filter(F.col("vec_id") < 100)
    n1 = store.update(first)
    assert n1 == first.count()
    n2 = store.update(vecs)                   # only the unseen rest
    assert n2 == vecs.count() - n1
    assert store.update(vecs) == 0            # idempotent
    assert spark.table("ivf_idx_rt").count() == vecs.count()

    # a corpus vector queried against the index finds itself first
    q = vecs.filter(F.col("vec_id") == 42).collect()[0]
    out = store.probe([(42, list(q.v))], topk=3, nprobe=1).collect()
    assert out[0].vec_id == 42 and abs(out[0].sim - 1.0) < 1e-9
    assert [r.rank for r in out] == [1, 2, 3]


def test_probe_scan_is_partition_pruned(spark):
    vecs = _vectors(spark, SF).select("vec_id", "v")
    store = _store(spark, "ivf_idx_prune")
    store.train(vecs)
    store.update(vecs)
    q = vecs.limit(1).collect()[0]
    df = store.probe([(int(q.vec_id), list(q.v))], topk=2, nprobe=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the parquet scan must carry a partition filter on cid
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "cid" in seg


def test_multiprobe_recall_not_worse(spark):
    vecs = _vectors(spark, SF).select("vec_id", "v")
    store = _store(spark, "ivf_idx_mp")
    store.train(vecs)
    store.update(vecs)
    queries = [
        (int(r.vec_id), list(r.v))
        for r in vecs.filter(F.col("vec_id") % 97 == 3).limit(5).collect()
    ]
    r1 = store.probe(queries, topk=3, nprobe=1).collect()
    r3 = store.probe(queries, topk=3, nprobe=3).collect()
    # nprobe=3 scans a superset of lists → per-query top-k sims are
    # pointwise >= the nprobe=1 ones
    s1 = {(r.query_id, r.rank): r.sim for r in r1}
    s3 = {(r.query_id, r.rank): r.sim for r in r3}
    assert set(s1) == set(s3)
    assert all(s3[k] >= s1[k] - 1e-12 for k in s1)
