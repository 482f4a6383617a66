"""Streaming embedding ingest vs the persisted IVF index: cross-batch
near-dup rejection, idempotent appends."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.operators.ann_store import IVFIndexStore
from datanika_core_spark.streaming.embed import stream_embed_ingest
from datanika_core_spark.workloads.similarity import _vectors

SF = "/root/testdata/sf0.001"


def test_stream_embed_ingest_rejects_cross_batch_neardups(spark, tmp_path):
    from datanika_core_spark.blocks import persistent_rdd_ids, release_blocks

    for t in ("ivf_stream_idx", "ivf_stream_idx__centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    release_blocks(spark)
    vecs = _vectors(spark, SF).select("vec_id", "v")
    store = IVFIndexStore(spark, "ivf_stream_idx", k=4, iters=1)
    store.train(vecs)

    src = tmp_path / "embed_src"
    src.mkdir()
    base = _vectors(spark, SF).select(
        "vec_id", F.col("v").cast("array<float>").alias("embedding")
    )
    b1 = base.filter(F.col("vec_id") < 50)
    # batch 2: 50 fresh vectors + 5 near-copies of batch-1 vectors
    # (tiny first-component perturbation → cosine ≈ 1)
    dup = base.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CASE WHEN i = 0 "
            "THEN cast(x * 1.0001 as float) ELSE x END)"
        ).alias("embedding"),
    )
    b2 = base.filter(
        (F.col("vec_id") >= 50) & (F.col("vec_id") < 100)
    ).unionByName(dup)
    import shutil

    for name, df in (("f1.parquet", b1), ("f2.parquet", b2)):
        staged = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(staged))
        part = next(staged.glob("part-*.parquet"))
        shutil.copy(part, src / name)

    stats = stream_embed_ingest(
        spark, str(src), store, threshold=0.98,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert stats.arrived == 105
    # exactly the 5 near-copy collisions resolve to one survivor each
    assert stats.rejected_dup == 5
    assert stats.loaded == 100
    assert spark.table("ivf_stream_idx").count() == 100
    # every survivor is unique; rejected ids never landed
    idx_ids = {r.vec_id for r in spark.table("ivf_stream_idx").collect()}
    assert len(idx_ids) == 100
    assert not (idx_ids & set(stats.rejected_ids))
    # block hygiene: each micro-batch frees its own checkpoints
    assert persistent_rdd_ids(spark) == set()
