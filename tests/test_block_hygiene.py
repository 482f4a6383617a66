"""Storage-block hygiene: the round-5 bench died on a driver
broadcast OOM caused by localCheckpoint/cache blocks accumulating
across a long session. These tests pin the fix:

- iterative operators hold O(1) checkpoint sets, not O(iterations);
- driver-state trainers (BPE, PQ) exit with ZERO new pinned blocks;
- ``release_blocks`` sweeps a session back to zero persistent RDDs;
- three back-to-back invocations of the leak-prone workloads hold
  the persistent-block count flat (the repeat-invocation test
  round 4 asked for).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.blocks import (
    RollingCheckpoint,
    persistent_rdd_ids,
    release_blocks,
    scoped_blocks,
)

SF = "/root/testdata/sf0.001"


def test_release_blocks_sweeps_cache_and_checkpoints(spark):
    df = spark.range(100).cache()
    df.count()
    ck = spark.range(50).localCheckpoint(eager=True)
    assert len(persistent_rdd_ids(spark)) >= 2
    release_blocks(spark)
    assert persistent_rdd_ids(spark) == set()
    assert ck is not None  # silence lint; blocks are gone, ck unused


def test_rolling_checkpoint_holds_one_set(spark):
    release_blocks(spark)
    roll = RollingCheckpoint(spark)
    df = spark.range(1000)
    base = len(persistent_rdd_ids(spark))
    for _ in range(5):
        df = roll(df.withColumn("id", F.col("id") + 1))
        # never more than ONE round's blocks pinned
        assert len(persistent_rdd_ids(spark)) - base <= 1
    assert df.agg(F.sum("id")).collect()[0][0] == sum(range(5, 1005))
    roll.release()
    assert len(persistent_rdd_ids(spark)) == base


def test_scoped_blocks_frees_only_inner(spark):
    release_blocks(spark)
    outer = spark.range(10).cache()
    outer.count()
    before = persistent_rdd_ids(spark)
    with scoped_blocks(spark):
        inner = spark.range(20).localCheckpoint(eager=True)
        inner.count()
        assert len(persistent_rdd_ids(spark)) > len(before)
    assert persistent_rdd_ids(spark) == before
    outer.unpersist()


def test_pagerank_blocks_bounded_and_releasable(spark):
    from datanika_core_spark.workloads.graph import pagerank_event_transitions

    release_blocks(spark)
    out = pagerank_event_transitions(spark, SF)
    rows = out.collect()
    assert rows
    # edges + nodes + no_out caches + ONE rolling checkpoint — not
    # one block set per iteration
    assert len(persistent_rdd_ids(spark)) <= 6
    release_blocks(spark)
    assert persistent_rdd_ids(spark) == set()


def test_bpe_learn_merges_leaves_no_blocks(spark, tables):
    from datanika_core_spark.operators.bpe import learn_merges
    from datanika_core_spark.session import read_table

    release_blocks(spark)
    docs = read_table(spark, f"{SF}/documents.parquet").limit(50)
    merges = learn_merges(docs, n_merges=6)
    assert merges
    assert persistent_rdd_ids(spark) == set()


def test_train_pq_leaves_no_blocks(spark):
    from datanika_core_spark.operators.pq import train_pq
    from datanika_core_spark.session import read_table

    release_blocks(spark)
    vecs = (
        read_table(spark, f"{SF}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .limit(64)
    )
    dim = len(vecs.first()["v"])
    cb = train_pq(vecs, dim=dim, m=4, k=4, iters=2)
    assert len(cb) == 4
    assert persistent_rdd_ids(spark) == set()


def test_connected_components_bounded(spark):
    from datanika_core_spark.workloads.curation import connected_components

    release_blocks(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    labels = {
        r["doc_id"]: r["canonical_id"]
        for r in connected_components(edges).collect()
    }
    assert labels[3] == 1 and labels[12] == 10 and labels[21] == 20
    # only the final round's checkpoint survives the call
    assert len(persistent_rdd_ids(spark)) <= 1
    release_blocks(spark)
    assert persistent_rdd_ids(spark) == set()


@pytest.mark.parametrize("wl_name", [
    "pagerank_event_transitions",
    "graph_triangle_doulion",
    "dedup_minhash_lsh",
])
def test_repeat_invocation_storage_flat(spark, wl_name):
    """Three back-to-back invocations with the consumer-side sweep
    between them (exactly bench.py's discipline) hold the persistent
    block count flat at zero — the property whose absence OOM'd the
    round-5 bench session."""
    from datanika_core_spark.workloads import load_all

    wl = load_all()[wl_name]
    release_blocks(spark)
    for _ in range(3):
        df = wl.fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        release_blocks(spark)
        assert persistent_rdd_ids(spark) == set()
