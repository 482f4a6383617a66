"""Curation operators: connected-components propagation depth and
determinism of the stratified sampler (the oracle corpus mostly has
2-node dup components, so multi-hop chains are covered here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.workloads.curation import (
    connected_components,
    sample_stratified_deterministic,
)


def test_connected_components_multi_hop_chain(spark):
    # chain 1-2-3-4 and a separate pair 10-11, plus triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a bigint, doc_b bigint",
    )
    got = {
        (r.doc_id, r.canonical_id)
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_long_path_converges(spark):
    # path of 12 nodes — forces several propagation rounds
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a bigint, doc_b bigint"
    )
    out = connected_components(edges)
    assert out.filter(F.col("canonical_id") != 0).count() == 0
    assert out.count() == n + 1


def test_stratified_sample_deterministic_across_runs(spark, sf_dir):
    a = sample_stratified_deterministic(spark, sf_dir).collect()
    b = sample_stratified_deterministic(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # every stratum's sample is a subset bounded by its total
    for r in a:
        assert 0 <= r.n_sampled <= r.n_total


def test_split_leakage_safe_clusters_never_span_splits(spark):
    from datanika_core_spark.workloads import load_all

    rows = load_all()["split_leakage_safe"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.canonical_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    splits = {r.split for r in rows}
    assert splits <= {"train", "val", "test"}
    # the hash split should produce a roughly-80/10/10 partition
    n = len(rows)
    n_train = sum(1 for r in rows if r.split == "train")
    assert 0.6 * n < n_train < 0.95 * n


def test_contrastive_triplets_are_leakage_free(spark):
    from datanika_core_spark.workloads import load_all
    from datanika_core_spark.workloads.curation import connected_components
    from datanika_core_spark.workloads.text_dedup import dedup_minhash_lsh

    sf = "/root/testdata/sf0.001"
    rows = load_all()["contrastive_pairs_mined"].fn(spark, sf).collect()
    assert rows
    pairs = dedup_minhash_lsh(spark, sf).select("doc_a", "doc_b")
    canon = {
        r.doc_id: r.canonical_id
        for r in connected_components(pairs).collect()
    }
    for r in rows:
        a = canon.get(r.anchor, r.anchor)
        n = canon.get(r.negative, r.negative)
        assert a != n                     # negative outside anchor cluster
        assert canon.get(r.positive, r.positive) == a  # positive inside
        assert r.neg_no in (0, 1)
