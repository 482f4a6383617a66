"""Round-10 planted-signal tests: split_leakage_safe's cluster-keyed
assignment must be NON-VACUOUS (real multi-doc clusters exist, and
every one lands whole on one side) and the cluster keying must be
LOAD-BEARING — the same corpus split per-doc (the broken baseline)
provably straddles clusters, which is exactly the leak
split_leakage_audit exists to report."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.workloads import load_all
from datanika_core_spark.workloads.text_dedup import _spark_hash

SF = "/root/testdata/sf0.001"


def _straddling(labeled) -> int:
    """#clusters whose members span >1 split."""
    return (
        labeled.groupBy("canonical_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )


def test_cluster_keyed_split_keeps_every_cluster_whole(spark):
    out = load_all()["split_leakage_safe"].fn(spark, SF)
    out = out.cache()
    try:
        # non-vacuous: multi-doc clusters exist (the mutant docs)
        multi = (
            out.groupBy("canonical_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        assert multi > 0
        # the guarantee: zero clusters straddle any split boundary
        assert _straddling(out) == 0
        # and all three splits are populated (hash spread sanity)
        assert out.select("split").distinct().count() == 3
    finally:
        out.unpersist()


def test_doc_keyed_split_would_straddle(spark):
    """Re-key the SAME assignment frame per-doc: near-dup mutants
    hash to different sides, so the straddle count goes positive —
    proof the canonical_id key is what prevents leakage, not corpus
    luck (and the non-empty split_leakage_audit registry entry is
    the same fact reported pair-by-pair)."""
    out = load_all()["split_leakage_safe"].fn(spark, SF)
    h = F.expr(_spark_hash("concat('split:', cast(doc_id as string))")) % 100
    rekeyed = out.withColumn(
        "split",
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test"),
    )
    assert _straddling(rekeyed) > 0
