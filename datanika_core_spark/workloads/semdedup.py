"""SemDeDup — semantic deduplication over the `embeddings` table
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): cluster the embedding space with
k-means, then prune near-duplicate *pairs* only WITHIN each cluster,
so the quadratic pairwise-cosine step is bounded by cluster size
instead of corpus size (beyond-reference, SURVEY.md §7 Phase 4).

Scale shape at billions of vectors:
- cluster assignment is map-only against broadcast (literal)
  centroids — the corpus is scanned, never shuffled, exactly like
  `kmeans_lloyd_embeddings`;
- the within-cluster self-join shuffles on `cid` once; with k grown
  proportionally to N (SemDeDup uses k ≈ sqrt(N)), per-cluster
  cardinality stays bounded, so the join stays linear-ish overall
  and never degenerates into the all-pairs product;
- the removal rule is local to a cluster → embarrassingly parallel.

Determinism: centroids are the first K vectors (same seeding as the
k-means workload); distances and cosines use the shared left-fold
formulas from `workloads/similarity.py`, so both engines see
bit-identical doubles before the 6-dp output rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datanika_core_spark.workloads import workload
from datanika_core_spark.workloads.similarity import (
    _DIM,
    _O_SQD,
    _O_VECTORS,
    _S_SQD,
    _o_cos,
    _s_cos,
    _vectors,
)

_SD_K = 8        # coarse clusters (≈ sqrt(N) at real scale)
_SD_TAU = 0.30   # cosine threshold: "semantically duplicate"


def _sd_assign(vecs: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """Map-only argmin assignment against literal centroids
    (broadcast-variable pattern at expression level); ties break on
    centroid id. Mirrors `_o_sd_assign` below operation-for-operation.
    """
    dist_cols = F.array(*[
        F.struct(
            F.expr(_S_SQD.format(
                a="v",
                b=f"array({', '.join(repr(x) + 'd' for x in cvec)})",
            )).alias("dist"),
            F.lit(cid).cast("bigint").alias("cid"),
        )
        for cid, cvec in sorted(cents.items())
    ])
    return vecs.select(
        "vec_id", "v", F.array_min(dist_cols)["cid"].alias("cid")
    )


_O_SD_ASSIGN = f"""
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_O_SQD.format(a='e.v', b='c.cvec', n=_DIM)}, c.cid
           ) AS rn
    FROM vecs e CROSS JOIN cents c
  ) WHERE rn = 1
"""


@workload(
    "semdedup_embedding_prune",
    headline=True,
    oracle=f"""
WITH vecs AS ({_O_VECTORS}),
cents AS (SELECT vec_id AS cid, v AS cvec FROM vecs WHERE vec_id < {_SD_K}),
assigned AS ({_O_SD_ASSIGN}),
pairs AS (
  SELECT a.vec_id AS keeper, b.vec_id AS removed,
         {_o_cos('a.v', 'b.v')} AS c
  FROM assigned a JOIN assigned b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {_o_cos('a.v', 'b.v')} >= {_SD_TAU}
)
SELECT removed, keeper, round(c, 6) AS cos_sim FROM (
  SELECT removed, keeper, c,
         row_number() OVER (PARTITION BY removed
                            ORDER BY c DESC, keeper) AS rn
  FROM pairs
) WHERE rn = 1
ORDER BY removed
""",
)
def semdedup_embedding_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: one k-means assignment pass (k=8, seeded with the
    first k vectors), then within-cluster pairwise cosine; any vector
    with a smaller-id neighbor at cos >= 0.30 is removed, reported
    with its most-similar keeper. Cluster-bounded pair generation —
    the SemDeDup trick that makes semantic dedup feasible at corpus
    scale."""
    vecs = _vectors(spark, sf_dir)
    cents = {
        int(r.vec_id): list(r.v)
        for r in vecs.filter(F.col("vec_id") < _SD_K).collect()
    }
    assigned = _sd_assign(vecs, cents)
    a = assigned.select(
        F.col("vec_id").alias("keeper"), F.col("v").alias("va"), "cid"
    )
    b = assigned.select(
        F.col("vec_id").alias("removed"), F.col("v").alias("vb"), "cid"
    )
    pairs = (
        a.join(b, "cid")
        .filter(F.col("keeper") < F.col("removed"))
        .withColumn("c", F.expr(_s_cos("va", "vb")))
        .filter(F.col("c") >= _SD_TAU)
    )
    w = Window.partitionBy("removed").orderBy(F.col("c").desc(), "keeper")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("removed", "keeper", F.round("c", 6).alias("cos_sim"))
        .orderBy("removed")
    )
