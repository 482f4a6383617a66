"""Product quantization (Jégou et al. 2011, "Product Quantization
for Nearest Neighbor Search"): compress a d-dim embedding store to
m sub-codes of log2(k) bits each by running k-means per subspace,
and encode every vector as its per-subspace nearest-codeword ids.

Beyond-reference ANN infrastructure: complements IVFIndexStore
(coarse quantizer / posting lists — operators/ann_store.py) exactly
as in the IVF-PQ index family; embedding_quantize_int8
(workloads/similarity.py) is the scalar-quantization alternative
with a 4× ratio, PQ reaches 32×+ at higher distortion.

Scale design:
- ALL m subspaces train in ONE distributed job per Lloyd iteration:
  vectors explode to (vec_id, sub, subvec) rows once, assignment is
  an argmin against the broadcast (m × k) codebook (tiny — 128 rows
  at the defaults), and the centroid update is a combiner-friendly
  groupBy(sub, cid) mean. No per-subspace driver loop.
- The iteration collects only the codebook (m × k × d/m doubles) to
  the driver — the classic tiny-model / huge-data k-means split, same
  as kmeans_lloyd_embeddings (workloads/similarity.py).
- Deterministic throughout: codewords initialize from the subvectors
  of the k lowest vec_ids and argmin ties break on the lower cid, so
  retrains and the NumPy reference (tests/test_pq.py) reproduce the
  exact codebook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: defaults: 64-d → 8 subspaces × 16 codewords = 8 × 4 bits
M_SUBSPACES = 8
K_CODEWORDS = 16


def _subvectors(vecs: DataFrame, dim: int, m: int) -> DataFrame:
    """(vec_id, v) → (vec_id, sub, subvec) with subvec of dim/m."""
    sub_d = dim // m
    return vecs.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" s -> slice(v, s * {sub_d} + 1, {sub_d}))"
            )
        ).alias("sub", "subvec"),
    )


def _assign_expr(codebook: list[list[list[float]]]) -> str:
    """SQL expr: nearest codeword id for (sub, subvec) against the
    literal codebook — argmin of squared L2, ties to the lower cid.

    The codebook is embedded as a literal nested array (m × k ×
    sub_d); array_position of the min distance implements the
    deterministic lower-cid tiebreak."""
    lit = (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{x!r}D" for x in cw) + ")"
                for cw in sub_cbs
            )
            + ")"
            for sub_cbs in codebook
        )
        + ")"
    )
    dists = (
        f"transform({lit}[sub], cw -> aggregate("
        f" zip_with(subvec, cw, (x, c) -> (x - c) * (x - c)),"
        f" 0d, (a, x) -> a + x))"
    )
    return (
        f"cast(array_position({dists}, array_min({dists})) - 1 as int)"
    )


def init_codebook(
    vecs: DataFrame, dim: int, m: int = M_SUBSPACES, k: int = K_CODEWORDS
) -> list[list[list[float]]]:
    """Deterministic init: codeword c of every subspace is the
    subvector of the vector with the c-th lowest vec_id."""
    seed_rows = (
        _subvectors(
            vecs.orderBy("vec_id").limit(k), dim, m
        )
        .collect()
    )
    ids = sorted({r["vec_id"] for r in seed_rows})
    rank = {vid: i for i, vid in enumerate(ids)}
    codebook = [[None] * k for _ in range(m)]
    for r in seed_rows:
        codebook[r["sub"]][rank[r["vec_id"]]] = list(r["subvec"])
    return codebook


def train_pq(
    vecs: DataFrame,
    dim: int,
    m: int = M_SUBSPACES,
    k: int = K_CODEWORDS,
    iters: int = 4,
) -> list[list[list[float]]]:
    """Lloyd iterations over all subspaces at once; returns the
    trained codebook [m][k][dim/m]. Empty clusters keep their
    previous codeword (standard practice; deterministic)."""
    subs = _subvectors(vecs, dim, m).localCheckpoint(eager=True)
    codebook = init_codebook(vecs, dim, m, k)
    for _ in range(iters):
        assigned = subs.withColumn("cid", F.expr(_assign_expr(codebook)))
        # centroid update as a flat per-dimension sum — NOT a
        # collect_list-then-fold per cluster (whose per-group list is
        # O(cluster size) and dies at scale); this shape is pure
        # combiner-friendly aggregation, result is m*k*sub_d rows
        sums = (
            assigned.select(
                "sub", "cid", F.posexplode("subvec").alias("pos", "x")
            )
            .groupBy("sub", "cid", "pos")
            .agg(F.sum("x").alias("xsum"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_cb = [
            [list(codebook[s][c]) for c in range(k)] for s in range(m)
        ]
        for r in sums:
            new_cb[r["sub"]][r["cid"]][r["pos"]] = r["xsum"] / r["n"]
        codebook = new_cb
    return codebook


def encode(
    vecs: DataFrame, codebook: list[list[list[float]]], dim: int
) -> DataFrame:
    """(vec_id, v) → (vec_id, codes array<int>): each vector's m
    per-subspace nearest-codeword ids — the compressed store. Map-
    only against the broadcast literal codebook."""
    m = len(codebook)
    assigned = _subvectors(vecs, dim, m).withColumn(
        "cid", F.expr(_assign_expr(codebook))
    )
    return (
        assigned.groupBy("vec_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(sub, cid))),"
                " s -> s.cid)"
            ).alias("codes")
        )
    )


def reconstruction_rmse(
    vecs: DataFrame, codebook: list[list[list[float]]], dim: int
) -> DataFrame:
    """Per-vector RMSE between the original and its PQ
    reconstruction (codeword concatenation) — the distortion the
    compression pays, reported the same way as
    embedding_quantize_int8's quality metrics."""
    m = len(codebook)
    sub_d = dim // m
    assigned = _subvectors(vecs, dim, m).withColumn(
        "cid", F.expr(_assign_expr(codebook))
    )
    lit = (
        "array("
        + ", ".join(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{x!r}D" for x in cw) + ")"
                for cw in sub_cbs
            )
            + ")"
            for sub_cbs in codebook
        )
        + ")"
    )
    sq_err = (
        f"aggregate(zip_with(subvec, {lit}[sub][cid],"
        f" (x, c) -> (x - c) * (x - c)), 0d, (a, x) -> a + x)"
    )
    return (
        assigned.withColumn("se", F.expr(sq_err))
        .groupBy("vec_id")
        .agg(
            F.round(F.sqrt(F.sum("se") / dim), 6).alias("rmse")
        )
    )
