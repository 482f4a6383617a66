"""ANN quality evaluation: IVF recall@k against the exact baseline,
and the nprobe recall/latency knob actually buying recall."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datanika_core_spark.workloads.similarity import (
    _IVF_K,
    _IVF_QHI,
    _IVF_QLO,
    _s_cos,
    _vectors,
    ann_ivf_cosine,
    ann_ivf_cosine_nprobe,
)

from tests.conftest import SF_CORRECT


def _exact_topk(spark, sf_dir):
    vecs = _vectors(spark, sf_dir)
    q = vecs.filter(
        (F.col("vec_id") >= _IVF_QLO) & (F.col("vec_id") < _IVF_QHI)
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    scored = (
        F.broadcast(q)
        .join(vecs.alias("c"), F.col("c.vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("c.vec_id").alias("neighbor_id"),
            F.expr(_s_cos("qv", "v")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return {
        (r.query_id, r.neighbor_id)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _IVF_K)
        .collect()
    }


def test_ivf_nprobe_buys_recall(spark):
    """recall@3(nprobe=3) must strictly beat recall@3(nprobe=1), and
    clear a floor — the whole point of multi-probe."""
    exact = _exact_topk(spark, SF_CORRECT)
    one = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_cosine(spark, SF_CORRECT).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_cosine_nprobe(spark, SF_CORRECT).collect()
    }
    r1 = len(exact & one) / len(exact)
    r3 = len(exact & multi) / len(exact)
    assert r3 > r1, f"nprobe=3 recall {r3} <= nprobe=1 recall {r1}"
    assert r3 >= 0.5, f"nprobe=3 recall too low: {r3}"
    # multi-probe candidates are a superset of single-probe's
    assert one & exact <= multi | one
