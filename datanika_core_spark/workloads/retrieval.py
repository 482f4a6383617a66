"""Lexical retrieval scoring over the `documents` table — BM25
top-k, the classic retrieval-based curation/filter primitive for
training-data pipelines (beyond-reference, SURVEY.md §7 Phase 4).

Shape at 100 TB: term frequencies are per-row array folds (map-only,
inside the scan stage); the corpus statistics (N, avgdl, per-term
document frequencies) reduce to ONE tiny row that is broadcast back,
and the final top-k is `orderBy().limit()` → Spark's TakeOrdered —
a per-partition heap + driver merge, never a global sort shuffle.
So the whole query is: scan → 1-row aggregate → scan again with the
broadcast row → heap top-k. Two scans, zero wide shuffles.

Determinism: tf/df/N/dl are exact integers; avgdl, idf and the BM25
ratio are evaluated with the identical operation order on both
engines, so scores agree bit-for-bit before the 6-dp output rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.operators.minhash import TOKS_PATTERN as _TOKS
from datanika_core_spark.workloads import t, workload

_O_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"

_BM25_TERMS = ("spark", "vector", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 15


def _score_sql(tf: str, df_: str) -> str:
    """One term's BM25 contribution; identical text evaluates on both
    engines (ln/least/greatest are common), so op order matches."""
    idf = f"ln(1.0 + (nn - {df_} + 0.5) / ({df_} + 0.5))"
    return (
        f"{idf} * ({tf} * ({_BM25_K1} + 1.0)) / "
        f"({tf} + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
    )


_SCORE_EXPR = " + ".join(
    _score_sql(f"tf_{i}", f"df_{i}") for i in range(len(_BM25_TERMS))
)


@workload(
    "bm25_topk_docs",
    headline=True,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_O_TOKS} AS toks,
         CAST(len({_O_TOKS}) AS BIGINT) AS dl
  FROM documents
),
tf AS (
  SELECT doc_id, dl,
         {", ".join(
             f"CAST(len(list_filter(toks, x -> x = '{w}')) AS BIGINT)"
             f" AS tf_{i}"
             for i, w in enumerate(_BM25_TERMS))}
  FROM tok
),
stats AS (
  SELECT count(*) AS nn, sum(dl) * 1.0 / count(*) AS avgdl,
         {", ".join(
             f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
             f" AS df_{i}"
             for i in range(len(_BM25_TERMS)))}
  FROM tf
)
SELECT doc_id, round({_SCORE_EXPR}, 6) AS bm25
FROM tf CROSS JOIN stats
WHERE {" + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))} > 0
ORDER BY {_SCORE_EXPR} DESC, doc_id
LIMIT {_BM25_TOPK}
""",
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25(k1=1.2, b=0.75) of a 3-term query against every document;
    top-15. Term frequency = per-row array fold; corpus stats = one
    broadcast row; top-k = TakeOrdered (no global sort)."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), _TOKS).alias("toks")
    )
    tf = docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            F.expr(f"size(filter(toks, x -> x = '{w}'))")
            .cast("bigint")
            .alias(f"tf_{i}")
            for i, w in enumerate(_BM25_TERMS)
        ],
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("nn"),
        (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    scored = tf.join(F.broadcast(stats)).filter(
        sum(F.col(f"tf_{i}") for i in range(len(_BM25_TERMS))) > 0
    )
    return (
        scored.select("doc_id", F.expr(_SCORE_EXPR).alias("_s"))
        .orderBy(F.col("_s").desc(), "doc_id")
        .limit(_BM25_TOPK)
        .select("doc_id", F.round("_s", 6).alias("bm25"))
    )


_TFIDF_TOPK = 25


@workload(
    "tfidf_topk_terms",
    headline=True,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_O_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS nn FROM documents
)
SELECT doc_id, term, tf, df,
       round(tf * ln((1.0 + nn) / (1.0 + df)), 6) AS tfidf
FROM tf JOIN df USING (term) CROSS JOIN stats
ORDER BY tf * ln((1.0 + nn) / (1.0 + df)) DESC, doc_id, term
LIMIT {_TFIDF_TOPK}
""",
)
def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide TF-IDF (smooth idf = ln((1+N)/(1+df))) with the
    global top-25 (doc, term) cells. The canonical explode →
    partial-agg shape: term counting shuffles once on (doc_id, term)
    with map-side combine, document frequencies reduce the tf table
    (already term-bucketed) a second time, N is a 1-row broadcast,
    and the top-k is TakeOrdered — no global sort. At 100 TB the tf
    table is the working set; bucketing it by term makes the df agg
    and the join co-partitioned (shuffle-free)."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), _TOKS)
        ).alias("term"),
    )
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    stats = docs.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(stats))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log((1.0 + F.col("nn")) / (1.0 + F.col("df"))),
        )
    )
    return (
        scored.orderBy(F.col("tfidf").desc(), "doc_id", "term")
        .limit(_TFIDF_TOPK)
        .select("doc_id", "term", "tf", "df",
                F.round("tfidf", 6).alias("tfidf"))
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and embedding KNN.
# --------------------------------------------------------------------------

_RRF_K = 60       # the standard RRF damping constant
_RRF_DEPTH = 30   # per-branch candidate depth
_RRF_TOPK = 15

from datanika_core_spark.workloads.similarity import (  # noqa: E402
    _o_cos as _rrf_o_cos,
)


@workload(
    "hybrid_search_rrf",
    headline=True,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_O_TOKS} AS toks,
         CAST(len({_O_TOKS}) AS BIGINT) AS dl
  FROM documents
),
tf AS (
  SELECT doc_id, dl,
         {", ".join(
             f"CAST(len(list_filter(toks, x -> x = '{w}')) AS BIGINT)"
             f" AS tf_{i}"
             for i, w in enumerate(_BM25_TERMS))}
  FROM tok
),
stats AS (
  SELECT count(*) AS nn, sum(dl) * 1.0 / count(*) AS avgdl,
         {", ".join(
             f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
             f" AS df_{i}"
             for i in range(len(_BM25_TERMS)))}
  FROM tf
),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY {_SCORE_EXPR} DESC, doc_id) AS r_lex
  FROM tf CROSS JOIN stats
  WHERE {" + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))} > 0
  QUALIFY r_lex <= {_RRF_DEPTH}
),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
sem AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY {_rrf_o_cos('v', 'qv')} DESC,
                            vec_id) AS r_sem
  FROM vecs CROSS JOIN q
  WHERE vec_id <> 0
  QUALIFY r_sem <= {_RRF_DEPTH}
),
fused AS (
  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         coalesce(1.0 / ({_RRF_K} + lex.r_lex), 0)
           + coalesce(1.0 / ({_RRF_K} + sem.r_sem), 0) AS rrf,
         lex.r_lex, sem.r_sem
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, ROUND(rrf, 6) AS rrf,
       CAST(coalesce(r_lex, 0) AS BIGINT) AS r_lex,
       CAST(coalesce(r_sem, 0) AS BIGINT) AS r_sem
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {_RRF_TOPK}
""",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack 2009):
    the BM25 lexical branch and an embedding-cosine semantic branch
    (query = vector 0, docs joined on doc_id = vec_id) each produce
    a top-30 ranking; fusion score = Σ 1/(60 + rank), absent-in-a-
    branch contributes 0 — the standard way modern search stacks
    combine keyword and vector retrieval without score calibration.

    Scale: each branch is its existing shape (BM25: two scans + a
    broadcast stats row + TakeOrdered; cosine: map-only fold against
    a broadcast query). Fusion joins two ≤depth-row lists — driver
    noise. Ranks are integers, so the fused score is a fixed-order
    sum of two exact divisions: bit-identical across engines."""
    from datanika_core_spark.workloads.similarity import _S_DOT, _vectors

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), _TOKS).alias("toks")
    )
    tf = docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            F.expr(f"size(filter(toks, x -> x = '{w}'))")
            .cast("bigint")
            .alias(f"tf_{i}")
            for i, w in enumerate(_BM25_TERMS)
        ],
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("nn"),
        (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    from pyspark.sql import Window

    lex = (
        tf.join(F.broadcast(stats))
        .filter(
            sum(F.col(f"tf_{i}") for i in range(len(_BM25_TERMS))) > 0
        )
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.expr(_SCORE_EXPR).desc(), F.col("doc_id")))
            .alias("r_lex"),
        )
        .filter(F.col("r_lex") <= _RRF_DEPTH)
    )
    vecs = _vectors(spark, sf_dir)
    qv = [float(x) for x in vecs.filter(F.col("vec_id") == 0).first().v]
    q_lit = "array(" + ", ".join(repr(x) + "d" for x in qv) + ")"
    cos = (
        f"{_S_DOT.format(a='v', b=q_lit)} / "
        f"(sqrt({_S_DOT.format(a='v', b='v')}) * "
        f"sqrt({_S_DOT.format(a=q_lit, b=q_lit)}))"
    )
    sem = (
        vecs.filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"), F.expr(cos).alias("_cos")
        )
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("_cos").desc(), F.col("doc_id")))
            .alias("r_sem"),
        )
        .filter(F.col("r_sem") <= _RRF_DEPTH)
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(1.0 / (_RRF_K + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("r_sem")), F.lit(0.0))
            ).alias("rrf"),
            "r_lex",
            "r_sem",
        )
    )
    # order by the ROUNDED score: the oracle's `ORDER BY rrf` resolves
    # to its rounded output alias, so Spark must rank the same 6-dp
    # value or a rounding-induced tie sorts differently at the LIMIT
    # boundary
    return (
        fused.select(
            "doc_id",
            F.round("rrf", 6).alias("rrf"),
            F.coalesce("r_lex", F.lit(0)).cast("bigint").alias("r_lex"),
            F.coalesce("r_sem", F.lit(0)).cast("bigint").alias("r_sem"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_RRF_TOPK)
    )
