"""Sequence packing + document chunking over the `documents` table —
the tokenizer-side operators of a pretraining data pipeline
(beyond-reference, SURVEY.md §7 Phase 4).

- ``pack_sequences_concat_chunk``: GPT-style concat-and-chunk
  packing. Documents are laid out in a deterministic global order,
  token counts accumulate into a global offset, and each document is
  assigned to the fixed-size context window (pack) its first token
  falls into. The global running sum uses the two-phase
  range-partition + partition-offset pattern
  (operators/ordering.py) — NO single-partition window, so the
  layout step stays map-parallel at 100 TB.

- ``doc_chunk_sliding``: overlapping sliding token windows
  (size W, stride S) per document — the standard long-document
  split for context-bounded training. Pure per-row
  ``sequence``/``explode`` arithmetic: embarrassingly parallel,
  no shuffle at all.

Reference scope note: the reference (an ELT platform) has no
tokenizer layer; these operators extend the engine for LLM corpus
preparation, mirroring dlt-style "derive child tables from a parent
row" mechanics (datanika/services/dlt_runner.py:334-356) in spirit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.operators.minhash import TOKS_PATTERN as _TOKS
from datanika_core_spark.operators.ordering import with_global_offset
from datanika_core_spark.workloads import t, workload

_O_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"

_PACK_BUDGET = 512  # tokens per pack (context window)


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.lower(F.trim(F.col("text"))), _TOKS))
        .cast("bigint")
        .alias("n_tok"),
    )


@workload(
    "pack_sequences_concat_chunk",
    headline=True,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, CAST(len({_O_TOKS}) AS BIGINT) AS n_tok FROM documents
),
laid AS (
  SELECT doc_id, n_tok,
         CAST(coalesce(sum(n_tok) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
  FROM tok
)
SELECT CAST(floor(tok_start / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc
FROM laid
GROUP BY 1
ORDER BY pack_id
""",
)
def pack_sequences_concat_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: token counts accumulate in doc_id
    order; pack_id = which {budget}-token window the document STARTS
    in (documents may straddle a boundary — exactly how GPT-style
    pretraining concatenates then splits). The global offset comes
    from the two-phase prefix sum, so no stage sees more than one
    partition's rows through a window."""
    laid = with_global_offset(
        _doc_tokens(spark, sf_dir), "doc_id", "n_tok", "tok_start"
    )
    return (
        laid.groupBy(
            F.floor(F.col("tok_start") / F.lit(float(_PACK_BUDGET)))
            .cast("bigint")
            .alias("pack_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("pack_id")
    )


_CH_W = 64  # window (chunk) size in tokens
_CH_S = 48  # stride → 16-token overlap between consecutive chunks


@workload(
    "doc_chunk_sliding",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_O_TOKS} AS toks, CAST(len({_O_TOKS}) AS BIGINT) AS n
  FROM documents
),
chunks AS (
  SELECT doc_id, toks, n,
         unnest(range(0, 1 + CAST(floor(
             (greatest(n - {_CH_W}, 0) + {_CH_S - 1}) / {_CH_S}.0
         ) AS BIGINT))) AS chunk_idx
  FROM tok
)
SELECT doc_id, chunk_idx,
       least({_CH_W}, n - chunk_idx * {_CH_S}) AS chunk_len,
       toks[CAST(chunk_idx * {_CH_S} + 1 AS INT)] AS head_tok
FROM chunks
ORDER BY doc_id, chunk_idx
""",
)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: each document explodes into
    ceil((n-W)/S)+1 overlapping windows of W tokens at stride S.
    Per-row arithmetic only — the explode multiplies rows ~n/S×, but
    there is no shuffle and no state; at 100 TB this runs entirely
    inside the scan stage."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), _TOKS).alias("toks")
    )
    n = F.size("toks").cast("bigint")
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - _CH_W, F.lit(0)) + F.lit(_CH_S - 1))
        / F.lit(float(_CH_S))
    ).cast("bigint")
    return (
        docs.withColumn("n", n)
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.least(F.lit(_CH_W).cast("bigint"),
                    F.col("n") - F.col("chunk_idx") * _CH_S)
            .alias("chunk_len"),
            F.element_at(
                "toks", (F.col("chunk_idx") * _CH_S + 1).cast("int")
            ).alias("head_tok"),
        )
        .orderBy("doc_id", "chunk_idx")
    )
