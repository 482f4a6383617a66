"""Training-corpus export: deterministic sharded writes + manifest.

The last step of a curation pipeline (workloads/pipeline.py) is
handing the kept documents to a training loader, which wants:
- a FIXED number of shards (data-parallel readers map shards to
  workers),
- deterministic doc->shard assignment (re-exports after an
  incremental corpus update move only new docs, never reshuffle old
  ones — loader-side caches and resume points stay valid),
- a pseudo-random interleave WITHIN each shard (so a sequential
  reader doesn't see documents in source/crawl order — md5 order is
  the same "global shuffle" trick used for the stratified sampler),
- a manifest (docs/tokens/bytes per shard) for budget accounting.

Scale: assignment + interleave keys are per-row md5 expressions (no
UDF); the only shuffle is the repartition to exactly n_shards
partitions, which IS the write layout — one pass, one shuffle, and
each task writes exactly one shard file. Balance holds because the
60-bit hash is uniform over doc ids.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.operators.minhash import spark_hash_expr


@dataclass
class ExportResult:
    path: str
    n_shards: int
    rows: int


def assign_shard(df: DataFrame, key: str, n_shards: int) -> DataFrame:
    """Add `shard` (0..n_shards-1) and `interleave` columns, both
    md5-derived from ``key`` — deterministic across engines, reruns
    and cluster sizes (never depends on partitioning)."""
    h = F.expr(spark_hash_expr(f"cast({key} as string)"))
    return df.withColumn("shard", (h % n_shards).cast("int")).withColumn(
        "interleave", F.expr(spark_hash_expr(f"concat('il:', {key})"))
    )


def export_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
    fmt: str = "parquet",
) -> ExportResult:
    """Write ``df`` as ``n_shards`` hash-assigned shard directories
    (``shard=K/``), each internally ordered by the md5 interleave.

    One repartition on the shard id gives each write task exactly
    one shard's rows; `sortWithinPartitions` makes shard files
    byte-stable for identical input."""
    with_shard = assign_shard(df, key, n_shards)
    out, obs = _observe(with_shard)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "interleave")
        .write.format(fmt)
        .mode("overwrite")
        .partitionBy("shard")
        .save(path)
    )
    return ExportResult(path, n_shards, obs.get["rows"])


def _observe(df: DataFrame):
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Per-shard accounting over an exported corpus: docs, tokens
    (whitespace), text bytes. Partition pruning applies to any
    single-shard read; the manifest scan aggregates per shard with
    one partial-agg pass."""
    df = spark.read.parquet(path)
    return (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size(F.split("text", r"\s+")))
            .cast("bigint")
            .alias("n_tokens"),
            F.sum(F.length("text")).cast("bigint").alias("n_bytes"),
        )
        .orderBy("shard")
    )


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
) -> ExportResult:
    """Training-data export in the de-facto LLM interchange format:
    hash-assigned ``shard=K/`` directories of JSON-Lines text, one
    JSON object per row (all columns), internally ordered by the
    deterministic interleave.

    Built on the same assign_shard contract as the parquet export —
    incremental-stable shard membership, rerun-identical bytes — but
    serialized via ``to_json(struct(*))`` + the text writer, so
    downstream tokenizer/dataloader stacks that stream jsonl (the
    common case) consume it without a parquet reader. The JSON
    encoding happens JVM-side in the write projection; no Python."""
    cols = [c for c in df.columns if c not in ("shard", "interleave")]
    with_shard = assign_shard(df, key, n_shards)
    out, obs = _observe(with_shard)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "interleave")
        .select(
            "shard",
            F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
        )
        .write.format("text")
        .mode("overwrite")
        .partitionBy("shard")
        .save(path)
    )
    return ExportResult(path, n_shards, obs.get["rows"])
