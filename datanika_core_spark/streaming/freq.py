"""Streaming CMS ingest — the incremental twin of the batch
``cms_heavy_hitters_eval`` workload: micro-batches of documents
tokenize in-batch and ADD-merge their Count-Min counters into a
persisted :class:`~datanika_core_spark.operators.cms_store.CMSSketchStore`,
so token-frequency estimates stay queryable at any point of the
stream without rescanning history.

Replay safety (the deliberate contrast with the HLL twin): counter
addition is not idempotent, so a REDELIVERED micro-batch would
double-count. The sink is checkpointed (availableNow +
checkpointLocation) AND passes its micro-batch id into the store,
which persists it as a one-row watermark next to the counters — a
batch replayed after a crash between the store overwrite and the
streaming-checkpoint commit is recognized (batch_id <= watermark)
and skipped, making the non-idempotent merge replay-safe end to
end. The HLL/Bloom/MinHash stores don't need any of this because
their merges are idempotent.

Parity: tests/test_stream_cms.py streams the corpus in two files and
asserts the store's counter table EQUALS the batch sketch built over
the concatenated corpus — exact (d, bucket, cnt) equality, because
counter addition is associative across any batch split — and that
point estimates match the batch workload's.

Scale: each micro-batch contributes one explode ×d →
groupBy(d, bucket) collapsed by the combiner to ≤ d×w rows; the
store merge touches ≤ d×w stored rows regardless of stream volume.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.operators.cms_store import CMSSketchStore
from datanika_core_spark.streaming.jobs import read_event_stream


@dataclass
class CMSIngestStats:
    batches: int = 0
    arrived: int = 0


def stream_cms_ingest(
    spark: SparkSession,
    source_path: str,
    store: CMSSketchStore,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    timeout_sec: int = 300,
) -> CMSIngestStats:
    """Absorb all currently-available document files (availableNow)
    into the store's CMS counters. Returns batch/row accounting;
    query ``store.estimate(probe)`` any time after."""
    stats = CMSIngestStats()
    sdf = read_event_stream(
        spark, source_path, max_files_per_trigger=max_files_per_trigger
    )

    def _sink_body(batch_df: DataFrame, batch_id: int) -> None:
        if spark.catalog.tableExists(store.table):
            spark.catalog.refreshTable(store.table)
        stats.batches += 1
        n = batch_df.count()
        stats.arrived += n
        if n == 0:
            return
        toks = batch_df.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("tok")
        )
        store.update(toks, batch_id=batch_id)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from datanika_core_spark.blocks import scoped_blocks

        with scoped_blocks(spark):
            _sink_body(batch_df, batch_id)

    from datanika_core_spark.streaming.jobs import resolve_checkpoint

    ckpt_loc = resolve_checkpoint(
        spark, checkpoint_dir, "cms", store.table,
        has_state=lambda: store.last_batch_id() is not None,
        reset_state=lambda: spark.sql(
            f"DROP TABLE IF EXISTS {store.table}"
        ),
    )
    q = (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt_loc)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    if spark.catalog.tableExists(store.table):
        spark.catalog.refreshTable(store.table)
    return stats


def stream_mg_ingest(
    spark: SparkSession,
    source_path: str,
    store,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    timeout_sec: int = 300,
) -> CMSIngestStats:
    """Streaming twin of the Misra-Gries store
    (:class:`~datanika_core_spark.operators.mg_store.MGSketchStore`):
    micro-batches of documents tokenize in-batch and fold their
    offset-optimal k-counter summaries into the persisted residuals
    — top-k-guarantee tracking that stays queryable at any point of
    the stream. Same replay discipline as the CMS twin: the merge is
    a sum (not idempotent), so the store's batch-id watermark makes
    redelivery exactly-once."""
    stats = CMSIngestStats()
    sdf = read_event_stream(
        spark, source_path, max_files_per_trigger=max_files_per_trigger
    )

    def _sink_body(batch_df: DataFrame, batch_id: int) -> None:
        if spark.catalog.tableExists(store.table):
            spark.catalog.refreshTable(store.table)
        stats.batches += 1
        n = batch_df.count()
        stats.arrived += n
        if n == 0:
            return
        toks = batch_df.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("tok")
        ).filter(F.col("tok") != "")
        store.update(toks, batch_id=batch_id)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from datanika_core_spark.blocks import scoped_blocks

        with scoped_blocks(spark):
            _sink_body(batch_df, batch_id)

    from datanika_core_spark.streaming.jobs import resolve_checkpoint

    ckpt_loc = resolve_checkpoint(
        spark, checkpoint_dir, "mg", store.table,
        has_state=lambda: store.last_batch_id() is not None,
        reset_state=lambda: spark.sql(
            f"DROP TABLE IF EXISTS {store.table}"
        ),
    )
    q = (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt_loc)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    if spark.catalog.tableExists(store.table):
        spark.catalog.refreshTable(store.table)
    return stats
