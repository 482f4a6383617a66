"""Streaming content-fingerprint ingest — the incremental twin of
the batch ``table_fingerprint_xor`` workload: micro-batches of order
rows hash their canonical field string in-batch and XOR-fold into a
persisted :class:`~datanika_core_spark.operators.fingerprint_store.
FingerprintStore`, so the replica-comparison fingerprint of the
stream-so-far is queryable at any point without rescanning history.

Replay safety: xor is SELF-INVERTING — a redelivered micro-batch
would cancel its own rows back out of the fingerprint (strictly
worse than the CMS twin's double-count), so the batch-id watermark
in the store is load-bearing, not belt-and-braces. Same checkpointed
availableNow + skip-when-batch_id<=watermark discipline as
streaming/freq.py.

Parity: tests/test_stream_fingerprint.py streams orders in two files
and asserts the store EQUALS the batch workload's per-status
(n_rows, fingerprint) rows exactly — xor/count are abelian, so any
batch split folds to the same result.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.operators.fingerprint_store import FingerprintStore
from datanika_core_spark.streaming.jobs import read_event_stream
from datanika_core_spark.workloads.cdc import _S_FP


@dataclass
class FingerprintIngestStats:
    batches: int = 0
    arrived: int = 0


def stream_fingerprint_ingest(
    spark: SparkSession,
    source_path: str,
    store: FingerprintStore,
    group_col: str = "o_orderstatus",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    timeout_sec: int = 300,
) -> FingerprintIngestStats:
    """Absorb all currently-available order files (availableNow)
    into the store's per-group fingerprints."""
    stats = FingerprintIngestStats()
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
        rows = batch_df.select(
            F.col(group_col).cast("string").alias("grp"),
            F.expr(_S_FP).alias("h"),
        )
        store.update(rows, batch_id=batch_id)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from datanika_core_spark.blocks import scoped_blocks

        with scoped_blocks(spark):
            _sink_body(batch_df, batch_id)

    from datanika_core_spark.streaming.jobs import resolve_checkpoint

    ckpt_loc = resolve_checkpoint(
        spark, checkpoint_dir, "fingerprint", store.table,
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
