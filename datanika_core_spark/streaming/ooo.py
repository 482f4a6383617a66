"""Streaming out-of-order-depth monitor — the incremental twin of
the batch ``events_out_of_order_depth`` workload: micro-batches of
events (arriving in the same simulated-transport order the batch
workload replays) fold their lateness histogram into a persisted
counter table, CARRYING the event-time high-water mark across
batches — the first streaming twin here whose correctness depends on
cross-batch ORDER state, not just an additive counter.

Within each micro-batch the lateness of an event is measured against
max(carry-in high water, running max over the batch's arrival
order); the new high water persists with the counters. As long as
micro-batch boundaries respect arrival order (file streaming's
natural order — and what a real collector provides), the folded
histogram is IDENTICAL to the batch replay over the concatenated
stream; tests/test_stream_ooo.py asserts exact equality.

Replay discipline: bucket counts are additive (not idempotent) and
the high-water is a max (idempotent) — the batch-id watermark guards
the counters exactly like the CMS/MG/fingerprint stores.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.streaming.jobs import read_event_stream
from datanika_core_spark.workloads.events import (
    _OOO_CAP_MIN,
    _S_OOO_DELAY,
)

#: Sentinel bucket ids in the store table.
HW_ROW = -2   # n_events column carries the event-time high water (us)
WM_ROW = -1   # n_events column carries the last merged batch_id


@dataclass
class OOOMonitorStats:
    batches: int = 0
    arrived: int = 0


class StreamOOOMonitor:
    """Persisted lateness histogram + carried high-water mark."""

    def __init__(self, spark: SparkSession, table: str):
        self.spark = spark
        self.table = table

    def _sentinel(self, which: int) -> int | None:
        if not self.spark.catalog.tableExists(self.table):
            return None
        rows = (
            self.spark.table(self.table)
            .filter(F.col("bucket_min") == which)
            .select("n_events")
            .collect()
        )
        return int(rows[0][0]) if rows else None

    def last_batch_id(self) -> int | None:
        return self._sentinel(WM_ROW)

    def high_water(self) -> int | None:
        return self._sentinel(HW_ROW)

    def absorb(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """Fold one micro-batch (events schema) into the histogram.
        The batch is replayed in (arrival, event_id) order against
        max(carried high water, in-batch running max)."""
        wm = self.last_batch_id()
        if batch_id is not None and wm is not None and batch_id <= wm:
            return  # redelivered batch — counters already folded
        from pyspark.sql import Window as _W

        carry = self.high_water()
        timed = batch_df.select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("e"),
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                + F.expr(_S_OOO_DELAY) * 1000000
            ).alias("arrival"),
            "event_id",
        )
        w = _W.orderBy("arrival", "event_id").rowsBetween(
            _W.unboundedPreceding, _W.currentRow
        )
        run = timed.select(
            "e",
            F.greatest(
                F.max("e").over(w),
                F.lit(carry if carry is not None else -(1 << 62))
                .cast("bigint"),
            ).alias("high_water"),
        )
        hist = (
            run.select(
                F.least(
                    F.expr("(high_water - e) div 60000000"),
                    F.lit(_OOO_CAP_MIN).cast("bigint"),
                ).alias("bucket_min")
            )
            .groupBy("bucket_min")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        )
        new_hw_row = run.agg(F.max("high_water").alias("h")).collect()
        new_hw = int(new_hw_row[0][0]) if new_hw_row[0][0] is not None else carry
        if self.spark.catalog.tableExists(self.table):
            merged = (
                self.spark.table(self.table)
                .filter(F.col("bucket_min") >= 0)
                .unionByName(hist)
                .groupBy("bucket_min")
                .agg(F.sum("n_events").cast("bigint").alias("n_events"))
            )
        else:
            merged = hist
        rows = [tuple(r) for r in merged.collect()]
        if new_hw is not None:
            rows.append((HW_ROW, int(new_hw)))
        new_wm = max(
            (x for x in (wm, batch_id) if x is not None), default=None
        )
        if new_wm is not None:
            rows.append((WM_ROW, int(new_wm)))
        out = self.spark.createDataFrame(
            rows, "bucket_min bigint, n_events bigint"
        )
        out.write.format("parquet").mode("overwrite").saveAsTable(self.table)
        self.spark.catalog.refreshTable(self.table)

    def histogram(self) -> DataFrame:
        return (
            self.spark.table(self.table)
            .filter(F.col("bucket_min") >= 0)
            .orderBy("bucket_min")
        )


def stream_ooo_monitor(
    spark: SparkSession,
    source_path: str,
    monitor: StreamOOOMonitor,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    timeout_sec: int = 300,
) -> OOOMonitorStats:
    """Absorb all currently-available event files (availableNow)
    into the monitor's lateness histogram."""
    stats = OOOMonitorStats()
    sdf = read_event_stream(
        spark, source_path, max_files_per_trigger=max_files_per_trigger
    )

    def _sink_body(batch_df: DataFrame, batch_id: int) -> None:
        if spark.catalog.tableExists(monitor.table):
            spark.catalog.refreshTable(monitor.table)
        stats.batches += 1
        n = batch_df.count()
        stats.arrived += n
        if n == 0:
            return
        monitor.absorb(batch_df, batch_id=batch_id)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from datanika_core_spark.blocks import scoped_blocks

        with scoped_blocks(spark):
            _sink_body(batch_df, batch_id)

    from datanika_core_spark.streaming.jobs import resolve_checkpoint

    ckpt_loc = resolve_checkpoint(
        spark, checkpoint_dir, "ooo", monitor.table,
        has_state=lambda: monitor.last_batch_id() is not None,
        reset_state=lambda: spark.sql(
            f"DROP TABLE IF EXISTS {monitor.table}"
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
    if spark.catalog.tableExists(monitor.table):
        spark.catalog.refreshTable(monitor.table)
    return stats
