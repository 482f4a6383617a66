"""Streaming data-quality monitor — the incremental twin of the
batch ``dq_constraint_report`` (workloads/dataquality.py): each
micro-batch of orders folds its constraint violations into a
persisted counters table, so "is this feed clean?" is answerable at
any point of the stream without rescanning history.

Two constraint classes, two merge disciplines:

- **Row-local constraints** (not-null, accepted values, positivity,
  row count) produce per-batch violation COUNTS — an additive
  abelian monoid, merged into the counters table by key-wise sum
  (the same delta rule as the IVM rollup workloads).
- **Primary-key uniqueness** is NOT additive (a duplicate can span
  batches), so the monitor keeps a seen-keys table — the exact-key
  analogue of the Bloom/MinHash ingest stores: a batch's dup count
  is its internal dups plus the broadcast semi-join hits against the
  stored keys; new distinct keys append afterwards. Replay caveat
  (documented, deliberate): a redelivered batch's keys are already
  stored, so at-least-once delivery inflates pk_dups — run the sink
  with checkpointing (as here) for effectively-once batch delivery,
  exactly like the counter-based streaming workloads.

Parity: tests/test_stream_dq.py splits orders into two files (the
second re-delivering some of the first's keys), streams them, and
asserts the counters equal the batch constraint logic applied to the
concatenated frame — exact equality, all-BIGINT.

At 100 TB: counters are O(constraints) rows; the key store is the
one real table and is exactly the key-dedup index any idempotent
ingest already maintains (at warehouse scale: bucketed by key, or a
Bloom prefilter in front — operators/bloom_store.py).
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class DQMonitorStats:
    batches: int = 0
    arrived: int = 0


_COUNTER_SCHEMA = "check_name string, observed bigint"


def _batch_counters(batch: DataFrame) -> DataFrame:
    """Row-local violation counts for one orders micro-batch."""
    return batch.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint").alias("null_custkey"),
        F.sum(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
              .otherwise(0)).cast("bigint").alias("bad_status"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint").alias("nonpos_price"),
    ).select(F.expr(
        "stack(4,"
        " 'row_count', n_rows,"
        " 'not_null_custkey', null_custkey,"
        " 'accepted_status', bad_status,"
        " 'positive_price', nonpos_price"
        ") as (check_name, observed)"
    ))


class StreamDQMonitor:
    """Persisted streaming constraint counters over an orders feed."""

    def __init__(self, spark: SparkSession, counters_table: str,
                 keys_table: str):
        self.spark = spark
        self.counters_table = counters_table
        self.keys_table = keys_table

    def absorb(self, batch: DataFrame) -> None:
        """Fold one micro-batch into the counters + key store."""
        spark = self.spark
        counters = _batch_counters(batch)
        # pk duplicates: internal (count - distinct) + stored-key hits
        keys = batch.select(F.col("o_orderkey").alias("k"))
        internal = keys.agg(
            (F.count(F.lit(1)) - F.count_distinct("k"))
            .cast("bigint").alias("d")
        )
        kd = keys.distinct()
        if spark.catalog.tableExists(self.keys_table):
            stored_hits = (
                kd.join(spark.table(self.keys_table), "k", "left_semi")
                .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
            )
            new_keys = kd.join(
                spark.table(self.keys_table), "k", "left_anti"
            )
        else:
            stored_hits = internal.select(F.lit(0).cast("bigint").alias("d"))
            new_keys = kd
        dups = internal.unionByName(stored_hits).agg(
            F.sum("d").cast("bigint").alias("observed")
        ).select(F.lit("pk_unique").alias("check_name"), "observed")
        delta = counters.unionByName(dups)
        if spark.catalog.tableExists(self.counters_table):
            merged = (
                spark.table(self.counters_table)
                .unionByName(delta)
                .groupBy("check_name")
                .agg(F.sum("observed").cast("bigint").alias("observed"))
            )
        else:
            merged = delta
        rows = merged.collect()  # O(constraints) rows
        out = spark.createDataFrame(rows, _COUNTER_SCHEMA)
        out.write.format("parquet").mode("overwrite").saveAsTable(
            self.counters_table
        )
        spark.catalog.refreshTable(self.counters_table)
        mode = (
            "append"
            if spark.catalog.tableExists(self.keys_table)
            else "overwrite"
        )
        new_keys.write.format("parquet").mode(mode).saveAsTable(
            self.keys_table
        )
        spark.catalog.refreshTable(self.keys_table)

    def report(self) -> DataFrame:
        """(check_name, observed, passed) — row_count passes when
        > 0, every violation counter passes at 0."""
        c = self.spark.table(self.counters_table)
        passed = F.when(
            F.col("check_name") == "row_count", F.col("observed") > 0
        ).otherwise(F.col("observed") == 0)
        return c.withColumn("passed", passed).orderBy("check_name")


def stream_dq_monitor(
    spark: SparkSession,
    source_path: str,
    monitor: StreamDQMonitor,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    timeout_sec: int = 300,
) -> DQMonitorStats:
    """Absorb all currently-available orders files (availableNow)
    into the monitor; query ``monitor.report()`` any time after."""
    from datanika_core_spark.streaming.jobs import read_event_stream

    stats = DQMonitorStats()
    sdf = read_event_stream(
        spark, source_path, max_files_per_trigger=max_files_per_trigger
    )

    def _sink_body(batch_df: DataFrame, batch_id: int) -> None:
        for t in (monitor.counters_table, monitor.keys_table):
            if spark.catalog.tableExists(t):
                spark.catalog.refreshTable(t)
        stats.batches += 1
        n = batch_df.count()
        stats.arrived += n
        if n == 0:
            return
        monitor.absorb(batch_df)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from datanika_core_spark.blocks import scoped_blocks

        with scoped_blocks(spark):
            _sink_body(batch_df, batch_id)

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ck_stream_dq_")
    q = (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation",
                os.path.join(ckpt, monitor.counters_table))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    for t in (monitor.counters_table, monitor.keys_table):
        if spark.catalog.tableExists(t):
            spark.catalog.refreshTable(t)
    return stats
