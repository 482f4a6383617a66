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
  stored keys; new distinct keys append afterwards (batch-stamped
  and materialized before the append — see ``absorb``).

Replay safety: the counters overwrite carries a one-row batch-id
watermark, so a micro-batch redelivered after a crash anywhere in
the two-write sequence (keys append, then counters overwrite) is
applied exactly once — the keys append is idempotent (anti-join vs
the full stored table) and same-batch leftovers of a crashed partial
append are excluded from the dup count via the per-row batch stamp.

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

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class DQMonitorStats:
    batches: int = 0
    arrived: int = 0


_COUNTER_SCHEMA = "check_name string, observed bigint"

#: sentinel counter row carrying the last committed micro-batch id —
#: excluded from report() and from the merge sum.
_WATERMARK = "_batch_watermark"


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

    def last_batch_id(self) -> int | None:
        """Highest batch_id whose counters are committed (the
        '_batch_watermark' sentinel row), or None."""
        if not self.spark.catalog.tableExists(self.counters_table):
            return None
        rows = (
            self.spark.table(self.counters_table)
            .filter(F.col("check_name") == _WATERMARK)
            .select("observed")
            .collect()
        )
        return int(rows[0][0]) if rows else None

    def absorb(self, batch: DataFrame, batch_id: int | None = None) -> None:
        """Fold one micro-batch into the counters + key store.

        Replay-safe when a batch_id is supplied: the counters
        overwrite carries a one-row watermark, so a batch redelivered
        after a crash anywhere in the two-write sequence is applied
        exactly once. Write order is keys-then-counters: the keys
        append is idempotent by construction (new keys are the
        anti-join against the FULL stored table, so a replay appends
        nothing), and the same-batch leftovers of a crashed partial
        append are excluded from the dup count via the per-row batch
        stamp — the watermark commit is the last write."""
        spark = self.spark
        wm = self.last_batch_id()
        if batch_id is not None and wm is not None and batch_id <= wm:
            return  # replayed batch — already committed
        counters = _batch_counters(batch)
        # pk duplicates: internal (count - distinct) + stored-key hits
        keys = batch.select(F.col("o_orderkey").alias("k"))
        internal = keys.agg(
            (F.count(F.lit(1)) - F.count_distinct("k"))
            .cast("bigint").alias("d")
        )
        kd = keys.distinct()
        if spark.catalog.tableExists(self.keys_table):
            stored = spark.table(self.keys_table)
            # rows stamped with THIS batch id are leftovers of a
            # crashed partial append of the same batch — not "prior"
            prior = (
                stored.filter(
                    F.col("b").isNull() | (F.col("b") != F.lit(batch_id))
                )
                if batch_id is not None
                else stored
            )
            stored_hits = (
                kd.join(prior, "k", "left_semi")
                .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
            )
            new_keys = kd.join(stored, "k", "left_anti")
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
                .filter(F.col("check_name") != _WATERMARK)
                .unionByName(delta)
                .groupBy("check_name")
                .agg(F.sum("observed").cast("bigint").alias("observed"))
            )
        else:
            merged = delta
        new_keys = new_keys.withColumn(
            "b", F.lit(batch_id).cast("bigint")
        )
        # materialize new_keys BEFORE any table mutation — it is a
        # lazy anti-join over keys_table, and appending to the table
        # it reads is a read-while-append race. Batch-sized, and the
        # sink's scoped_blocks frees the checkpoint blocks.
        new_keys = new_keys.localCheckpoint(eager=True)
        # delta leg fully computed BEFORE the keys append (the dup
        # counters also read keys_table)
        rows = [tuple(r) for r in merged.collect()]  # O(constraints)
        new_wm = max(
            (x for x in (wm, batch_id) if x is not None), default=None
        )
        if new_wm is not None:
            rows.append((_WATERMARK, int(new_wm)))
        mode = (
            "append"
            if spark.catalog.tableExists(self.keys_table)
            else "overwrite"
        )
        new_keys.write.format("parquet").mode(mode).saveAsTable(
            self.keys_table
        )
        spark.catalog.refreshTable(self.keys_table)
        out = spark.createDataFrame(rows, _COUNTER_SCHEMA)
        out.write.format("parquet").mode("overwrite").saveAsTable(
            self.counters_table
        )
        spark.catalog.refreshTable(self.counters_table)

    def report(self) -> DataFrame:
        """(check_name, observed, passed) — row_count passes when
        > 0, every violation counter passes at 0."""
        c = self.spark.table(self.counters_table).filter(
            F.col("check_name") != _WATERMARK
        )
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
        monitor.absorb(batch_df, batch_id=batch_id)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from datanika_core_spark.blocks import scoped_blocks

        with scoped_blocks(spark):
            _sink_body(batch_df, batch_id)

    from datanika_core_spark.streaming.jobs import resolve_checkpoint

    def _reset() -> None:
        for t in (monitor.counters_table, monitor.keys_table):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    ckpt_loc = resolve_checkpoint(
        spark, checkpoint_dir, "dq", monitor.counters_table,
        has_state=lambda: monitor.last_batch_id() is not None,
        reset_state=_reset,
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
    for t in (monitor.counters_table, monitor.keys_table):
        if spark.catalog.tableExists(t):
            spark.catalog.refreshTable(t)
    return stats
