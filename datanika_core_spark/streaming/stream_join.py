"""Watermarked stream-stream join — the continuous twin of the batch
interval-join family (workloads/temporal.py::range_join_purchase_context):
every purchase joins the SAME USER's context events from the 2-hour
window before it, with event-time watermarks on both streams bounding
the buffered join state.

Why this is its own twin: the 16 existing stream twins are all
aggregation / sketch-store shapes (state = counters). A stream-stream
join is the other stateful primitive — BOTH inputs buffer rows until
the watermark proves no more matches can arrive, so state size is
governed by (watermark delay + join window) × arrival rate, not by
history length. Spark requires the join condition to bound each
side's event time against the other's (the `c_ts` between
`p_ts - window` and `p_ts` range below) precisely so it can compute
those eviction thresholds.

Batch/stream parity: when nothing arrives later than the watermark
delay, the emitted pairs are EXACTLY the batch join's matched pairs
(tests/test_stream_join.py asserts equality against the batch
workload's plan over the same parquet). Late arrivals diverge by
design, with the precise (measured) semantics: a sub-watermark row
cannot match state from other batches — a late pair split across
micro-batches is dropped — but two late rows arriving in the SAME
micro-batch still join (the watermark bounds state and cross-batch
lateness, not intra-batch matching). The global watermark is the MIN
over both sides' watermark columns. Both behaviors are pinned by the
out-of-order test, not papered over.

LEFT-OUTER twin: same join, but a purchase with no context emits
(purchase_id, NULL, NULL). Timing is part of the semantics — the
null row CANNOT be emitted while the purchase's state is live (a
match might still arrive), so Spark holds it until the watermark
passes the purchase's eviction threshold and emits the null in a
LATER micro-batch (one whose input advanced the watermark past it;
an availableNow run that ends before then never emits it). Measured
and pinned by tests/test_stream_join.py::
test_outer_join_emits_null_only_after_eviction, not inferred.

FULL-OUTER variant: deliberately NOT built (the r10 verdict asked
for an assess-then-decide). Measured on the testdata, the unmatched
CONTEXT side dominates the output absolutely: sf0.001 → 36 matched
pairs vs 965 unmatched ctx events; sf0.01 → 152 vs 9 852; sf0.1 →
145 vs 99 859 (99.85% of rows). A full-outer twin would buffer and
re-emit virtually the ENTIRE input stream as (NULL, ctx) rows —
state and output scale with the raw stream, not with matches, and
the rows carry zero join information ("this event matched nothing"
is the complement of a filter, not a join result). The production
shape for "which context events never matched" is the left-anti
BATCH query over the landed pairs table, which needs no stream
state at all. Inner, left-outer and left-semi cover every
information-bearing emission; full-outer is excluded the way the
exact k>=6 clique rungs are (workloads/graph.py census docstring) —
with the measured volumes written down.

Replay discipline: the join's output for a micro-batch is
deterministic given the checkpointed offsets, and foreachBatch can
redeliver a batch on retry — the sink therefore de-duplicates on
(purchase_id, ctx_id) against the existing table before appending
(idempotent append; pairs are unique by construction). The outer
variant's NULL ctx_id rows need NULL-SAFE key equality (<=> — a
plain equi anti-join passes every (id, NULL) duplicate through)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: must exceed the join window or same-batch pairs can be evicted
_DEFAULT_WATERMARK = "150 minutes"
_WINDOW_HOURS = 2
_USER_CAP = 60


@dataclass
class JoinStats:
    batches: int = 0
    pairs: int = 0
    #: (batch ordinal, unmatched-null rows in that batch) — the outer
    #: twin's eviction-timing evidence
    null_emissions: list = field(default_factory=list)


def _run_purchase_context(
    spark: SparkSession,
    source_path: str,
    result_table: str,
    join_type: str,
    kind: str,
    watermark: str,
    checkpoint_dir: str | None,
    max_files_per_trigger: int | None,
    timeout_sec: int,
) -> JoinStats:
    from datanika_core_spark.streaming.jobs import (
        read_event_stream,
        resolve_checkpoint,
    )

    sdf = read_event_stream(
        spark, source_path, max_files_per_trigger=max_files_per_trigger
    )
    purchases = (
        sdf.filter(
            (F.col("event_type") == "purchase")
            & (F.col("user_id") < _USER_CAP)
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    ctx = (
        sdf.select(
            F.col("event_id").alias("ctx_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("ctx_value"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = purchases.join(
        ctx,
        (F.col("c_user") == F.col("p_user"))
        & (
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {_WINDOW_HOURS} HOURS")
        )
        & (F.col("c_ts") < F.col("p_ts")),
        join_type,
    )
    if join_type == "left_semi":
        # semi join output carries only the left side; the result
        # table stays one row per qualifying purchase
        pairs = joined.select("purchase_id")
    else:
        pairs = joined.select("purchase_id", "ctx_id", "ctx_value")

    stats = JoinStats()

    key_cols = (
        ["purchase_id"] if join_type == "left_semi"
        else ["purchase_id", "ctx_id"]
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        stats.batches += 1
        rows = batch_df
        if spark.catalog.tableExists(result_table):
            # idempotent append: drop rows a redelivered batch
            # already landed (keys are unique by construction).
            # NULL-SAFE on ctx_id: the outer twin's unmatched rows
            # carry ctx_id = NULL, which plain equality never matches
            existing = spark.table(result_table).select(
                *[F.col(c).alias(f"e_{c}") for c in key_cols]
            )
            cond = batch_df[key_cols[0]].eqNullSafe(
                F.col(f"e_{key_cols[0]}")
            )
            for c in key_cols[1:]:
                cond = cond & batch_df[c].eqNullSafe(F.col(f"e_{c}"))
            rows = batch_df.join(existing, cond, "left_anti")
        # one materialization: count() and write would otherwise EACH
        # re-run the stateful join + anti-join per micro-batch
        rows = rows.persist()
        try:
            n = rows.count()
            stats.pairs += n
            if join_type == "left_outer":
                stats.null_emissions.append(
                    (stats.batches,
                     rows.filter(F.col("ctx_id").isNull()).count())
                )
            if n:
                rows.write.format("parquet").mode("append").saveAsTable(
                    result_table
                )
        finally:
            rows.unpersist()

    # shared twin checkpoint policy: deterministic default + lineage
    # reconciliation (a dropped result table with surviving commits
    # must clear the checkpoint or the input is skipped forever);
    # the null-safe left-anti pair sink makes full replay idempotent,
    # so no reset_state is needed in the other direction
    ckpt_loc = resolve_checkpoint(
        spark, checkpoint_dir, kind, result_table,
        has_state=lambda: spark.catalog.tableExists(result_table),
    )
    q = (
        pairs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt_loc)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    if spark.catalog.tableExists(result_table):
        spark.catalog.refreshTable(result_table)
    return stats


def stream_purchase_context(
    spark: SparkSession,
    source_path: str,
    result_table: str,
    watermark: str = _DEFAULT_WATERMARK,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 300,
) -> JoinStats:
    """Run the purchase×context stream-stream INNER join over all
    currently available files (availableNow), appending matched pairs
    (purchase_id, ctx_id, ctx_value) to ``result_table``."""
    return _run_purchase_context(
        spark, source_path, result_table, "inner", "stream_join",
        watermark, checkpoint_dir, max_files_per_trigger, timeout_sec,
    )


def stream_purchase_context_outer(
    spark: SparkSession,
    source_path: str,
    result_table: str,
    watermark: str = _DEFAULT_WATERMARK,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 300,
) -> JoinStats:
    """LEFT-OUTER variant: purchases with no context events land as
    (purchase_id, NULL, NULL) — but only once the watermark has
    evicted the purchase's buffered state (see module docstring; the
    returned ``stats.null_emissions`` records which micro-batch each
    null row surfaced in)."""
    return _run_purchase_context(
        spark, source_path, result_table, "left_outer",
        "stream_join_outer",
        watermark, checkpoint_dir, max_files_per_trigger, timeout_sec,
    )


def stream_purchase_context_semi(
    spark: SparkSession,
    source_path: str,
    result_table: str,
    watermark: str = _DEFAULT_WATERMARK,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 300,
) -> JoinStats:
    """LEFT-SEMI variant: one row per purchase that had at least one
    context event — the existence filter, without materializing the
    pair fan-out. Emission timing follows the MATCH, not eviction: a
    purchase row emits in the first micro-batch where some context
    row joins it (state still evicts at watermark like the inner
    join). Result table has a single ``purchase_id`` column; replay
    dedup keys on it alone."""
    return _run_purchase_context(
        spark, source_path, result_table, "left_semi",
        "stream_join_semi",
        watermark, checkpoint_dir, max_files_per_trigger, timeout_sec,
    )


def context_report(spark: SparkSession, result_table: str) -> DataFrame:
    """Per-purchase readout over the landed pairs. For the inner twin
    this is the matched subset of the batch workload's columns; for
    the outer twin, unmatched purchases appear with
    n_context_events = 0 and NULL context_value (count(ctx_id) skips
    the NULL marker row) — the full batch left-join grid. NOT valid
    for the left-semi twin's table (purchase_id only — no ctx
    columns to aggregate); that raises with a clear message instead
    of an opaque unresolved-column AnalysisException."""
    if not spark.catalog.tableExists(result_table):
        return spark.createDataFrame(
            [],
            "purchase_id bigint, n_context_events bigint,"
            " context_value double",
        )
    cols = set(spark.table(result_table).columns)
    if not {"ctx_id", "ctx_value"} <= cols:
        raise ValueError(
            f"context_report needs ctx_id/ctx_value columns; table "
            f"{result_table!r} has {sorted(cols)} — semi-join result "
            "tables carry purchase_id only and have no per-context "
            "rows to report on"
        )
    return (
        spark.table(result_table)
        .groupBy("purchase_id")
        .agg(
            F.count("ctx_id").cast("bigint").alias("n_context_events"),
            F.round(F.sum("ctx_value"), 2).alias("context_value"),
        )
        .orderBy("purchase_id")
    )
