"""HLLSketchStore + streaming twin: the store's estimates must
EXACTLY equal the batch workload's sketch (same integer-exact
register math), replay must be free (idempotent max-merge), and
split ingest must equal whole ingest (mergeability)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.operators.hll_store import (
    HLLSketchStore,
    batch_registers,
)
from datanika_core_spark.session import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events(spark):
    return read_table(spark, f"{SF}/events.parquet").select(
        "event_type", "user_id"
    )


def _store(spark, name):
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    return HLLSketchStore(spark, name)


def _est_map(df):
    return {r["grp"]: r["n_est"] for r in df.collect()}


def test_store_matches_workload_estimates(spark, events, sf_dir):
    """Store built in one update == the oracle-checked workload's
    direct sketch, exactly (same register math end to end)."""
    from datanika_core_spark.workloads.sketches import (
        hll_distinct_users_by_type,
    )

    st = _store(spark, "t_hll_direct")
    st.update(events, "event_type", "user_id")
    got = _est_map(st.estimate())
    want = {
        r["event_type"]: r["n_est_hll"]
        for r in hll_distinct_users_by_type(spark, SF).collect()
    }
    assert got == want


def test_split_ingest_equals_whole(spark, events):
    whole = _store(spark, "t_hll_whole")
    whole.update(events, "event_type", "user_id")
    split = _store(spark, "t_hll_split")
    split.update(events.filter(F.col("user_id") % 2 == 0),
                 "event_type", "user_id")
    split.update(events.filter(F.col("user_id") % 2 == 1),
                 "event_type", "user_id")
    assert _est_map(split.estimate()) == _est_map(whole.estimate())


def test_replay_is_idempotent(spark, events):
    st = _store(spark, "t_hll_replay")
    st.update(events, "event_type", "user_id")
    first = _est_map(st.estimate())
    st.update(events, "event_type", "user_id")  # full redelivery
    assert _est_map(st.estimate()) == first


def test_register_shape_bounded(spark, events):
    regs = batch_registers(events, "event_type", "user_id")
    n_groups = events.select("event_type").distinct().count()
    assert regs.count() <= n_groups * 64
    mx = regs.agg(F.max("m_rho")).collect()[0][0]
    assert 1 <= mx <= 55


def test_streaming_twin_matches_batch(spark, events):
    from datanika_core_spark.streaming.distinct import stream_hll_ingest

    batch = _store(spark, "t_hll_batch_ref")
    batch.update(events, "event_type", "user_id")

    stream = _store(spark, "t_hll_streamed")
    stats = stream_hll_ingest(
        spark, f"{SF}/events.parquet", stream,
        group_col="event_type", value_col="user_id",
    )
    assert stats.arrived == events.count()
    assert _est_map(stream.estimate()) == _est_map(batch.estimate())


def test_non_string_group_and_null_values(spark, events):
    """A BIGINT group column must persist (grp is cast to string —
    the stored schema) and null value rows must not emit spurious
    (grp, NULL, NULL) registers — estimates over the non-null values
    are unchanged by interleaved nulls."""
    typed = events.select(
        (F.col("user_id") % 3).alias("g"),  # bigint group col
        F.when(F.col("user_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("user_id")).alias("v"),
    )
    st = _store(spark, "t_hll_typed")
    st.update(typed, "g", "v")  # must not raise on the bigint group
    got = _est_map(st.estimate())
    clean = _store(spark, "t_hll_typed_ref")
    clean.update(typed.filter(F.col("v").isNotNull()), "g", "v")
    assert got == _est_map(clean.estimate())
    regs = spark.table("t_hll_typed")
    assert regs.filter(F.col("j").isNull()).count() == 0
    assert set(r["grp"] for r in regs.select("grp").distinct().collect()) \
        <= {"0", "1", "2"}
