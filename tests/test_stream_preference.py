"""Streaming Bradley-Terry preference store: exact batch parity
(including a stream split MID-ORDER), replay idempotence, and the
empty-state readout."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from datanika_core_spark.blocks import release_blocks
from datanika_core_spark.session import read_table
from datanika_core_spark.streaming.preference import (
    StreamPreferenceStore,
    stream_preferences,
)
from datanika_core_spark.workloads.evalmetrics import (
    preference_bradley_terry,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _split_mid_order(spark, tmp_path, name):
    from pyspark.sql import Window as _W

    li = read_table(spark, f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n = li.count()
    ranked = li.withColumn(
        "_rn",
        F.row_number().over(_W.orderBy("l_orderkey", "l_partkey")),
    )
    halves = (
        ranked.filter(F.col("_rn") <= n // 2).drop("_rn"),
        ranked.filter(F.col("_rn") > n // 2).drop("_rn"),
    )
    # the split must land mid-order so the test exercises the
    # quantity-grid merge path
    o0 = halves[0].agg(F.max("l_orderkey")).collect()[0][0]
    o1 = halves[1].agg(F.min("l_orderkey")).collect()[0][0]
    assert o0 == o1, "median split expected to land mid-order"
    src = tmp_path / name
    src.mkdir()
    for i, b in enumerate(halves):
        staged = tmp_path / f"{name}_s{i}"
        b.coalesce(1).write.parquet(str(staged))
        shutil.copy(
            next(staged.glob("part-*.parquet")), src / f"f{i}.parquet"
        )
    return src


def _store(spark, table):
    part = read_table(spark, f"{SF}/part.parquet")
    return StreamPreferenceStore(spark, table, part)


def test_stream_preference_matches_batch(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS pref_grid")
    spark.sql("DROP TABLE IF EXISTS pref_grid_stage")
    release_blocks(spark)
    src = _split_mid_order(spark, tmp_path, "pref_src")
    store = _store(spark, "pref_grid")
    stats = stream_preferences(
        spark, str(src), store,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    assert stats.batches >= 2 and stats.arrived > 0
    got = _rows(store.report())
    want = _rows(preference_bradley_terry(spark, SF))
    assert got == want


def test_stream_preference_replay_is_noop(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS pref_grid2")
    spark.sql("DROP TABLE IF EXISTS pref_grid2_stage")
    release_blocks(spark)
    src = _split_mid_order(spark, tmp_path, "pref_src2")
    store = _store(spark, "pref_grid2")
    ck = str(tmp_path / "ck2")
    stream_preferences(spark, str(src), store, checkpoint_dir=ck)
    before = _rows(spark.table("pref_grid2"))
    # redeliver batch 0 manually: the watermark must reject it
    first = read_table(spark, str(src / "f0.parquet"))
    store.absorb(first, batch_id=0)
    assert _rows(spark.table("pref_grid2")) == before
    # a fresh-checkpoint rerun of the SAME drained source is also a
    # no-op at the stream level (availableNow with same checkpoint)
    stream_preferences(spark, str(src), store, checkpoint_dir=ck)
    assert _rows(spark.table("pref_grid2")) == before


def test_preference_report_before_first_absorb_is_empty(spark):
    spark.sql("DROP TABLE IF EXISTS pref_grid3")
    store = _store(spark, "pref_grid3")
    rep = store.report()
    assert rep.columns == ["brand", "strength", "wins", "comparisons"]
    assert rep.count() == 0
