"""Warehouse maintenance: compaction shrinks file count without
changing data; ANALYZE populates catalog stats the CBO reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from datanika_core_spark.operators.maintenance import (
    analyze_table,
    compact_table,
)
from datanika_core_spark.operators.writers import drop_table


def test_compaction_shrinks_files_preserves_data(spark):
    drop_table(spark, "t_frag")
    # simulate months of micro-batch appends: 40 tiny files
    spark.range(2000).repartition(40).withColumn(
        "v", F.col("id") * 2
    ).write.format("parquet").saveAsTable("t_frag")
    before = {tuple(r) for r in spark.table("t_frag").collect()}

    res = compact_table(spark, "t_frag", target_file_bytes=64 * 1024 * 1024)
    assert res.files_before >= 40
    assert res.files_after < res.files_before
    assert res.files_after == 1  # 2000 rows ≪ 64 MB target

    after = {tuple(r) for r in spark.table("t_frag").collect()}
    assert after == before
    drop_table(spark, "t_frag")


def test_compaction_can_grow_file_count(spark):
    drop_table(spark, "t_onefile")
    spark.range(10000).coalesce(1).write.format("parquet").saveAsTable(
        "t_onefile"
    )
    res = compact_table(spark, "t_onefile", target_file_bytes=8 * 1024)
    assert res.files_before == 1
    assert res.files_after > 1
    assert spark.table("t_onefile").count() == 10000
    drop_table(spark, "t_onefile")


def test_analyze_table_populates_stats(spark):
    drop_table(spark, "t_stats")
    spark.range(500).withColumn("k", F.col("id") % 7).write.format(
        "parquet"
    ).saveAsTable("t_stats")
    analyze_table(spark, "t_stats", columns=["k"])
    desc = {
        r[0]: r[1]
        for r in spark.sql("DESCRIBE TABLE EXTENDED t_stats").collect()
    }
    assert "Statistics" in desc and "rows" in desc["Statistics"]
    col = spark.sql("DESCRIBE EXTENDED t_stats k").collect()
    got = {r[0]: r[1] for r in col}
    assert got.get("distinct_count") == "7"
    drop_table(spark, "t_stats")
