"""T8 seed + snapshot commands through ModelRunner (dbt command
dispatch parity: /root/reference/datanika/models/pipeline.py:10-17)."""

from datanika_core_spark.operators.scd2 import SnapshotConfig
from datanika_core_spark.operators.writers import drop_table
from datanika_core_spark.plans.models import (
    Model,
    ModelRegistry,
    Seed,
    SnapshotDef,
)
from datanika_core_spark.plans.runner import ModelRunner


def test_seed_command(spark, tmp_path):
    csv = tmp_path / "countries.csv"
    csv.write_text("code,name\nus,United States\nde,Germany\n")
    reg = ModelRegistry()
    reg.add_seed(Seed("countries", str(csv), schema="seeds"))
    drop_table(spark, "seeds.countries")
    report = ModelRunner(spark, reg).invoke("seed")
    assert report.executed == ["countries"]
    assert report.rows_affected == 2
    assert spark.table("seeds.countries").count() == 2


def test_snapshot_command_two_runs(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS snap_src")
    drop_table(spark, "snap_src.items")
    drop_table(spark, "snapshots.items_snap")
    drop_table(spark, "snapshots.items_snap__stage")
    spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (2, "b", "2024-01-01 00:00:00")],
        "id int, val string, updated string",
    ).selectExpr("id", "val", "cast(updated as timestamp_ntz) updated") \
     .write.mode("overwrite").saveAsTable("snap_src.items")

    reg = ModelRegistry()
    reg.add_source("raw", "items", "snap_src.items")
    reg.add_snapshot(SnapshotDef(
        name="items_snap",
        sql_body="SELECT * FROM {{ source('raw', 'items') }}",
        config=SnapshotConfig(unique_key="id", strategy="timestamp",
                              updated_at="updated"),
    ))
    runner = ModelRunner(spark, reg)
    r1 = runner.invoke("snapshot")
    assert r1.rows_affected == 2  # initial versions

    # mutate row 2, leave row 1
    spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (2, "b2", "2024-02-01 00:00:00")],
        "id int, val string, updated string",
    ).selectExpr("id", "val", "cast(updated as timestamp_ntz) updated") \
     .write.mode("overwrite").saveAsTable("snap_src.items")
    r2 = runner.invoke("snapshot")
    assert r2.rows_affected == 1  # one new version

    hist = spark.table("snapshots.items_snap")
    assert hist.count() == 3
    current = hist.filter("dbt_valid_to IS NULL")
    assert {r.val for r in current.collect()} == {"a", "b2"}


def test_sources_manifest():
    reg = ModelRegistry()
    reg.add_source("raw", "orders", "wh.orders")
    reg.add_source("raw", "customer", "wh.customer")
    reg.add_source("ext", "clicks", "ext_db.clicks")
    assert reg.sources_manifest() == {
        "raw": {"orders": "wh.orders", "customer": "wh.customer"},
        "ext": {"clicks": "ext_db.clicks"},
    }


def test_build_still_excludes_seed_snapshot_nodes(spark):
    reg = ModelRegistry()
    reg.add(Model(name="m1", sql_body="SELECT 1 AS x",
                  materialization="view", schema="wl_cmd"))
    report = ModelRunner(spark, reg).invoke("build")
    assert report.executed == ["m1"]
