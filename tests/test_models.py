"""Model layer: registry, resolver, DAG/selector, materializations,
incremental strategies, data tests, freshness, SCD2, runner."""

from __future__ import annotations

import datetime as dt

import pytest

from datanika_core_spark.errors import SchemaContractViolation, ValidationError
from datanika_core_spark.operators.scd2 import SnapshotConfig, SnapshotRunner
from datanika_core_spark.operators.writers import drop_table
from datanika_core_spark.plans.dag import build_graph, select, topo_order
from datanika_core_spark.plans.freshness import check_freshness
from datanika_core_spark.plans.model_tests import run_test, violation_sql
from datanika_core_spark.plans.models import (
    ColumnTest,
    IncrementalConfig,
    Model,
    ModelRegistry,
)
from datanika_core_spark.plans.resolver import compile_model, find_refs
from datanika_core_spark.plans.runner import ModelRunner


@pytest.fixture()
def registry():
    r = ModelRegistry()
    r.add_source("raw", "numbers", "raw_numbers")
    r.add(Model("base", "SELECT * FROM {{ source('raw','numbers') }}",
                materialization="ephemeral"))
    r.add(Model("doubled", "SELECT id, v * 2 AS v2 FROM {{ ref('base') }}",
                materialization="view", schema="an"))
    r.add(Model("final", "SELECT sum(v2) AS total FROM {{ ref('doubled') }}",
                materialization="table", schema="an"))
    return r


@pytest.fixture()
def raw_numbers(spark):
    drop_table(spark, "raw_numbers")
    spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id int, v int") \
        .write.mode("overwrite").saveAsTable("raw_numbers")
    return "raw_numbers"


def test_resolver_refs_sources_this(registry):
    m = registry.get("doubled")
    compiled = compile_model(registry, m)
    # ephemeral ref inlined as CTE over the resolved source
    assert "WITH __cte_base AS (SELECT * FROM raw_numbers)" in compiled.sql
    assert "FROM __cte_base" in compiled.sql
    assert compiled.depends_on == ["base"]
    assert find_refs(registry.get("final").sql_body) == ["doubled"]


def test_resolver_this_and_incremental_blocks():
    r = ModelRegistry()
    r.add(Model(
        "inc",
        "SELECT * FROM t {% if is_incremental() %} WHERE ts > "
        "(SELECT max(ts) FROM {{ this }}) {% endif %}",
        materialization="incremental",
        schema="an",
        incremental=IncrementalConfig(strategy="append"),
    ))
    first = compile_model(r, r.get("inc"), is_incremental_run=False)
    assert "WHERE" not in first.sql
    later = compile_model(r, r.get("inc"), is_incremental_run=True)
    assert "WHERE ts > (SELECT max(ts) FROM an.inc)" in later.sql


def test_resolver_circular_ref():
    r = ModelRegistry()
    r.add(Model("a", "SELECT * FROM {{ ref('b') }}", materialization="ephemeral"))
    r.add(Model("b", "SELECT * FROM {{ ref('a') }}", materialization="ephemeral"))
    r.add(Model("c", "SELECT * FROM {{ ref('a') }}"))
    with pytest.raises(ValidationError, match="circular"):
        compile_model(r, r.get("c"))


def test_dag_and_selectors(registry):
    g = build_graph(registry)
    assert g == {"base": set(), "doubled": {"base"}, "final": {"doubled"}}
    assert topo_order(g) == ["base", "doubled", "final"]
    assert select(g, "doubled") == ["doubled"]
    assert select(g, "+final") == ["base", "doubled", "final"]
    assert select(g, "base+") == ["base", "doubled", "final"]
    assert select(g, "+doubled+") == ["base", "doubled", "final"]
    assert select(g, None) == ["base", "doubled", "final"]
    with pytest.raises(ValidationError):
        select(g, "nope")


def test_runner_build_and_compile(spark, registry, raw_numbers):
    runner = ModelRunner(spark, registry)
    report = runner.invoke("run")
    assert report.executed == ["doubled", "final"]  # ephemeral skipped
    assert spark.table("an.final").collect()[0]["total"] == 120
    compiled = runner.invoke("compile").compiled
    assert "raw_numbers" in compiled["doubled"]
    spark.sql("DROP DATABASE IF EXISTS an CASCADE")


def test_incremental_model_merge(spark):
    drop_table(spark, "src_rows")
    spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100)], "id int, s string, ts int"
    ).write.mode("overwrite").saveAsTable("src_rows")
    r = ModelRegistry()
    r.add(Model(
        "inc_m",
        "SELECT * FROM src_rows {% if is_incremental() %}"
        "WHERE ts > (SELECT max(ts) FROM {{ this }}){% endif %}",
        materialization="incremental",
        schema="an2",
        incremental=IncrementalConfig(unique_key="id", strategy="merge",
                                      updated_at="ts"),
    ))
    runner = ModelRunner(spark, r)
    runner.invoke("run")
    assert spark.table("an2.inc_m").count() == 2
    # new + updated rows appear in source
    spark.createDataFrame(
        [(1, "a", 100), (2, "B", 200), (3, "c", 300)], "id int, s string, ts int"
    ).write.mode("overwrite").saveAsTable("src_rows")
    runner.invoke("run")
    got = {(r_.id, r_.s, r_.ts) for r_ in spark.table("an2.inc_m").collect()}
    assert got == {(1, "a", 100), (2, "B", 200), (3, "c", 300)}
    # full refresh rebuilds from scratch
    runner.invoke("run", full_refresh=True)
    assert spark.table("an2.inc_m").count() == 3
    spark.sql("DROP DATABASE IF EXISTS an2 CASCADE")


def test_incremental_delete_insert_and_schema_change(spark):
    drop_table(spark, "src_di")
    spark.createDataFrame([(1, 5), (2, 6)], "id int, v int") \
        .write.mode("overwrite").saveAsTable("src_di")
    r = ModelRegistry()
    r.add(Model(
        "di", "SELECT * FROM src_di",
        materialization="incremental", schema="an3",
        incremental=IncrementalConfig(unique_key="id", strategy="delete+insert",
                                      on_schema_change="fail"),
    ))
    runner = ModelRunner(spark, r)
    runner.invoke("run")
    spark.createDataFrame([(2, 60), (3, 70)], "id int, v int") \
        .write.mode("overwrite").saveAsTable("src_di")
    runner.invoke("run")
    got = {(x.id, x.v) for x in spark.table("an3.di").collect()}
    assert got == {(1, 5), (2, 60), (3, 70)}
    # schema drift with fail
    spark.createDataFrame([(4, 1, "x")], "id int, v int, extra string") \
        .write.mode("overwrite").saveAsTable("src_di")
    with pytest.raises(SchemaContractViolation):
        runner.invoke("run")
    spark.sql("DROP DATABASE IF EXISTS an3 CASCADE")


def test_data_tests(spark):
    drop_table(spark, "t_orders")
    drop_table(spark, "t_parents")
    spark.createDataFrame(
        [(1, "new", 5), (2, "new", None), (2, "old", 8), (None, "bad", 9)],
        "id int, status string, v int",
    ).write.mode("overwrite").saveAsTable("t_orders")
    spark.createDataFrame([(1,), (2,)], "id int") \
        .write.mode("overwrite").saveAsTable("t_parents")

    assert run_test(spark, "t_orders", "id", "not_null").violations == 1
    assert run_test(spark, "t_orders", "id", "unique").violations == 1  # id=2 twice
    assert run_test(
        spark, "t_orders", "status", "accepted_values",
        {"values": ["new", "old"]},
    ).violations == 1
    assert run_test(
        spark, "t_orders", "id", "relationships",
        {"to": "t_parents", "field": "id"},
    ).violations == 0
    assert run_test(
        spark, "t_orders", "v", "accepted_range", {"min_value": 0, "max_value": 8}
    ).violations == 1
    assert run_test(
        spark, "t_orders", "v", "not_null_proportion", {"at_least": 0.9}
    ).violations == 1
    assert run_test(spark, "t_orders", "status", "not_constant").violations == 0
    assert run_test(
        spark, "t_orders", "v", "expression_is_true", {"expression": "v > 0"}
    ).violations == 1  # NULL v counts as violation
    with pytest.raises(ValidationError):
        violation_sql("t", "c", "accepted_values")


def test_sequential_values(spark):
    drop_table(spark, "t_seq")
    spark.createDataFrame([(1,), (2,), (3,), (5,)], "n int") \
        .write.mode("overwrite").saveAsTable("t_seq")
    assert run_test(spark, "t_seq", "n", "sequential_values",
                    {"interval": 1}).violations == 1


def test_freshness(spark):
    drop_table(spark, "t_fresh")
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1),), (2, dt.datetime(2024, 1, 10))],
        "id int, loaded_at timestamp",
    ).write.mode("overwrite").saveAsTable("t_fresh")
    as_of = dt.datetime(2024, 1, 11)
    r1 = check_freshness(spark, "t_fresh", "loaded_at",
                         warn_after=(2, "days"), error_after=(7, "days"),
                         as_of=as_of)
    assert r1.status == "pass"
    r2 = check_freshness(spark, "t_fresh", "loaded_at",
                         warn_after=(12, "hours"), as_of=as_of)
    assert r2.status == "warn"
    r3 = check_freshness(spark, "t_fresh", "loaded_at",
                         error_after=(12, "hours"), as_of=as_of)
    assert r3.status == "error"


def test_scd2_timestamp_and_check(spark):
    runner = SnapshotRunner(spark)
    tgt = "snap_goods"
    drop_table(spark, tgt)
    b1 = spark.createDataFrame(
        [(1, "x", 10.0, dt.datetime(2024, 1, 1)),
         (2, "y", 20.0, dt.datetime(2024, 1, 1))],
        "id int, name string, price double, updated_at timestamp",
    )
    cfg = SnapshotConfig(unique_key="id", strategy="timestamp",
                         updated_at="updated_at")
    n1 = runner.run(b1, tgt, cfg)
    assert n1 == 2
    # batch 2: id=2 changed, id=3 new, id=1 unchanged
    b2 = spark.createDataFrame(
        [(1, "x", 10.0, dt.datetime(2024, 1, 1)),
         (2, "y", 25.0, dt.datetime(2024, 2, 1)),
         (3, "z", 30.0, dt.datetime(2024, 2, 1))],
        "id int, name string, price double, updated_at timestamp",
    )
    n2 = runner.run(b2, tgt, cfg)
    assert n2 == 2  # changed id=2 + new id=3
    hist = spark.table(tgt)
    assert hist.count() == 4
    cur = {(r.id, r.price) for r in
           hist.filter("dbt_valid_to IS NULL").collect()}
    assert cur == {(1, 10.0), (2, 25.0), (3, 30.0)}
    closed = hist.filter("dbt_valid_to IS NOT NULL").collect()
    assert len(closed) == 1 and closed[0].id == 2
    assert closed[0].dbt_valid_to == dt.datetime(2024, 2, 1)

    # check strategy
    tgt2 = "snap_check"
    drop_table(spark, tgt2)
    cfg2 = SnapshotConfig(unique_key="id", strategy="check",
                          check_cols=["price"])
    c1 = spark.createDataFrame([(1, 10.0), (2, None)], "id int, price double")
    runner.run(c1, tgt2, cfg2, as_of=dt.datetime(2024, 1, 1))
    c2 = spark.createDataFrame([(1, 10.0), (2, 5.0)], "id int, price double")
    n = runner.run(c2, tgt2, cfg2, as_of=dt.datetime(2024, 2, 1))
    assert n == 1  # null→5.0 detected null-safely; id=1 unchanged
    cur2 = {(r.id, r.price) for r in
            spark.table(tgt2).filter("dbt_valid_to IS NULL").collect()}
    assert cur2 == {(1, 10.0), (2, 5.0)}


def test_model_validation():
    with pytest.raises(ValidationError):
        Model("bad name!", "SELECT 1")
    with pytest.raises(ValidationError):
        Model("m", "")
    with pytest.raises(ValidationError):
        Model("m", "SELECT 1", materialization="matview")
    with pytest.raises(ValidationError):
        IncrementalConfig(strategy="merge")  # needs unique_key
    with pytest.raises(ValidationError):
        IncrementalConfig(strategy="replace")
    with pytest.raises(ValidationError):
        SnapshotConfig(unique_key="id", strategy="timestamp")


def test_runner_tests_command(spark, registry, raw_numbers):
    registry.get("doubled").tests.append(ColumnTest("v2", "not_null"))
    registry.get("doubled").tests.append(
        ColumnTest("v2", "accepted_range", {"min_value": 0})
    )
    runner = ModelRunner(spark, registry)
    report = runner.invoke("build")
    assert report.tests_passed
    assert len(report.test_results) == 2
    assert report.rows_affected > 0
    spark.sql("DROP DATABASE IF EXISTS an CASCADE")


def test_scd2_merge_into_sql_and_routing(spark, monkeypatch):
    """SCD2 takes the transactional MERGE branch when the target is a
    Delta/Iceberg table (statement semantics: updates close the
    matched current version on dbt_scd_id; inserts add new versions)."""
    from datanika_core_spark.operators.scd2 import (
        SCD_ID, VALID_TO, SnapshotConfig, SnapshotRunner,
    )
    from datanika_core_spark.operators.writers import drop_table

    sql = SnapshotRunner.merge_into_sql("snap.t", "stg")
    assert f"ON t.{SCD_ID} = s.{SCD_ID} AND t.{VALID_TO} IS NULL" in sql
    assert f"WHEN MATCHED AND s.__change = 'update' "\
           f"THEN UPDATE SET t.{VALID_TO} = s.{VALID_TO}" in sql
    assert "WHEN NOT MATCHED AND s.__change = 'insert' THEN INSERT *" in sql

    drop_table(spark, "t_scd_route")
    runner = SnapshotRunner(spark)
    src1 = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00")], "id int, v string, upd string"
    ).withColumn("upd", __import__("pyspark").sql.functions.col("upd").cast("timestamp_ntz"))
    cfg = SnapshotConfig(unique_key="id", strategy="timestamp", updated_at="upd")
    runner.run(src1, "t_scd_route", cfg)

    called = {}
    monkeypatch.setattr(
        runner, "_merge_into",
        lambda table, ins, closing: (called.setdefault("table", table), 7)[1],
    )
    monkeypatch.setattr(
        runner.writer, "table_provider", lambda t: "iceberg"
    )
    src2 = spark.createDataFrame(
        [(1, "b", "2024-02-01 00:00:00")], "id int, v string, upd string"
    ).withColumn("upd", __import__("pyspark").sql.functions.col("upd").cast("timestamp_ntz"))
    assert runner.run(src2, "t_scd_route", cfg) == 7
    assert called["table"] == "t_scd_route"
    drop_table(spark, "t_scd_route")


def test_on_schema_change_named_modes(spark):
    """dbt's four on_schema_change modes (dbt-core incremental
    semantics): ignore drops new cols, append_new_columns evolves the
    target, sync_all_columns also REMOVES departed target columns."""
    import pyspark.sql.functions as F  # noqa: N812

    def _mk(name, mode):
        drop_table(spark, f"src_{name}")
        spark.createDataFrame([(1, 5)], "id int, v int") \
            .write.mode("overwrite").saveAsTable(f"src_{name}")
        r = ModelRegistry()
        r.add(Model(
            name, f"SELECT * FROM src_{name}",
            materialization="incremental", schema="an4",
            incremental=IncrementalConfig(
                unique_key="id", strategy="merge", on_schema_change=mode),
        ))
        runner = ModelRunner(spark, r)
        runner.invoke("run")
        return runner

    # ignore: the new column never reaches the target
    runner = _mk("m_ig", "ignore")
    spark.createDataFrame([(2, 6, "x")], "id int, v int, extra string") \
        .write.mode("overwrite").saveAsTable("src_m_ig")
    runner.invoke("run")
    assert spark.table("an4.m_ig").columns == ["id", "v"]
    assert spark.table("an4.m_ig").count() == 2

    # append_new_columns: target evolves; old rows NULL in new col;
    # a column DEPARTING the batch is kept (NULL-filled)
    runner = _mk("m_app", "append_new_columns")
    spark.createDataFrame([(2, 6, "x")], "id int, v int, extra string") \
        .write.mode("overwrite").saveAsTable("src_m_app")
    runner.invoke("run")
    got = {tuple(r) for r in spark.table("an4.m_app").collect()}
    assert got == {(1, 5, None), (2, 6, "x")}
    spark.createDataFrame([(3, 7)], "id int, v int") \
        .write.mode("overwrite").saveAsTable("src_m_app")
    runner.invoke("run")
    assert set(spark.table("an4.m_app").columns) == {"id", "v", "extra"}
    assert spark.table("an4.m_app").filter(F.col("id") == 3).collect()[0].extra is None

    # sync_all_columns: departed column is DROPPED from the target
    runner = _mk("m_sync", "sync_all_columns")
    spark.createDataFrame([(2, "y")], "id int, extra string") \
        .write.mode("overwrite").saveAsTable("src_m_sync")
    runner.invoke("run")
    assert set(spark.table("an4.m_sync").columns) == {"id", "extra"}
    got = {tuple(r) for r in spark.table("an4.m_sync").collect()}
    assert got == {(1, None), (2, "y")}
    spark.sql("DROP DATABASE IF EXISTS an4 CASCADE")


def test_sync_all_columns_with_this_subquery(spark):
    """Regression: a sync_all_columns run whose batch reads {{ this }}
    (the canonical is_incremental pattern). The departed-column drop
    rewrites the target's files; the lazy batch plan was pinned to the
    OLD files and the second run died with FileNotFoundException,
    leaving the target narrowed but unmerged. The batch must be
    materialized before the target swap."""
    drop_table(spark, "src_m_this")
    spark.createDataFrame(
        [(1, 5, "a")], "id int, v int, extra string"
    ).write.mode("overwrite").saveAsTable("src_m_this")
    r = ModelRegistry()
    r.add(Model(
        "m_this",
        "SELECT * FROM src_m_this {% if is_incremental() %}"
        "WHERE id > (SELECT coalesce(max(id), -1) FROM {{ this }})"
        "{% endif %}",
        materialization="incremental", schema="an5",
        incremental=IncrementalConfig(
            unique_key="id", strategy="merge",
            on_schema_change="sync_all_columns"),
    ))
    runner = ModelRunner(spark, r)
    runner.invoke("run")
    # second run: 'extra' departs the source -> target must be narrowed
    # AND the batch (which read {{ this }}) must still land
    spark.createDataFrame([(2, 6)], "id int, v int") \
        .write.mode("overwrite").saveAsTable("src_m_this")
    runner.invoke("run")
    assert set(spark.table("an5.m_this").columns) == {"id", "v"}
    got = {tuple(r_) for r_ in spark.table("an5.m_this").collect()}
    assert got == {(1, 5), (2, 6)}
    drop_table(spark, "src_m_this")
    spark.sql("DROP DATABASE IF EXISTS an5 CASCADE")


def test_incremental_insert_overwrite_replaces_only_batch_partitions(spark):
    """dbt-on-Spark's partition-replacing strategy: run 2's batch
    carries days 3-4 only → day 3 is atomically replaced, day 4
    appears, days 1-2 are untouched (and never rewritten)."""
    drop_table(spark, "src_io")
    spark.createDataFrame(
        [(1, "d1", 10), (2, "d2", 10), (3, "d3", 10)],
        "id int, day string, v int",
    ).write.mode("overwrite").saveAsTable("src_io")
    r = ModelRegistry()
    r.add(Model(
        "io_m",
        "SELECT * FROM src_io {% if is_incremental() %}"
        "WHERE day >= 'd3'{% endif %}",
        materialization="incremental",
        schema="an_io",
        incremental=IncrementalConfig(
            strategy="insert_overwrite", partition_by="day",
        ),
    ))
    runner = ModelRunner(spark, r)
    runner.invoke("run")
    assert spark.table("an_io.io_m").count() == 3

    # day 3 changes, day 4 appears; days 1-2 also "change" in the
    # source but are NOT in the batch window → must stay at v=10
    spark.createDataFrame(
        [(1, "d1", 99), (2, "d2", 99), (3, "d3", 20), (4, "d4", 30),
         (5, "d3", 21)],
        "id int, day string, v int",
    ).write.mode("overwrite").saveAsTable("src_io")
    res = runner.invoke("run")
    got = {(x.id, x.day, x.v) for x in spark.table("an_io.io_m").collect()}
    assert got == {
        (1, "d1", 10), (2, "d2", 10),          # untouched partitions
        (3, "d3", 20), (5, "d3", 21),          # replaced partition
        (4, "d4", 30),                          # new partition
    }
    # rows_affected reports the batch size, not the table size
    assert res.rows_affected == 3
    assert "io_m" in res.executed
    spark.sql("DROP DATABASE IF EXISTS an_io CASCADE")


def test_insert_overwrite_requires_partition_by():
    with pytest.raises(ValidationError):
        IncrementalConfig(strategy="insert_overwrite")


def test_snapshot_invalidate_hard_deletes(spark):
    import datetime as dt
    from datanika_core_spark.operators.scd2 import SnapshotRunner

    runner = SnapshotRunner(spark)
    tgt = "snap_hard_del"
    drop_table(spark, tgt)
    cfg = SnapshotConfig(unique_key="id", strategy="check",
                         check_cols=["v"], invalidate_hard_deletes=True)
    b1 = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id int, v int")
    runner.run(b1, tgt, cfg, as_of=dt.datetime(2024, 1, 1))
    # id=3 disappears; id=2 changes
    b2 = spark.createDataFrame([(1, 10), (2, 21)], "id int, v int")
    runner.run(b2, tgt, cfg, as_of=dt.datetime(2024, 2, 1))
    hist = spark.table(tgt)
    cur = {(r.id, r.v) for r in hist.filter("dbt_valid_to IS NULL").collect()}
    assert cur == {(1, 10), (2, 21)}          # id=3 no longer current
    closed = {(r.id, str(r.dbt_valid_to))
              for r in hist.filter("dbt_valid_to IS NOT NULL").collect()}
    assert closed == {(2, "2024-02-01 00:00:00"), (3, "2024-02-01 00:00:00")}

    # without the flag, the vanished key stays current (dbt default)
    tgt2 = "snap_soft_del"
    drop_table(spark, tgt2)
    cfg2 = SnapshotConfig(unique_key="id", strategy="check", check_cols=["v"])
    runner.run(b1, tgt2, cfg2, as_of=dt.datetime(2024, 1, 1))
    runner.run(b2, tgt2, cfg2, as_of=dt.datetime(2024, 2, 1))
    cur2 = {r.id for r in
            spark.table(tgt2).filter("dbt_valid_to IS NULL").collect()}
    assert cur2 == {1, 2, 3}
