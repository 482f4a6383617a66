"""Write dispositions + schema contracts (W1-W5)."""

from __future__ import annotations

import pytest

from datanika_core_spark.errors import SchemaContractViolation, ValidationError
from datanika_core_spark.operators.writers import (
    SchemaContract,
    TableWriter,
    merge_config_dispositions,
)


@pytest.fixture()
def writer(spark):
    return TableWriter(spark)


def _df(spark, rows, schema="id int, name string, v double"):
    return spark.createDataFrame(rows, schema)


def _rows(spark, table):
    return {
        tuple(r) for r in spark.table(table).collect()
    }


def test_append_and_replace(spark, writer):
    spark.sql("DROP TABLE IF EXISTS t_ar")
    r1 = writer.write(_df(spark, [(1, "a", 1.0)]), "t_ar", "append")
    assert r1.rows_loaded == 1
    r2 = writer.write(_df(spark, [(2, "b", 2.0)]), "t_ar", "append")
    assert r2.rows_loaded == 1
    assert _rows(spark, "t_ar") == {(1, "a", 1.0), (2, "b", 2.0)}
    r3 = writer.write(_df(spark, [(9, "z", 9.0)]), "t_ar", "replace")
    assert r3.rows_loaded == 1
    assert _rows(spark, "t_ar") == {(9, "z", 9.0)}


def test_merge_upserts_on_pk(spark, writer):
    spark.sql("DROP TABLE IF EXISTS t_m")
    writer.write(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), "t_m", "append")
    res = writer.write(
        _df(spark, [(2, "B", 20.0), (3, "c", 3.0)]),
        "t_m",
        "merge",
        primary_key="id",
    )
    # rows_loaded = SOURCE batch rows, not the post-merge table total.
    assert res.rows_loaded == 2
    assert _rows(spark, "t_m") == {(1, "a", 1.0), (2, "B", 20.0), (3, "c", 3.0)}


def test_merge_composite_pk_and_precedence(spark, writer):
    spark.sql("DROP TABLE IF EXISTS t_mc")
    df = spark.createDataFrame(
        [(1, 1, "x", 1), (1, 2, "y", 1)], "a int, b int, s string, seq int"
    )
    writer.write(df, "t_mc", "append")
    batch = spark.createDataFrame(
        [(1, 1, "new1", 2), (1, 1, "new2", 3), (2, 1, "z", 1)],
        "a int, b int, s string, seq int",
    )
    res = writer.write(batch, "t_mc", "merge", primary_key=["a", "b"],
                       precedence_col="seq")
    # rows_loaded counts the batch AFTER precedence dedup (3 rows → 2).
    assert res.rows_loaded == 2
    assert _rows(spark, "t_mc") == {
        (1, 1, "new2", 3),
        (1, 2, "y", 1),
        (2, 1, "z", 1),
    }


def test_merge_requires_pk(spark, writer):
    spark.sql("DROP TABLE IF EXISTS t_pk")
    writer.write(_df(spark, [(1, "a", 1.0)]), "t_pk", "append")
    with pytest.raises(ValidationError):
        writer.write(_df(spark, [(1, "a", 1.0)]), "t_pk", "merge")


def test_contract_evolve_adds_column(spark, writer):
    spark.sql("DROP TABLE IF EXISTS t_ev")
    writer.write(_df(spark, [(1, "a", 1.0)]), "t_ev", "append")
    wide = spark.createDataFrame(
        [(2, "b", 2.0, "extra")], "id int, name string, v double, note string"
    )
    res = writer.write(wide, "t_ev", "append",
                       contract=SchemaContract(columns="evolve"))
    assert res.evolved_columns == ["note"]
    rows = _rows(spark, "t_ev")
    assert (1, "a", 1.0, None) in rows and (2, "b", 2.0, "extra") in rows


def test_contract_freeze_raises(spark, writer):
    spark.sql("DROP TABLE IF EXISTS t_fr")
    writer.write(_df(spark, [(1, "a", 1.0)]), "t_fr", "append")
    wide = spark.createDataFrame(
        [(2, "b", 2.0, "x")], "id int, name string, v double, note string"
    )
    with pytest.raises(SchemaContractViolation):
        writer.write(wide, "t_fr", "append",
                     contract=SchemaContract(columns="freeze"))


def test_contract_discards(spark, writer):
    spark.sql("DROP TABLE IF EXISTS t_dv")
    writer.write(_df(spark, [(1, "a", 1.0)]), "t_dv", "append")
    wide = spark.createDataFrame(
        [(2, "b", 2.0, "x"), (3, "c", 3.0, None)],
        "id int, name string, v double, note string",
    )
    writer.write(wide, "t_dv", "append",
                 contract=SchemaContract(columns="discard_value"))
    assert {r[0] for r in _rows(spark, "t_dv")} == {1, 2, 3}

    spark.sql("DROP TABLE IF EXISTS t_dr")
    writer.write(_df(spark, [(1, "a", 1.0)]), "t_dr", "append")
    writer.write(wide, "t_dr", "append",
                 contract=SchemaContract(columns="discard_row"))
    # row 2 had a value in the unknown column → dropped; row 3 kept
    assert {r[0] for r in _rows(spark, "t_dr")} == {1, 3}


def test_contract_tables_freeze_blocks_new_table(spark, writer):
    spark.sql("DROP TABLE IF EXISTS t_new")
    with pytest.raises(SchemaContractViolation):
        writer.write(_df(spark, [(1, "a", 1.0)]), "t_new", "append",
                     contract=SchemaContract(tables="freeze"))
    res = writer.write(_df(spark, [(1, "a", 1.0)]), "t_new", "append",
                       contract=SchemaContract(tables="discard_row"))
    assert res.rows_loaded == 0 and not spark.catalog.tableExists("t_new")


def test_contract_data_type_modes(spark, writer):
    spark.sql("DROP TABLE IF EXISTS t_dt")
    writer.write(_df(spark, [(1, "a", 1.0)]), "t_dt", "append")
    drift = spark.createDataFrame(
        [(2, "b", "not-a-number"), (3, "c", "4.5")],
        "id int, name string, v string",
    )
    with pytest.raises(SchemaContractViolation):
        writer.write(drift, "t_dt", "append",
                     contract=SchemaContract(data_type="freeze"))
    writer.write(drift, "t_dt", "append",
                 contract=SchemaContract(data_type="discard_row"))
    # "not-a-number" can't cast → row dropped; "4.5" casts
    assert _rows(spark, "t_dt") == {(1, "a", 1.0), (3, "c", 4.5)}


def test_merge_config_dispositions():
    plan = merge_config_dispositions(
        ["a", "b", "c"],
        {"b": {"primary_key": "id"}, "c": {"primary_key": ["x", "y"]}},
    )
    assert plan == {
        "a": ("append", None),
        "b": ("merge", "id"),
        "c": ("merge", ["x", "y"]),
    }
    with pytest.raises(ValidationError):
        merge_config_dispositions(["a"], {"a": {}})


# -- transactional MERGE INTO branch ----------------------------------------


def test_merge_into_sql_text():
    sql = TableWriter.merge_into_sql("db.orders", "src_v", ["id"])
    assert sql == (
        "MERGE INTO db.orders t USING src_v s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    sql2 = TableWriter.merge_into_sql("t2", "v", ["a", "b"])
    assert "ON t.a = s.a AND t.b = s.b" in sql2


def test_merge_routes_to_merge_into_for_transactional_provider(
    spark, writer, monkeypatch
):
    """Provider detection gates the transactional branch: a
    Delta/Iceberg target takes MERGE INTO; parquet composes the swap."""
    spark.sql("DROP TABLE IF EXISTS t_route")
    writer.write(_df(spark, [(1, "a", 1.0)]), "t_route", "append")
    assert writer.table_provider("t_route") == "parquet"

    calls = {}

    def fake_merge_into(source, table, pk):
        calls["args"] = (table, pk)
        return -1

    monkeypatch.setattr(writer, "_merge_into", fake_merge_into)
    monkeypatch.setattr(writer, "table_provider", lambda t: "delta")
    res = writer.write(
        _df(spark, [(2, "b", 2.0)]), "t_route", "merge", primary_key="id"
    )
    assert calls["args"] == ("t_route", ["id"]) and res.rows_loaded == -1


def _delta_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("delta") is not None


@pytest.mark.skipif(not _delta_available(), reason="delta-spark not installed")
def test_merge_into_live_delta(spark, writer):
    """Same upsert assertions as test_merge_upserts_on_pk, through the
    transactional branch (runs only where delta-spark is present)."""
    spark.sql("DROP TABLE IF EXISTS t_md")
    _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]).write.format("delta").saveAsTable("t_md")
    res = writer.write(
        _df(spark, [(2, "B", 20.0), (3, "c", 3.0)]),
        "t_md", "merge", primary_key="id",
    )
    assert res.rows_loaded == 2
    assert _rows(spark, "t_md") == {(1, "a", 1.0), (2, "B", 20.0), (3, "c", 3.0)}


def test_empty_batch_dispositions(spark, writer):
    """Empty source batches: writes succeed, rows_loaded == 0, target
    data unchanged — the observe()-based accounting must complete
    (not hang) on zero-row plans."""
    spark.sql("DROP TABLE IF EXISTS t_empty")
    writer.write(_df(spark, [(1, "a", 1.0)]), "t_empty", "append")
    empty = _df(spark, [(1, "a", 1.0)]).filter("id < 0")

    res_a = writer.write(empty, "t_empty", "append")
    assert res_a.rows_loaded == 0
    res_m = writer.write(empty, "t_empty", "merge", primary_key="id")
    assert res_m.rows_loaded == 0
    assert _rows(spark, "t_empty") == {(1, "a", 1.0)}

    res_r = writer.write(empty, "t_empty", "replace")
    assert res_r.rows_loaded == 0
    assert spark.table("t_empty").count() == 0


def test_swap_in_recovers_from_orphaned_dirs(spark, writer):
    """A crash can leave `<table>__old` / `<table>__stage` warehouse
    DIRECTORIES with no catalog entry; the next swap must clear them
    (DROP TABLE IF EXISTS alone does not), else RENAME TO fails on the
    occupied location."""
    import os
    from urllib.parse import urlparse

    spark.sql("DROP TABLE IF EXISTS t_orph")
    writer.write(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), "t_orph", "append")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    root = wh.path or wh.netloc
    for suffix in ("__old", "__stage"):
        orphan = os.path.join(root, f"t_orph{suffix}")
        os.makedirs(orphan, exist_ok=True)
        with open(os.path.join(orphan, "junk.parquet"), "w") as fh:
            fh.write("not parquet")
    res = writer.write(
        _df(spark, [(2, "B", 20.0)]), "t_orph", "merge", primary_key="id"
    )
    assert res.rows_loaded == 1
    assert _rows(spark, "t_orph") == {(1, "a", 1.0), (2, "B", 20.0)}
    spark.sql("DROP TABLE IF EXISTS t_orph")


def test_recover_swap_all_crash_states(spark):
    """Each staged-swap crash window must be recoverable: stage-only
    debris cleared, the mid-rename window rolled forward (the stage
    is complete by construction), the leftover old copy dropped."""
    from datanika_core_spark.operators.writers import (
        TableWriter,
        drop_table,
        recover_swap,
    )

    tbl = "default.swapcrash_t"
    stage, old = f"{tbl}__stage", f"{tbl}__old"
    w = TableWriter(spark)
    d1 = spark.createDataFrame([(1, "a")], "id bigint, v string")
    d2 = spark.createDataFrame([(2, "b")], "id bigint, v string")

    def reset():
        for t in (tbl, stage, old):
            drop_table(spark, t)

    # healthy: no-op
    reset()
    w.write(d1, tbl, "replace")
    assert recover_swap(spark, tbl) == "none"

    # crash before the renames: stage is debris, target untouched
    d2.write.saveAsTable(stage)
    assert recover_swap(spark, tbl) == "cleared_stage"
    assert not spark.catalog.tableExists(stage)
    assert {r.id for r in spark.table(tbl).collect()} == {1}

    # crash between the renames: roll the complete stage forward
    spark.sql(f"ALTER TABLE {tbl} RENAME TO {old}")
    d2.write.saveAsTable(stage)
    assert recover_swap(spark, tbl) == "rolled_forward"
    assert {r.id for r in spark.table(tbl).collect()} == {2}
    assert not spark.catalog.tableExists(old)
    assert not spark.catalog.tableExists(stage)

    # crash after the swap: leftover old copy dropped
    d1.write.saveAsTable(old)
    assert recover_swap(spark, tbl) == "dropped_old"
    assert {r.id for r in spark.table(tbl).collect()} == {2}
    assert not spark.catalog.tableExists(old)

    # idempotent: running recovery twice is safe
    assert recover_swap(spark, tbl) == "none"
    reset()
