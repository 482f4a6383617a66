"""Live JDBC integration against embedded Apache Derby (ships inside
the Spark distribution), exercising the full S1/S2/K1/W6 path for
real: url build → driver load → write-back (K1 destination) →
catalog enumeration (S1 full database) → fetch (S2 single table) →
warehouse ingestion round-trip.

Reference behavior being validated: dlt's sql_database/sql_table
extraction + destination factory (dlt_runner.py:98-132, 262-289).
Skips cleanly when no Derby driver is on Spark's classpath.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.ingest import IngestionJob
from datanika_core_spark.operators.incremental import CursorStateStore
from datanika_core_spark.sources.jdbc import (
    JdbcDestination,
    JdbcSource,
    JdbcTableSource,
    url_for,
)
from datanika_core_spark.specs import UploadSpec


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.derby.jdbc.EmbeddedDriver"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


@pytest.fixture(scope="module")
def derby_cfg(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on Spark classpath")
    db = str(tmp_path_factory.mktemp("derby") / "testdb")
    return {"database": db, "create": True}


def test_url_for_derby(derby_cfg):
    url = url_for("derby", derby_cfg)
    assert url == f"jdbc:derby:{derby_cfg['database']};create=true"
    assert url_for("derby", {"database": "/x/db"}) == "jdbc:derby:/x/db"


def test_k1_destination_write_and_s2_single_table_read(spark, derby_cfg):
    """Round-trip: Spark df --JDBC write--> Derby --JDBC read--> Spark."""
    dest = JdbcDestination("derby", derby_cfg, batch_size=2)
    df = spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", 20.25), (3, "c", 30.0)],
        "id int, name string, amount double",
    )
    dest.write(df, "users", mode="overwrite")

    src = JdbcSource(spark, "derby", derby_cfg, batch_size=2)
    back = src.read_table("users")
    assert back.schema.simpleString() == (
        "struct<id:int,name:string,amount:double>"
    )
    assert {tuple(r) for r in back.collect()} == {
        (1, "a", 10.5), (2, "b", 20.25), (3, "c", 30.0)
    }
    # fetchsize (W6) actually reaches the reader options
    assert src.reader("users").option("fetchsize", "2") is not None


def test_s1_full_database_enumeration_and_ingest(spark, engine, derby_cfg, tmp_path):
    """Full-database mode: enumerate Derby's APP schema via its system
    catalog, extract every table, land both in the warehouse through
    the standard IngestionJob path."""
    dest = JdbcDestination("derby", derby_cfg)
    dest.write(
        spark.createDataFrame([(1, "x"), (2, "y")], "id int, tag string"),
        "t_alpha", mode="overwrite",
    )
    dest.write(
        spark.createDataFrame([(9, 1.5)], "k int, v double"),
        "t_beta", mode="overwrite",
    )

    src = JdbcSource(spark, "derby", derby_cfg)
    # Spark's JDBC writer passes the table name unquoted, so Derby
    # normalizes to uppercase; TableBatch lowercases for landing.
    names = src.list_tables()
    assert {"T_ALPHA", "T_BETA", "USERS"} <= set(names)

    job = IngestionJob(engine, CursorStateStore(str(tmp_path / "c.json")))
    spec = UploadSpec.from_config(
        "derby land", {"mode": "full_database", "write_disposition": "replace"}
    )
    res = job.run(
        spec,
        JdbcTableSource(src, table=None),
    )
    assert res.dataset == "derby_land"
    landed = {r.table for r in res.table_results}
    assert {"derby_land.t_alpha", "derby_land.t_beta", "derby_land.users"} <= landed
    assert spark.table("derby_land.t_alpha").count() == 2
    # W7: rows_loaded is the sum of source batch rows
    assert res.rows_loaded == sum(
        spark.table(t).count() for t in landed
    )
    spark.sql("DROP DATABASE IF EXISTS derby_land CASCADE")


def test_jdbc_query_passthrough(spark, derby_cfg):
    """Q1 over JDBC: dialect SQL runs on the remote engine, result
    lands as a DataFrame (predicate stays remote-side)."""
    src = JdbcSource(spark, "derby", derby_cfg)
    # dialect SQL: unquoted names normalize to Derby's uppercase
    # storage form; COLUMN names were written quoted-lowercase by
    # Spark's JDBC writer, so they must be quoted here.
    out = src.query(
        'SELECT "id", "amount" * 2 AS dbl FROM users WHERE "id" <= 2'
    )
    got = {tuple(r) for r in out.collect()}
    assert got == {(1, 21.0), (2, 40.5)}


def test_incremental_cursor_over_live_jdbc(spark, engine, derby_cfg, tmp_path):
    """S3 against a LIVE source: first run loads all, a new row lands
    in Derby, second run extracts only the delta."""
    dest = JdbcDestination("derby", derby_cfg)
    dest.write(
        spark.createDataFrame([(1, 100), (2, 200)], "id int, seq int"),
        "inc_t", mode="overwrite",
    )
    src = JdbcSource(spark, "derby", derby_cfg)
    store = CursorStateStore(str(tmp_path / "cur.json"))
    job = IngestionJob(engine, store)
    spec = UploadSpec.from_config(
        "inc land",
        {"mode": "single_table", "table": "inc_t",
         "write_disposition": "append",
         "incremental": {"cursor_path": "seq"}},
    )
    job.run(spec, JdbcTableSource(src, table="inc_t"))
    assert spark.table("inc_land.inc_t").count() == 2
    assert store.get("inc_land", "inc_t") == 200

    dest.write(
        spark.createDataFrame([(3, 300)], "id int, seq int"),
        "inc_t", mode="append",
    )
    res2 = job.run(spec, JdbcTableSource(src, table="inc_t"))
    assert res2.rows_loaded == 1
    assert spark.table("inc_land.inc_t").count() == 3
    assert store.get("inc_land", "inc_t") == 300
    spark.sql("DROP DATABASE IF EXISTS inc_land CASCADE")
