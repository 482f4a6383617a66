"""Q4 connection test + Q5 ref()/source() autocomplete.

Reference semantics: ConnectionService.test_connection
(connection_service.py:221-258) and the SQL-editor suggestion state
machine (transformation_state.py:17-19,608-704).
"""

from __future__ import annotations

import pytest

from datanika_core_spark.plans.autocomplete import complete, suggest
from datanika_core_spark.plans.models import Model, ModelRegistry
# aliased: pytest would otherwise collect the imported op as a test
from datanika_core_spark.sources.connection_test import (
    test_connection as check_connection,
)


# -- Q4: test_connection ---------------------------------------------------

def test_empty_config_refused(spark):
    assert check_connection(spark, "postgres", {}) == (
        False, "Configuration is empty"
    )
    assert check_connection(spark, "postgres", None)[0] is False


def test_non_db_types_not_applicable(spark):
    for t in ("rest_api", "google_sheets", "s3"):
        ok, msg = check_connection(spark, t, {"anything": 1})
        assert ok is True
        assert msg == "Test not applicable for this type"


def test_filesystem_probe_extension(spark, tmp_path):
    ok, msg = check_connection(spark, "parquet", {"path": str(tmp_path)})
    assert ok is True and msg == "Connected successfully"
    ok, msg = check_connection(
        spark, "csv", {"path": str(tmp_path / "nope.csv")}
    )
    assert ok is False and "Path not found" in msg


def test_unknown_type_reports_url_error(spark):
    ok, msg = check_connection(spark, "oracle", {"database": "x"})
    assert ok is False
    assert "oracle" in msg  # the ValidationError text, verbatim


def test_mongodb_driver_not_installed(spark):
    pytest.importorskip  # noqa: B018 — documents intent
    try:
        import pymongo  # noqa: F401

        pytest.skip("pymongo present — live Mongo path not testable here")
    except ImportError:
        pass
    ok, msg = check_connection(spark, "mongodb", {"host": "localhost"})
    assert (ok, msg) == (False, "Driver not installed for mongodb")


def test_jdbc_probe_live_derby(spark, tmp_path):
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.derby.jdbc.EmbeddedDriver"
        )
    except Exception:  # noqa: BLE001
        pytest.skip("Derby JDBC driver not on Spark classpath")
    cfg = {"database": str(tmp_path / "conn_testdb"), "create": True}
    ok, msg = check_connection(spark, "derby", cfg)
    assert (ok, msg) == (True, "Connected successfully")


def test_jdbc_probe_unreachable_host_masks_cause(spark):
    # closed port on localhost: the probe fails with the reference's
    # masked message, never an exception
    cfg = {"host": "127.0.0.1", "port": 1, "database": "nope",
           "user": "u", "password": "p"}
    ok, msg = check_connection(spark, "postgres", cfg, timeout=2)
    assert ok is False
    assert msg == (
        "Connection failed — check your credentials and network settings"
    )


# -- Q5: autocomplete ------------------------------------------------------

@pytest.fixture()
def reg():
    r = ModelRegistry()
    r.add(Model("orders_clean", "SELECT 1", materialization="view"))
    r.add(Model("orders_daily", "SELECT 1", materialization="view"))
    r.add(Model("users", "SELECT 1", materialization="view"))
    r.add_source("raw", "orders", "raw_orders")
    r.add_source("raw", "order_items", "raw_order_items")
    r.add_source("crm", "accounts", "crm_accounts")
    return r


def test_ref_prefix_suggestions(reg):
    assert suggest(reg, "SELECT * FROM {{ ref('ord") == [
        "orders_clean", "orders_daily",
    ]
    assert suggest(reg, "SELECT * FROM {{ ref('") == [
        "orders_clean", "orders_daily", "users",
    ]
    assert suggest(reg, "SELECT * FROM {{ ref('ORD") == [
        "orders_clean", "orders_daily",
    ]  # case-insensitive
    assert suggest(reg, "SELECT * FROM {{ ref('zzz") == []


def test_source_schema_then_table_suggestions(reg):
    assert suggest(reg, "{{ source('") == ["crm", "raw"]
    assert suggest(reg, "{{ source('r") == ["raw"]
    assert suggest(reg, "{{ source('raw', '") == ["order_items", "orders"]
    assert suggest(reg, "{{ source('raw', 'orders") == ["orders"]
    assert suggest(reg, "{{ source('nope', '") == []


def test_most_specific_pattern_wins(reg):
    # an open source-table call also matches the schema/ref regexes'
    # shape upstream; table completion must win
    sql = "SELECT * FROM {{ source('raw', 'ord"
    assert suggest(reg, sql) == ["order_items", "orders"]


def test_closed_call_suggests_nothing(reg):
    assert suggest(reg, "SELECT * FROM {{ ref('users') }}") == []
    assert suggest(reg, "SELECT 1") == []


def test_complete_ref_and_source(reg):
    assert complete("FROM {{ ref('ord", "orders_clean") == (
        "FROM {{ ref('orders_clean') }}"
    )
    assert complete("FROM {{ source('r", "raw") == (
        "FROM {{ source('raw', '"
    )
    assert complete("FROM {{ source('raw', 'ord", "orders") == (
        "FROM {{ source('raw', 'orders') }}"
    )
    # no open pattern: text unchanged
    assert complete("SELECT 1", "x") == "SELECT 1"


def test_suggestions_capped_at_20():
    r = ModelRegistry()
    for i in range(30):
        r.add(Model(f"m{i:02d}", "SELECT 1", materialization="view"))
    assert len(suggest(r, "{{ ref('m")) == 20
