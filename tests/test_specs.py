"""dlt_config validation parity
(reference: tests/test_services/test_upload_service.py — the largest
test file; rules at upload_service.py:137-241)."""

from __future__ import annotations

import pytest

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.specs import UploadSpec, validate_upload_config


def ok(cfg):
    validate_upload_config(cfg)


def bad(cfg, match=None):
    with pytest.raises(ValidationError, match=match):
        validate_upload_config(cfg)


def test_empty_and_type():
    ok({})
    bad("nope", "must be a dict")
    bad([1], "must be a dict")


def test_write_disposition():
    ok({"write_disposition": "append"})
    ok({"write_disposition": "replace"})
    bad({"write_disposition": "upsert"}, "write_disposition")


def test_modes():
    bad({"mode": "both"}, "mode must be")
    # single_table requirements
    bad({"mode": "single_table"}, "requires a 'table'")
    ok({"mode": "single_table", "table": "users"})
    bad(
        {"mode": "single_table", "table": "u", "table_names": ["x"]},
        "does not accept 'table_names'",
    )
    bad(
        {"mode": "single_table", "table": "u", "merge_config": {}},
        "does not accept 'merge_config'",
    )
    bad(
        {"mode": "single_table", "table": "u", "write_disposition": "merge"},
        "requires a 'primary_key'",
    )
    ok(
        {
            "mode": "single_table",
            "table": "u",
            "write_disposition": "merge",
            "primary_key": "id",
        }
    )
    # full_database requirements
    bad({"mode": "full_database", "table": "u"}, "does not accept 'table'")
    bad(
        {"mode": "full_database", "incremental": {"cursor_path": "x"}},
        "does not accept 'incremental'",
    )
    bad({"table_names": "users"}, "table_names must be a list")
    ok({"table_names": ["users", "orders"]})
    bad({"write_disposition": "merge"}, "requires 'merge_config'")
    bad({"write_disposition": "merge", "merge_config": []}, "must be a dict")
    bad(
        {"write_disposition": "merge", "merge_config": {"t": []}},
        "must be a dict",
    )
    bad(
        {"write_disposition": "merge", "merge_config": {"t": {}}},
        "requires 'primary_key'",
    )
    bad(
        {"write_disposition": "merge", "merge_config": {"t": {"primary_key": 5}}},
        "string or list",
    )
    ok({"write_disposition": "merge", "merge_config": {"t": {"primary_key": "id"}}})


def test_incremental():
    base = {"mode": "single_table", "table": "u"}
    bad({**base, "incremental": "ts"}, "cursor_path")
    bad({**base, "incremental": {}}, "cursor_path")
    ok({**base, "incremental": {"cursor_path": "updated_at"}})
    bad(
        {**base, "incremental": {"cursor_path": "ts", "row_order": "up"}},
        "row_order",
    )
    ok({**base, "incremental": {"cursor_path": "ts", "row_order": "desc",
                                "initial_value": "2024-01-01"}})


def test_batch_size_and_schema():
    bad({"batch_size": 0}, "positive integer")
    bad({"batch_size": -5}, "positive integer")
    bad({"batch_size": "10"}, "positive integer")
    bad({"batch_size": True}, "positive integer")
    ok({"batch_size": 500})
    bad({"source_schema": 5}, "source_schema")
    ok({"source_schema": "public"})


def test_schema_contract():
    bad({"schema_contract": "evolve"}, "must be a dict")
    bad({"schema_contract": {"rows": "evolve"}}, "not in")
    bad({"schema_contract": {"tables": "explode"}}, "not in")
    ok({"schema_contract": {"tables": "freeze", "columns": "discard_row"}})


def test_filters():
    bad({"filters": {}}, "must be a list")
    bad({"filters": ["x"]}, "must be a dict")
    bad({"filters": [{"column": "a", "op": "eq"}]}, "requires 'value'")
    bad({"filters": [{"column": "a", "op": "like", "value": 1}]}, "op must be")
    ok({"filters": [{"column": "a", "op": "in", "value": [1, 2]}]})


def test_spec_construction_and_passthrough():
    spec = UploadSpec.from_config(
        "My Upload",
        {
            "mode": "single_table",
            "table": "users",
            "write_disposition": "merge",
            "primary_key": ["id"],
            "incremental": {"cursor_path": "updated_at", "row_order": "asc"},
            "batch_size": 500,
            "schema_contract": {"columns": "freeze"},
            "filters": [{"column": "age", "op": "gte", "value": 18}],
            "loader_file_format": "parquet",  # passthrough key
        },
    )
    assert spec.table == "users"
    assert spec.incremental.row_order == "asc"
    assert spec.schema_contract.columns == "freeze"
    assert spec.filters[0].op == "gte"
    assert spec.passthrough == {"loader_file_format": "parquet"}
