"""EngineSession, naming, preview LIMIT-injection (Q2), filesystem
source + uploaded-file store (S4/S5)."""

from __future__ import annotations

import os

import pytest

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.naming import to_snake_case, validate_identifier, validate_name
from datanika_core_spark.plans.preview import inject_limit, preview
from datanika_core_spark.sources.filesystem import (
    FilesystemSource,
    UploadedFileStore,
)


def test_naming():
    assert to_snake_case("My Upload Name") == "my_upload_name"
    assert to_snake_case("  Spaced   Out ") == "spaced_out"
    assert validate_name("Orders 2024") == "Orders 2024"
    with pytest.raises(ValidationError):
        validate_name("bad;name")
    assert validate_identifier("model_1") == "model_1"
    # hyphens and trailing newlines parse wrong when spliced unquoted
    # into DDL — must be rejected (ADVICE r1)
    with pytest.raises(ValidationError):
        validate_identifier("my-model")
    with pytest.raises(ValidationError):
        validate_identifier("model_1\n")
    with pytest.raises(ValidationError):
        validate_identifier("1bad")
    with pytest.raises(ValidationError):
        validate_identifier("a/../b")


def test_inject_limit_rules():
    assert inject_limit("SELECT * FROM t") == "SELECT * FROM t LIMIT 5"
    assert inject_limit("SELECT * FROM t;") == "SELECT * FROM t LIMIT 5"
    assert inject_limit("SELECT * FROM t LIMIT 3") == "SELECT * FROM t LIMIT 3"
    assert inject_limit("SELECT * FROM t limit 10") == "SELECT * FROM t limit 10"
    # a column named "limit_x" must not suppress injection
    assert (
        inject_limit("SELECT limit_x FROM t")
        == "SELECT limit_x FROM t LIMIT 5"
    )


def test_preview_stringifies(spark, tables):
    cols, rows = preview(
        spark, "SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey"
    )
    assert cols == ["o_orderkey", "o_orderstatus"]
    assert len(rows) == 5
    assert all(isinstance(v, str) for row in rows for v in row)


def test_engine_database_roundtrip(engine):
    db = engine.ensure_database("My Dataset")
    assert db == "my_dataset"
    engine.drop_database("My Dataset")


def test_filesystem_source(spark, tmp_path):
    import pandas as pd

    pdf = __import__("pandas").DataFrame({"a": [1, 2], "b": ["x", "y"]})
    pdf.to_csv(tmp_path / "one.csv", index=False)
    src = FilesystemSource(spark, str(tmp_path), "csv", table_name="stuff")
    batches = list(src.tables())
    assert batches[0].name == "stuff"
    assert batches[0].df.count() == 2
    with pytest.raises(ValidationError):
        FilesystemSource(spark, str(tmp_path), "xml")


def test_uploaded_file_store(spark, tmp_path):
    data = tmp_path / "d.csv"
    data.write_text("a,b\n1,x\n2,y\n")
    store = UploadedFileStore(str(tmp_path / "archive"))
    digest = store.store(str(data))
    assert len(digest) == 64
    tmpdir = store.extract_for_run(digest)
    try:
        df = spark.read.option("header", "true").csv(tmpdir)
        assert df.count() == 2
    finally:
        store.cleanup(tmpdir)
    assert not os.path.exists(tmpdir)
    with pytest.raises(ValidationError):
        store.store(str(tmp_path / "missing.xml"))


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert "q1_pricing_summary" in q
