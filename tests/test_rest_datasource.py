"""Spark 4 Python DataSource REST reader (executor-parallel S6)."""

import json

import pytest

from datanika_core_spark.sources.rest_datasource import RestApiDataSource


@pytest.fixture()
def api_dump(tmp_path):
    users = tmp_path / "users"
    users.mkdir()
    (users / "page-0.json").write_text(json.dumps(
        [{"id": 1, "name": "ada"}, {"id": 2, "name": "bob"}]
    ))
    (users / "page-1.json").write_text(json.dumps(
        [{"id": 3, "name": "cyd", "extra": "ignored"}]
    ))
    orders = tmp_path / "orders"
    orders.mkdir()
    (orders / "page-0.json").write_text(json.dumps(
        {"data": [{"id": 10, "name": "o-10"}]}
    ))
    return tmp_path


def test_rest_datasource_reads_pages(spark, api_dump):
    spark.dataSource.register(RestApiDataSource)
    df = (
        spark.read.format("rest_api")
        .option("schema_ddl", "id bigint, name string")
        .option("transport", "file")
        .option("base_dir", str(api_dump))
        .option("resources", "users")
        .load()
    )
    got = {(r.id, r.name) for r in df.collect()}
    assert got == {(1, "ada"), (2, "bob"), (3, "cyd")}


def test_rest_datasource_parallel_resources_and_selector(spark, api_dump):
    spark.dataSource.register(RestApiDataSource)
    df = (
        spark.read.format("rest_api")
        .option("schema_ddl", "id bigint, name string")
        .option("transport", "file")
        .option("base_dir", str(api_dump))
        .option("resources", "orders")
        .option("data_selector", "data")
        .load()
    )
    assert [(r.id, r.name) for r in df.collect()] == [(10, "o-10")]
    # one partition per resource -> both resources fan out in one scan
    df2 = (
        spark.read.format("rest_api")
        .option("schema_ddl", "id bigint, name string")
        .option("transport", "file")
        .option("base_dir", str(api_dump))
        .option("resources", "users")
        .load()
    )
    assert df2.rdd.getNumPartitions() == 1
