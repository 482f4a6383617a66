"""Spark 4 Python DataSources for Mongo (S8) and Sheets (S7) —
executor-parallel upgrades of the driver-side sources."""

import json

import pytest

from datanika_core_spark.sources.mongo_datasource import MongoDataSource
from datanika_core_spark.sources.sheets_datasource import SheetsDataSource


@pytest.fixture()
def mongo_dump(tmp_path):
    users = tmp_path / "users"
    users.mkdir()
    (users / "chunk-0.json").write_text(json.dumps([
        {"_id": {"$oid": "65f000000000000000000001"}, "name": "ada",
         "age": 36},
        {"_id": {"$oid": "65f000000000000000000002"}, "name": "bob",
         "age": 41},
    ]))
    (users / "chunk-1.json").write_text(json.dumps([
        {"_id": {"$oid": "65f000000000000000000003"}, "name": "cyd",
         "age": None, "tags": ["x"]},
    ]))
    events = tmp_path / "events"
    events.mkdir()
    (events / "chunk-0.json").write_text(json.dumps(
        [{"_id": {"$oid": "65f0000000000000000000aa"}, "name": "e1",
          "age": 7}]
    ))
    return tmp_path


def test_mongo_datasource_chunks_and_oid(spark, mongo_dump):
    spark.dataSource.register(MongoDataSource)
    df = (
        spark.read.format("mongo_ds")
        .option("schema_ddl", "_id string, name string, age bigint")
        .option("transport", "file")
        .option("base_dir", str(mongo_dump))
        .option("collections", "users,events")
        .option("chunks_per_collection", "2")
        .load()
    )
    rows = {(r._id, r.name, r.age) for r in df.collect()}
    assert rows == {
        ("65f000000000000000000001", "ada", 36),
        ("65f000000000000000000002", "bob", 41),
        ("65f000000000000000000003", "cyd", None),
        ("65f0000000000000000000aa", "e1", 7),
    }
    # one partition per (collection, chunk)
    assert df.rdd.getNumPartitions() == 4


@pytest.fixture()
def sheets_dump(tmp_path):
    (tmp_path / "Q1.csv").write_text(
        "region,revenue,active\nemea,100.5,true\namer,200.25,false\n"
    )
    (tmp_path / "Q2.csv").write_text(
        "region,revenue,active\napac,50.75,true\nemea,,false\n"
    )
    return tmp_path


def test_sheets_datasource_tabs_and_coercion(spark, sheets_dump):
    spark.dataSource.register(SheetsDataSource)
    df = (
        spark.read.format("sheets_ds")
        .option(
            "schema_ddl",
            "region string, revenue double, active boolean, _tab string",
        )
        .option("transport", "file")
        .option("base_dir", str(sheets_dump))
        .option("tabs", "Q1,Q2")
        .load()
    )
    rows = {(r.region, r.revenue, r.active, r._tab) for r in df.collect()}
    assert rows == {
        ("emea", 100.5, True, "Q1"),
        ("amer", 200.25, False, "Q1"),
        ("apac", 50.75, True, "Q2"),
        ("emea", None, False, "Q2"),
    }
    assert df.rdd.getNumPartitions() == 2
    # schema columns missing from the sheet come back NULL, and the
    # filter pushes into the scan without error
    assert df.filter("active").count() == 2


# -- http transport over a localhost server ---------------------------------


@pytest.fixture()
def http_server():
    """Stdlib HTTP server serving REST-style JSON pages; exercises
    the real urllib transport path end-to-end on localhost."""
    import http.server
    import json as _json
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            # /users?page=N
            path, _, query = self.path.partition("?")
            page = int(dict(
                p.split("=") for p in query.split("&") if "=" in p
            ).get("page", "0"))
            pages = {
                "/users": [
                    [{"id": 1, "name": "ada"}, {"id": 2, "name": "bob"}],
                    [{"id": 3, "name": "cyd"}],
                ],
            }
            body = pages.get(path, [[]])
            payload = body[page] if page < len(body) else []
            data = _json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_rest_datasource_http_transport(spark, http_server):
    from datanika_core_spark.sources.rest_datasource import (
        RestApiDataSource,
    )

    spark.dataSource.register(RestApiDataSource)
    df = (
        spark.read.format("rest_api")
        .option("schema_ddl", "id bigint, name string")
        .option("transport", "http")
        .option("base_url", http_server)
        .option("resources", "users")
        .load()
    )
    got = {(r.id, r.name) for r in df.collect()}
    assert got == {(1, "ada"), (2, "bob"), (3, "cyd")}


def test_mongo_pymongo_boundaries_computed_on_driver(monkeypatch):
    """skip/limit ranges are derived from ONE driver-side count and
    embedded in the partitions (executor-side counting could give each
    task different boundaries under concurrent writes), and the cursor
    is sorted on _id so skip/limit ranges are stable."""
    import sys
    import types

    from datanika_core_spark.sources.mongo_datasource import _MongoReader
    from pyspark.sql.types import StructType

    find_calls = []

    class _Coll:
        def __init__(self, total):
            self.total = total

        def count_documents(self, q):
            return self.total

        def find(self, batch_size, sort, skip, limit):
            find_calls.append((sort, skip, limit))
            return [
                {"_id": {"$oid": f"{i:024x}"}, "name": f"n{i}", "age": i}
                for i in range(skip, min(skip + limit, self.total))
            ]

    class _DB:
        def __getitem__(self, name):
            return _Coll(10)

    class _Client:
        def __init__(self, uri=None):
            pass

        def __getitem__(self, name):
            return _DB()

        def close(self):
            pass

    fake = types.ModuleType("pymongo")
    fake.MongoClient = _Client
    fake.ASCENDING = 1
    monkeypatch.setitem(sys.modules, "pymongo", fake)

    reader = _MongoReader(
        StructType.fromDDL("_id string, name string, age bigint"),
        {
            "collections": "users",
            "transport": "pymongo",
            "database": "db",
            "chunks_per_collection": "4",
            "schema_ddl": "_id string, name string, age bigint",
        },
    )
    parts = reader.partitions()
    # 10 docs / 4 chunks -> ceil=3: boundaries (0,3) (3,3) (6,3) (9,1),
    # non-overlapping and covering every document exactly once
    assert [(p.skip, p.limit) for p in parts] == [
        (0, 3), (3, 3), (6, 3), (9, 1)
    ]
    rows = [r for p in parts for r in reader.read(p)]
    assert len(rows) == 10
    assert len({r[0] for r in rows}) == 10
    assert all(sort == [("_id", 1)] for sort, _, _ in find_calls)


def test_sheets_parse_bad_bool_is_null():
    """Bad-value semantics are consistent across types: a cell outside
    the boolean vocabulary -> NULL (like numeric parse failures), not
    False."""
    from pyspark.sql.types import BooleanType, LongType

    from datanika_core_spark.sources.sheets_datasource import _parse

    assert _parse("true", BooleanType()) is True
    assert _parse("No", BooleanType()) is False
    assert _parse("0", BooleanType()) is False
    assert _parse("N/A", BooleanType()) is None
    assert _parse("N/A", LongType()) is None
    assert _parse("", BooleanType()) is None
