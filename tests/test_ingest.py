"""Incremental cursor state, flatten normalizer, ingestion job
end-to-end, driver-side sources with injected clients."""

from __future__ import annotations

import json

import pytest

from datanika_core_spark.ingest import IngestionJob
from datanika_core_spark.operators.flatten import is_internal_table, normalize
from datanika_core_spark.operators.incremental import (
    CursorStateStore,
    apply_incremental,
)
from datanika_core_spark.sources.base import TableBatch
from datanika_core_spark.sources.filesystem import FilesystemSource
from datanika_core_spark.sources.jdbc import (
    JdbcSource,
    check_destination_supported,
    url_for,
)
from datanika_core_spark.sources.mongodb import MongoDbSource, _coerce_ids
from datanika_core_spark.sources.rest import RestApiSource, RestResource
from datanika_core_spark.sources.sheets import GoogleSheetsSource
from datanika_core_spark.specs import IncrementalSpec, UploadSpec
from datanika_core_spark.errors import UnsupportedOperation


# -- incremental ------------------------------------------------------------


def test_cursor_store_roundtrip(tmp_path):
    store = CursorStateStore(str(tmp_path / "state.json"))
    assert store.get("p", "t") is None
    store.set("p", "t", 42)
    store.set("p", "u", "2024-01-01")
    assert store.get("p", "t") == 42
    assert store.get("p", "u") == "2024-01-01"
    store.clear("p", "t")
    assert store.get("p", "t") is None
    # file is valid json
    assert json.load(open(tmp_path / "state.json"))


def test_apply_incremental_progression(spark, tmp_path):
    store = CursorStateStore(str(tmp_path / "c.json"))
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "id int, seq int"
    )
    spec = IncrementalSpec(cursor_path="seq", initial_value=10, row_order="asc")
    r1 = apply_incremental(df, spec, store, "pipe", "t")
    assert [x.seq for x in r1.df.collect()] == [20, 30, 40]  # > initial, asc
    r1.commit()
    assert store.get("pipe", "t") == 40
    r2 = apply_incremental(df, spec, store, "pipe", "t")
    assert r2.df.count() == 0  # nothing new


def test_commit_cursor_from_loaded_rows_only(spark, tmp_path):
    """The persisted high-water mark must come from the rows actually
    loaded (observe() during the load action), NOT from re-executing
    the source plan at commit time — otherwise rows arriving between
    load and commit are skipped forever (ADVICE r1, high)."""
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 10), (2, 20)], "id int, seq int"
    ).write.parquet(src_dir)
    store = CursorStateStore(str(tmp_path / "c.json"))
    spec = IncrementalSpec(cursor_path="seq")
    res = apply_incremental(
        spark.read.parquet(src_dir), spec, store, "pipe", "t"
    )
    assert res.df.count() == 2  # the "load" action

    # a late row lands in the source AFTER the load, BEFORE the commit
    spark.createDataFrame([(3, 30)], "id int, seq int").write.mode(
        "append"
    ).parquet(src_dir)

    res.commit()
    # cursor reflects only what was loaded → seq=30 is picked up next run
    assert store.get("pipe", "t") == 20
    res2 = apply_incremental(
        spark.read.parquet(src_dir), spec, store, "pipe", "t"
    )
    assert [r.seq for r in res2.df.collect()] == [30]


# -- flatten ----------------------------------------------------------------


def test_normalize_structs_and_arrays(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, ("a@x", "NYC"), ["t1", "t2"]), (2, ("b@x", "LA"), ["t3"])],
        "id int, contacts struct<email:string,city:string>, tags array<string>",
    )
    tables = dict(normalize(df, "users"))
    assert set(tables) == {"users", "users__tags"}
    parent = tables["users"]
    assert {"id", "contacts__email", "contacts__city", "_dlt_id"} <= set(
        parent.columns
    )
    child = tables["users__tags"]
    rows = child.join(
        parent, child["_dlt_parent_id"] == parent["_dlt_id"]
    ).select("id", "_dlt_list_idx", "value").collect()
    assert sorted((r.id, r._dlt_list_idx, r.value) for r in rows) == [
        (1, 0, "t1"),
        (1, 1, "t2"),
        (2, 0, "t3"),
    ]
    # deterministic ids: re-run produces identical _dlt_ids
    again = dict(normalize(df, "users"))["users"]
    assert sorted(r._dlt_id for r in parent.collect()) == sorted(
        r._dlt_id for r in again.collect()
    )


def test_internal_table_predicate():
    assert is_internal_table("_dlt_loads")
    assert not is_internal_table("users")


# -- ingestion job ----------------------------------------------------------


class ListSource:
    def __init__(self, batches):
        self._batches = batches

    def tables(self):
        yield from self._batches


@pytest.fixture()
def job(engine, tmp_path):
    return IngestionJob(engine, CursorStateStore(str(tmp_path / "s.json")))


def test_job_full_database_with_merge_config(spark, engine, job):
    engine.drop_database("land zone")
    users = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    logs = spark.createDataFrame([(1, "x")], "id int, msg string")
    spec = UploadSpec.from_config(
        "Land Zone",
        {
            "mode": "full_database",
            "write_disposition": "merge",
            "merge_config": {"users": {"primary_key": "id"}},
        },
    )
    res = job.run(spec, ListSource([TableBatch("users", users), TableBatch("logs", logs)]))
    assert res.dataset == "land_zone"
    assert res.rows_loaded == 3
    # second run: users merges (upsert), logs appends
    users2 = spark.createDataFrame([(2, "B"), (3, "c")], "id int, name string")
    res2 = job.run(spec, ListSource([TableBatch("users", users2), TableBatch("logs", logs)]))
    got = {tuple(r) for r in spark.table("land_zone.users").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    assert spark.table("land_zone.logs").count() == 2
    # W7 accounting: source-batch rows (users2=2 merged + logs=1 appended),
    # NOT the post-merge table total (dlt parity, dlt_runner.py:58-76).
    assert res2.rows_loaded == 3
    engine.drop_database("land zone")


def test_job_single_table_incremental(spark, engine, job):
    engine.drop_database("inc ds")
    ev = spark.createDataFrame([(1, 100), (2, 200)], "id int, ts int")
    spec = UploadSpec.from_config(
        "Inc DS",
        {
            "mode": "single_table",
            "table": "ev",
            "incremental": {"cursor_path": "ts"},
        },
    )
    job.run(spec, ListSource([TableBatch("ev", ev)]))
    assert spark.table("inc_ds.ev").count() == 2
    # next batch includes old + new rows; only new ones load
    ev2 = spark.createDataFrame([(1, 100), (2, 200), (3, 300)], "id int, ts int")
    res = job.run(spec, ListSource([TableBatch("ev", ev2)]))
    assert res.rows_loaded == 1
    assert spark.table("inc_ds.ev").count() == 3
    engine.drop_database("inc ds")


def test_job_filters_and_rows_excludes_internal(spark, engine, job):
    engine.drop_database("f ds")
    data = spark.createDataFrame(
        [(1, "ok"), (2, None), (3, "bad")], "id int, status string"
    )
    spec = UploadSpec.from_config(
        "F DS",
        {"filters": [{"column": "status", "op": "ne", "value": "bad"}]},
    )
    res = job.run(
        spec,
        ListSource(
            [TableBatch("data", data), TableBatch("_dlt_loads", data)]
        ),
    )
    # ne keeps NULL → rows 1,2; internal table excluded from count
    assert res.rows_loaded == 2
    engine.drop_database("f ds")


# -- driver-side sources ----------------------------------------------------


class FakeResponse:
    def __init__(self, payload):
        self._p = payload

    def json(self):
        return self._p

    def raise_for_status(self):
        pass


class FakeHttp:
    """Pages: offset-paginated /items, link-paginated /users."""

    def get(self, url, params=None, headers=None):
        params = params or {}
        if url.endswith("/items"):
            offset = int(params.get("offset", 0))
            rows = [{"id": i, "v": i * 10} for i in range(offset, min(offset + 2, 5))]
            return FakeResponse({"data": rows})
        if url.endswith("/users"):
            return FakeResponse(
                {"data": [{"id": 1}, {"id": 2}], "next": url.replace("/users", "/users2")}
            )
        if url.endswith("/users2"):
            return FakeResponse({"data": [{"id": 3}], "next": None})
        raise AssertionError(url)


def test_rest_source_offset_and_link(spark):
    src = RestApiSource(
        spark,
        "http://api.test",
        [RestResource("items", "/items", data_selector="data")],
        paginator={"type": "offset", "limit": 2, "data_selector": "data"},
        session_factory=FakeHttp,
    )
    batches = {b.name: b.df for b in src.tables()}
    assert batches["items"].count() == 5

    src2 = RestApiSource(
        spark,
        "http://api.test",
        [RestResource("users", "/users", data_selector="data")],
        paginator={"type": "json_link", "next_url_path": "next"},
        session_factory=FakeHttp,
    )
    assert {r.id for b in src2.tables() for r in b.df.collect()} == {1, 2, 3}


def test_mongo_source_with_fake_client(spark):
    class FakeColl:
        def __init__(self, docs):
            self._docs = docs

        def find(self, batch_size=None):
            return iter(self._docs)

    class FakeDb(dict):
        def list_collection_names(self):
            return list(self)

    class FakeClient(dict):
        pass

    class FakeObjectId:
        def __str__(self):
            return "abc123"

    FakeObjectId.__name__ = "ObjectId"
    client = FakeClient(
        shop=FakeDb(
            users=FakeColl(
                [
                    {"_id": FakeObjectId(), "name": "x", "meta": {"k": 1}},
                    {"_id": FakeObjectId(), "name": "y", "meta": {"k": 2}},
                ]
            )
        )
    )
    src = MongoDbSource(spark, "shop", client=client)
    batches = list(src.tables())
    assert batches[0].name == "users"
    rows = batches[0].df.collect()
    assert all(r["_id"] == "abc123" for r in rows)
    assert {r["meta"]["k"] for r in rows} == {1, 2}


def test_coerce_ids_nested():
    class FakeObjectId:
        def __str__(self):
            return "zzz"

    FakeObjectId.__name__ = "ObjectId"
    doc = {"_id": FakeObjectId(), "refs": [FakeObjectId(), {"x": FakeObjectId()}]}
    out = _coerce_ids(doc)
    assert out == {"_id": "zzz", "refs": ["zzz", {"x": "zzz"}]}


def test_sheets_source_with_fake_client(spark):
    class WS:
        def __init__(self, title, rows):
            self.title = title
            self._rows = rows

        def get_all_records(self):
            return self._rows

    class SS:
        def worksheets(self):
            return [WS("Orders Q1", [{"a": 1}, {"a": 2}]), WS("Empty", [])]

    class Client:
        def open_by_url(self, url):
            return SS()

    src = GoogleSheetsSource(spark, "http://sheet", client=Client())
    batches = list(src.tables())
    assert [b.name for b in batches] == ["orders_q1"]
    assert batches[0].df.count() == 2


# -- jdbc config ------------------------------------------------------------


def test_jdbc_urls_and_destinations(spark):
    assert url_for("postgres", {"host": "h", "database": "d"}) == (
        "jdbc:postgresql://h:5432/d"
    )
    assert url_for("mssql", {"host": "h", "port": 1444, "database": "d"}) == (
        "jdbc:sqlserver://h:1444;databaseName=d"
    )
    assert url_for("sqlite", {"database": "/tmp/x.db"}) == "jdbc:sqlite:/tmp/x.db"
    check_destination_supported("postgres")
    with pytest.raises(UnsupportedOperation):
        check_destination_supported("clickhouse")  # K3 parity
    src = JdbcSource(spark, "postgres", {"host": "h", "database": "d", "user": "u"},
                     batch_size=500)
    reader = src.reader("public.users")  # assembles without a driver jar
    assert reader is not None


def test_filesystem_source_orc_round_trip(spark, tmp_path):
    """ORC format (engine extension): write ORC, glob-read it back
    through FilesystemSource."""
    d = str(tmp_path / "orcdir")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, s string"
    ).write.orc(d)
    src = FilesystemSource(spark, d, file_format="orc", table_name="t_orc")
    batches = list(src.tables())
    assert batches[0].name == "t_orc"
    assert {tuple(r) for r in batches[0].df.select("id", "s").collect()} == {
        (1, "a"), (2, "b")
    }


# -- malformed-record handling (bad_records policy + quarantine) --------


def _write_mixed_jsonl(tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json}\n"
        '{"id": 2, "name": "fine"}\n'
        "also-garbage\n"
    )
    return str(d)


def test_bad_records_permissive_quarantines(spark, tmp_path):
    from datanika_core_spark.sources.filesystem import FilesystemSource

    src = FilesystemSource(
        spark, _write_mixed_jsonl(tmp_path), file_format="jsonl"
    )
    good, bad = src.quarantine()
    assert {r.id for r in good.collect()} == {1, 2}
    assert "_corrupt_record" not in good.columns
    raws = {r.raw_record for r in bad.collect()}
    assert raws == {"{this is not json}", "also-garbage"}


def test_bad_records_drop(spark, tmp_path):
    from datanika_core_spark.sources.filesystem import FilesystemSource

    src = FilesystemSource(
        spark,
        _write_mixed_jsonl(tmp_path),
        file_format="jsonl",
        bad_records="drop",
    )
    rows = src.read().collect()
    assert {r.id for r in rows} == {1, 2}


def test_bad_records_fail(spark, tmp_path):
    from datanika_core_spark.sources.filesystem import FilesystemSource

    src = FilesystemSource(
        spark,
        _write_mixed_jsonl(tmp_path),
        file_format="jsonl",
        bad_records="fail",
    )
    with pytest.raises(Exception):
        src.read().collect()


def test_bad_records_invalid_mode_rejected(spark, tmp_path):
    from datanika_core_spark.errors import ValidationError
    from datanika_core_spark.sources.filesystem import FilesystemSource

    with pytest.raises(ValidationError):
        FilesystemSource(
            spark, str(tmp_path), file_format="jsonl", bad_records="wat"
        )
