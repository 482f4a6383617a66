"""Data catalog metadata (C1-C4).

Reference: CatalogEntry rows keyed (table, schema, dataset) with
entry_type source_table|dbt_model and a JSON column list
[{name, data_type, description, tests}]
(/root/reference/datanika/models/catalog_entry.py:11-35); table
introspection via SQLAlchemy inspect skipping ``_dlt_*``
(datanika/services/catalog_service.py:13-46); upsert + CRUD
(catalog_service.py:48-177); post-run sync from the destination
(datanika/tasks/upload_tasks.py:29-85, pipeline_tasks.py:28-106).

Spark mapping: introspection = ``spark.catalog`` + ``df.schema``
(types from Catalyst, stringified with simpleString() — the analogue
of the reference's ``str(c["type"])``). Entries live in an in-memory
registry with a DataFrame view for SQL-side queries; descriptions and
tests are OUR metadata (the Spark catalog can't hold them per-tenant,
SURVEY.md §1.1).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession

from datanika_core_spark.errors import ValidationError

ENTRY_TYPES = ("source_table", "dbt_model")
_INTERNAL_PREFIX = "_dlt_"


def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


@dataclass(frozen=True)
class ColumnInfo:
    name: str
    data_type: str
    description: str = ""
    tests: tuple[str, ...] = ()


@dataclass
class CatalogEntry:
    entry_type: str
    table_name: str
    schema_name: str
    dataset: str
    columns: list[ColumnInfo] = field(default_factory=list)
    description: str = ""
    connection: str | None = None
    dbt_config: dict = field(default_factory=dict)
    updated_at: dt.datetime = field(default_factory=_now)

    def __post_init__(self):
        if self.entry_type not in ENTRY_TYPES:
            raise ValidationError(f"entry_type must be one of {ENTRY_TYPES}")

    @property
    def key(self) -> tuple[str, str, str]:
        return (self.table_name, self.schema_name, self.dataset)


def introspect_database(spark: SparkSession, db: str) -> list[dict]:
    """C1: list tables + stringified column types of a database,
    skipping dlt-internal tables."""
    out = []
    for t in spark.catalog.listTables(db):
        # listTables(db) also returns session temp views (database is
        # None for those) — only real tables of this db belong here.
        if t.database != db or t.name.startswith(_INTERNAL_PREFIX):
            continue
        schema = spark.table(f"{db}.{t.name}").schema
        out.append({
            "table": t.name,
            "columns": [
                {"name": f.name, "data_type": f.dataType.simpleString()}
                for f in schema.fields
            ],
        })
    return sorted(out, key=lambda d: d["table"])


class CatalogStore:
    """C2/C3: keyed upsert + CRUD over catalog entries."""

    def __init__(self) -> None:
        self._entries: dict[tuple[str, str, str], CatalogEntry] = {}

    def upsert(self, entry: CatalogEntry) -> CatalogEntry:
        """Create-or-update on (table, schema, dataset): updates
        replace columns/description/dbt_config but keep entry
        identity (catalog_service.py:48-104)."""
        prev = self._entries.get(entry.key)
        if prev is not None:
            entry = replace(entry, updated_at=_now())
        self._entries[entry.key] = entry
        return entry

    def get(self, table: str, schema: str, dataset: str) -> CatalogEntry:
        key = (table, schema, dataset)
        if key not in self._entries:
            raise ValidationError(f"no catalog entry {key}")
        return self._entries[key]

    def delete(self, table: str, schema: str, dataset: str) -> None:
        self._entries.pop((table, schema, dataset), None)

    def list(self, entry_type: str | None = None,
             connection: str | None = None) -> list[CatalogEntry]:
        out = list(self._entries.values())
        if entry_type is not None:
            out = [e for e in out if e.entry_type == entry_type]
        if connection is not None:
            out = [e for e in out if e.connection == connection]
        return sorted(out, key=lambda e: e.key)

    # -- C4: post-run sync ------------------------------------------------

    def sync_from_database(
        self,
        spark: SparkSession,
        db: str,
        dataset: str | None = None,
        entry_type: str = "source_table",
        connection: str | None = None,
    ) -> list[CatalogEntry]:
        """After a load/transform run: introspect the destination
        database and upsert an entry per table (upload_tasks.py:29-85,
        transformation_tasks.py:25-78)."""
        synced = []
        for tbl in introspect_database(spark, db):
            entry = CatalogEntry(
                entry_type=entry_type,
                table_name=tbl["table"],
                schema_name=db,
                dataset=dataset or db,
                columns=[
                    ColumnInfo(c["name"], c["data_type"])
                    for c in tbl["columns"]
                ],
                connection=connection,
            )
            synced.append(self.upsert(entry))
        return synced

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Flat DataFrame view (one row per column) for SQL-side
        catalog queries."""
        rows = [
            (e.entry_type, e.table_name, e.schema_name, e.dataset,
             c.name, c.data_type, c.description, list(c.tests),
             e.connection, e.updated_at)
            for e in self.list()
            for c in e.columns
        ]
        return spark.createDataFrame(
            rows,
            "entry_type string, table_name string, schema_name string, "
            "dataset string, column_name string, data_type string, "
            "description string, tests array<string>, connection string, "
            "updated_at timestamp_ntz",
        )
