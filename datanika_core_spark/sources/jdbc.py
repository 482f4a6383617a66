"""JDBC source (S1/S2) + destination config (K1).

Reference: connection types postgres/mysql/mssql/sqlite (+ bigquery/
snowflake/redshift destinations) built from encrypted configs
(connection_service.py:84-91, dlt_runner.py:83-132); full-database
mode reads every table of a schema, single-table mode one table,
with chunked reads (``chunk_size`` = batch_size).

Spark mapping: ``spark.read.format("jdbc")`` with
- ``fetchsize`` = batch_size (chunked extraction parity),
- ``partitionColumn/lowerBound/upperBound/numPartitions`` for
  parallel scans when a numeric key is configured — this is where
  Spark beats the reference's single-process dlt extraction at scale,
- pushdown: Catalyst sends filters into the generated WHERE clause.

ClickHouse parity note (K3): the reference lists ClickHouse as a
connection type but ``build_destination`` raises for it — it is
query/preview-only. We mirror that: ``url_for`` supports it,
``SUPPORTED_DESTINATION_TYPES`` excludes it.

No JDBC drivers ship in this container, so tests cover config/url
construction + reader assembly; execution requires the driver jar on
the classpath (standard Spark deployment practice).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

from datanika_core_spark.errors import UnsupportedOperation, ValidationError

#: connection type → (jdbc subprotocol, default port)
JDBC_TYPES: Mapping[str, tuple[str, int | None]] = {
    "postgres": ("postgresql", 5432),
    "mysql": ("mysql", 3306),
    "mssql": ("sqlserver", 1433),
    "sqlite": ("sqlite", None),
    "clickhouse": ("clickhouse", 8123),
    "redshift": ("redshift", 5439),
}

#: destinations the reference supports for loads (dlt_runner.py:83-99);
#: clickhouse is deliberately absent (query-only — see module doc).
SUPPORTED_DESTINATION_TYPES = frozenset(
    {"postgres", "mysql", "mssql", "sqlite", "bigquery", "snowflake", "redshift"}
)


def url_for(conn_type: str, cfg: Mapping[str, object]) -> str:
    """Build a JDBC URL from a connection config dict."""
    if conn_type not in JDBC_TYPES:
        raise ValidationError(f"unsupported SQL connection type {conn_type!r}")
    sub, default_port = JDBC_TYPES[conn_type]
    if conn_type == "sqlite":
        return f"jdbc:sqlite:{cfg['database']}"
    host = cfg.get("host", "localhost")
    port = cfg.get("port") or default_port
    db = cfg.get("database", "")
    if conn_type == "mssql":
        return f"jdbc:{sub}://{host}:{port};databaseName={db}"
    return f"jdbc:{sub}://{host}:{port}/{db}"


def check_destination_supported(conn_type: str) -> None:
    """Parity with build_destination's ValueError on clickhouse
    (dlt_runner.py:128-129)."""
    if conn_type not in SUPPORTED_DESTINATION_TYPES:
        raise UnsupportedOperation(
            f"destination type {conn_type!r} is not supported for loads"
        )


@dataclass
class JdbcSource:
    """Single-table or full-database JDBC extraction."""

    spark: SparkSession
    conn_type: str
    config: Mapping[str, object]
    batch_size: int = 10_000
    # parallel-scan knobs (engine extension over the reference):
    partition_column: str | None = None
    num_partitions: int | None = None
    lower_bound: object = None
    upper_bound: object = None
    properties: dict[str, str] = field(default_factory=dict)

    def reader(self, dbtable: str) -> DataFrameReader:
        r = (
            self.spark.read.format("jdbc")
            .option("url", url_for(self.conn_type, self.config))
            .option("dbtable", dbtable)
            .option("fetchsize", str(self.batch_size))
        )
        if self.config.get("user"):
            r = r.option("user", str(self.config["user"]))
        if self.config.get("password"):
            r = r.option("password", str(self.config["password"]))
        if self.partition_column:
            if self.num_partitions is None or self.lower_bound is None or (
                self.upper_bound is None
            ):
                raise ValidationError(
                    "parallel JDBC scan needs num_partitions + bounds"
                )
            r = (
                r.option("partitionColumn", self.partition_column)
                .option("numPartitions", str(self.num_partitions))
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
            )
        for k, v in self.properties.items():
            r = r.option(k, v)
        return r

    def read_table(self, table: str, source_schema: str | None = None) -> DataFrame:
        qualified = f"{source_schema}.{table}" if source_schema else table
        return self.reader(qualified).load()

    def query(self, sql: str) -> DataFrame:
        """Read-only SQL passthrough over JDBC (Q1 for SQL conns)."""
        return self.reader(f"({sql}) AS q").load()
