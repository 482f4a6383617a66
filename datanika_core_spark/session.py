"""EngineSession — the engine's handle on a SparkSession.

Replaces the reference's warehouse-connection layer
(datanika/services/connection_service.py) with a single Spark
session + managed warehouse. All relational execution that the
reference delegated to postgres/snowflake/bigquery/... via dbt
(SURVEY.md §0) happens here in Spark SQL / Catalyst.

Scale notes (100 TB target):
- AQE is on: runtime partition coalescing, skew-join splitting and
  broadcast-demotion decisions happen per-stage from real statistics.
- ``spark.sql.shuffle.partitions`` defaults to a local-friendly value;
  on a real cluster set it ~2-3× total cores (AQE coalesces down).
- Session timezone is pinned UTC so results are stable across
  environments (and comparable to DuckDB oracles).
"""

from __future__ import annotations

import os
from typing import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.naming import to_snake_case, validate_identifier

#: Tables every driver test-dataset directory contains (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_DEFAULTS: Mapping[str, str] = {
    # The driver testdata's `events.ts` is parquet TIMESTAMP(NANOS),
    # which Spark's vectorized reader rejects by default; read as
    # int64 nanos and rebuild (see read_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 10 MB default is conservative; dims like region/nation/customer
    # are far below this even at sf100.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.ui.enabled": "false",
    # FAIR job scheduling so the concurrent ModelRunner's per-worker
    # pools (spark.scheduler.pool = models-<i>, plans/runner.py) do
    # real work: a wide topo level's models time-share executors
    # instead of queuing FIFO (dbt `threads: 4` parity — reference
    # dbt_project.py:231). Inert for single-job sessions.
    "spark.scheduler.mode": "FAIR",
}

#: shipped pool definitions for the ModelRunner workers; pools are
#: auto-created with the same defaults past models-3, the file is the
#: operator knob for re-weighting model runs on a shared cluster
FAIR_SCHEDULER_XML = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "resources",
    "fairscheduler.xml",
)


def build_spark(
    app_name: str = "datanika_core_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: Mapping[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or int(cpus))
    if warehouse_dir:
        conf["spark.sql.warehouse.dir"] = warehouse_dir
    if extra_conf:
        conf.update(extra_conf)
    if os.path.isfile(FAIR_SCHEDULER_XML):
        conf.setdefault(
            "spark.scheduler.allocation.file", FAIR_SCHEDULER_XML
        )
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (illegal for Spark's
    reader — surfaced as int64 under the nanosAsLong flag)."""
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            inner = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not inner:
                return []
            path = os.path.join(path, inner[0])
        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table, normalizing nanosecond timestamps to
    TIMESTAMP_NTZ (truncated to micros, matching how DuckDB/pandas
    read the same file).

    Runtime-sets the two confs it depends on so this works on any
    caller-provided SparkSession (e.g. the verify driver's), not just
    ones built by :func:`build_spark`.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for col in _nanos_timestamp_columns(path):
        df = df.withColumn(
            col,
            F.expr(f"cast(timestamp_micros({col} div 1000) as timestamp_ntz)"),
        )
    return df


class EngineSession:
    """Engine facade: one Spark session + a managed warehouse.

    The reference's "destination warehouse" becomes Spark's session
    catalog (parquet-backed managed tables); its per-tenant "dataset"
    (schema) becomes a Spark database (K2 —
    datanika/services/upload_service.py:32).
    """

    def __init__(self, spark: SparkSession | None = None, **kwargs):
        self.spark = spark or build_spark(**kwargs)

    # -- catalog helpers ------------------------------------------------

    def ensure_database(self, name: str) -> str:
        """CREATE DATABASE IF NOT EXISTS for a dataset name (K2)."""
        db = validate_identifier(to_snake_case(name))
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        return db

    def table_exists(self, qualified: str) -> bool:
        return self.spark.catalog.tableExists(qualified)

    def drop_database(self, name: str) -> None:
        db = validate_identifier(to_snake_case(name))
        self.spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")

    # -- data loading ---------------------------------------------------

    def load_dir(
        self,
        sf_dir: str,
        tables: Iterable[str] = TESTDATA_TABLES,
        register: bool = True,
    ) -> dict[str, DataFrame]:
        """Read each ``{sf_dir}/{name}.parquet`` and (optionally)
        register it as a temp view under its table name."""
        out: dict[str, DataFrame] = {}
        for name in tables:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if not os.path.exists(path):
                continue
            df = read_table(self.spark, path)
            if register:
                df.createOrReplaceTempView(name)
            out[name] = df
        return out

    # -- querying -------------------------------------------------------

    def query(self, sql: str) -> DataFrame:
        """Read-only SQL passthrough (Q1 —
        datanika/services/connection_service.py:174-192)."""
        return self.spark.sql(sql)

    def stop(self) -> None:
        self.spark.stop()
