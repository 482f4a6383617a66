"""Snapshots — SCD Type 2 history tables (T5).

Reference: dbt snapshot blocks with ``strategy=timestamp``
(``updated_at`` column) or ``strategy=check`` (``check_cols``),
``unique_key``, ``target_schema``, producing
``dbt_valid_from``/``dbt_valid_to`` validity intervals
(dbt_project.py:529-610).

Semantics per snapshot run against source S and target T:
- NEW keys (in S, not in T-current)         → insert, valid_from=ts, valid_to=NULL
- CHANGED rows (key matches a current row and the change predicate
  fires)                                     → close the current row
  (valid_to=ts) and insert the new version (valid_from=ts)
- UNCHANGED / missing-from-S rows            → untouched (dbt does not
  close rows that disappear from the source unless invalidate_hard_deletes)

Change predicate: timestamp → ``s.updated_at > t.updated_at``;
check → any check_col differs (null-safe).

``as_of`` is injectable so runs are deterministic/testable; dbt uses
now(). For the timestamp strategy, valid_from of a new version is the
source row's updated_at (dbt behavior); for check it's the run time.

On Delta this is one MERGE with a matched-update + insert; on the
parquet warehouse it composes as joins + staged swap. All change
detection is column expressions — no UDFs.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.operators.writers import TableWriter, drop_table

VALID_FROM = "dbt_valid_from"
VALID_TO = "dbt_valid_to"
SCD_ID = "dbt_scd_id"
UPDATED_AT = "dbt_updated_at"


@dataclass
class SnapshotConfig:
    unique_key: str | list[str]
    strategy: str  # timestamp | check
    updated_at: str | None = None  # required for timestamp
    check_cols: list[str] | None = None  # required for check
    #: dbt's invalidate_hard_deletes: keys that disappear from the
    #: source get their current row closed (valid_to = run time)
    #: instead of living forever as phantom "current" rows.
    invalidate_hard_deletes: bool = False

    def __post_init__(self):
        if self.strategy not in ("timestamp", "check"):
            raise ValidationError("snapshot strategy must be timestamp|check")
        if self.strategy == "timestamp" and not self.updated_at:
            raise ValidationError("timestamp strategy requires updated_at")
        if self.strategy == "check" and not self.check_cols:
            raise ValidationError("check strategy requires check_cols")

    @property
    def keys(self) -> list[str]:
        return [self.unique_key] if isinstance(self.unique_key, str) else list(
            self.unique_key
        )


class SnapshotRunner:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.writer = TableWriter(spark)

    def run(
        self,
        source: DataFrame,
        target_table: str,
        cfg: SnapshotConfig,
        as_of: dt.datetime | None = None,
    ) -> int:
        """Apply one snapshot run; returns number of new version rows."""
        as_of = as_of or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        ts_lit = F.lit(as_of.isoformat(sep=" ")).cast("timestamp_ntz")
        keys = cfg.keys

        if cfg.strategy == "timestamp":
            upd = F.col(cfg.updated_at)
        else:
            upd = ts_lit
        src = (
            source.withColumn(UPDATED_AT, upd)
            .withColumn(VALID_FROM, upd)
            .withColumn(VALID_TO, F.lit(None).cast("timestamp_ntz"))
            .withColumn(
                SCD_ID,
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(k).cast("string") for k in keys],
                        F.col(UPDATED_AT).cast("string"),
                    )
                ),
            )
        )

        if not self.spark.catalog.tableExists(target_table):
            drop_table(self.spark, target_table)
            src, obs = TableWriter._observed(src)
            src.write.format("parquet").mode("overwrite").saveAsTable(target_table)
            return obs.get["rows"]

        target = self.spark.table(target_table)
        current = target.filter(F.col(VALID_TO).isNull())
        closed_history = target.filter(F.col(VALID_TO).isNotNull())

        # join source to current rows on keys
        s = src.alias("s")
        c = current.alias("c")
        on = [F.col(f"s.{k}") == F.col(f"c.{k}") for k in keys]
        joined = s.join(c, on, "left")

        if cfg.strategy == "timestamp":
            changed_pred = F.col(f"s.{cfg.updated_at}") > F.col(f"c.{UPDATED_AT}")
        else:
            diffs = [
                ~F.col(f"s.{col}").eqNullSafe(F.col(f"c.{col}"))
                for col in cfg.check_cols
            ]
            pred = diffs[0]
            for d in diffs[1:]:
                pred = pred | d
            changed_pred = pred

        is_new = F.col(f"c.{SCD_ID}").isNull()
        src_cols = [F.col(f"s.{col}").alias(col) for col in src.columns]

        inserts = joined.filter(is_new | changed_pred).select(*src_cols)

        # current rows to close: matched + changed
        changed_keys = joined.filter(~is_new & changed_pred).select(
            *[F.col(f"c.{k}").alias(k) for k in keys],
            (F.col(f"s.{UPDATED_AT}") if cfg.strategy == "timestamp" else ts_lit
             ).alias("__close_ts"),
        )
        if cfg.invalidate_hard_deletes:
            # keys gone from the source: close their current rows at
            # the run time (dbt's invalidate_hard_deletes)
            deleted_keys = (
                current.select(*keys)
                .join(src.select(*keys).distinct(), keys, "left_anti")
                .withColumn("__close_ts", ts_lit)
            )
            changed_keys = changed_keys.unionByName(deleted_keys)

        closing = (
            current.alias("t")
            .join(changed_keys.alias("k"), keys, "inner")
            .select(
                *[
                    F.col(f"t.{col}").alias(col)
                    for col in current.columns
                    if col != VALID_TO
                ],
                F.col("k.__close_ts").cast("timestamp_ntz").alias(VALID_TO),
            )
            .select(*current.columns)
        )
        unchanged_current = current.join(
            changed_keys.select(*keys), keys, "left_anti"
        )

        if self.writer.table_provider(target_table) in (
            self.writer.MERGE_CAPABLE_PROVIDERS
        ):
            return self._merge_into(
                target_table, inserts.select(*current.columns), closing
            )

        # Parquet-warehouse path: rebuild + staged swap. New-version
        # rows counted via observe() inside the swap's single write
        # pass — no extra evaluation of the inserts subtree.
        ins, obs = TableWriter._observed(inserts.select(*current.columns))
        merged = (
            closed_history.unionByName(unchanged_current)
            .unionByName(closing)
            .unionByName(ins)
        )
        self.writer._swap_in(merged, target_table)
        return obs.get["rows"]

    @staticmethod
    def merge_into_sql(table: str, staged_view: str) -> str:
        """dbt's snapshot merge (dbt_project.py:529-610 semantics) as a
        single transactional statement: staged rows carry
        ``__change ∈ {insert, update}``; updates close the matched
        current version (same ``dbt_scd_id``), inserts add the new
        version row."""
        return (
            f"MERGE INTO {table} t USING {staged_view} s "
            f"ON t.{SCD_ID} = s.{SCD_ID} AND t.{VALID_TO} IS NULL "
            f"WHEN MATCHED AND s.__change = 'update' "
            f"THEN UPDATE SET t.{VALID_TO} = s.{VALID_TO} "
            "WHEN NOT MATCHED AND s.__change = 'insert' THEN INSERT *"
        )

    def _merge_into(
        self, table: str, inserts: DataFrame, closing: DataFrame
    ) -> int:
        """Transactional SCD2 apply (Delta/Iceberg): one MERGE touches
        only the files holding changed current rows — the 100 TB path,
        vs. the parquet branch's full-table rewrite."""
        # Observe only the inserts subtree: run() reports new-version
        # rows, and the metric is collected during the merge itself.
        ins, obs = TableWriter._observed(inserts)
        staged = ins.withColumn("__change", F.lit("insert")).unionByName(
            closing.withColumn("__change", F.lit("update"))
        )
        view = f"__scd2_staged_{abs(hash(table)) % 10**8}"
        staged.createOrReplaceTempView(view)
        try:
            self.spark.sql(self.merge_into_sql(table, view))
        finally:
            self.spark.catalog.dropTempView(view)
        return obs.get["rows"]
