"""Materializations (T1-T4, T9): view / table / incremental /
ephemeral, executed by Spark SQL.

Reference behavior (dbt via dbt_project.py:141-191,265-311):
- view        → CREATE OR REPLACE VIEW target AS <sql>
- table       → CREATE TABLE AS (overwrite)
- incremental → first run (or full_refresh) = CTAS; later runs
  compile with is_incremental()=true and apply the configured
  strategy on unique_key: merge (upsert) / append /
  delete+insert (delete matching keys, insert batch);
  on_schema_change: ignore/fail/append_new_columns/sync_all_columns
- ephemeral   → nothing materialized; consumers inline it as a CTE

Scale notes: the incremental path writes only the new-rows batch —
with an is_incremental() filter like
``updated_at > (SELECT max(updated_at) FROM {{ this }})`` the scan
of the source is pruned by the pushed-down predicate, and merge
touches only matching keys (on Delta this becomes MERGE INTO; here
it composes anti-join + staged swap like TableWriter).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from datanika_core_spark.errors import SchemaContractViolation, ValidationError
from datanika_core_spark.operators.writers import SchemaContract, TableWriter, drop_table
from datanika_core_spark.plans.models import Model, ModelRegistry
from datanika_core_spark.plans.resolver import compile_model


@dataclass
class MaterializeResult:
    model: str
    target: str
    action: str  # view|ctas|merge|append|delete+insert|skipped(ephemeral)
    rows_affected: int


class Materializer:
    def __init__(self, spark: SparkSession, registry: ModelRegistry):
        self.spark = spark
        self.registry = registry
        self.writer = TableWriter(spark)

    def _ensure_schema(self, model: Model) -> None:
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {model.schema}")

    def run_model(self, name: str, full_refresh: bool = False) -> MaterializeResult:
        model = self.registry.get(name)
        if model.materialization == "ephemeral":
            # T4: inlined by consumers; nothing to execute.
            return MaterializeResult(name, "", "skipped(ephemeral)", 0)
        self._ensure_schema(model)
        if model.materialization == "view":
            compiled = compile_model(self.registry, model)
            self.spark.sql(
                f"CREATE OR REPLACE VIEW {model.target} AS {compiled.sql}"
            )
            return MaterializeResult(
                name, model.target, "view",
                self.spark.table(model.target).count(),
            )
        if model.materialization == "table":
            compiled = compile_model(self.registry, model)
            df = self.spark.sql(compiled.sql)
            drop_table(self.spark, model.target)
            df, obs = TableWriter._observed(df)
            df.write.format("parquet").mode("overwrite").saveAsTable(model.target)
            return MaterializeResult(
                name, model.target, "ctas", obs.get["rows"],
            )
        # incremental
        return self._run_incremental(model, full_refresh)

    def _run_incremental(self, model: Model, full_refresh: bool) -> MaterializeResult:
        cfg = model.incremental
        exists = self.spark.catalog.tableExists(model.target)
        if full_refresh or not exists:
            compiled = compile_model(self.registry, model, is_incremental_run=False)
            df = self.spark.sql(compiled.sql)
            drop_table(self.spark, model.target)
            df, obs = TableWriter._observed(df)
            writer = df.write.format("parquet").mode("overwrite")
            if cfg.strategy == "insert_overwrite":
                # lay the target out partitioned so later runs can
                # replace partitions instead of rewriting the table
                writer = writer.partitionBy(cfg.partition_by)
            writer.saveAsTable(model.target)
            return MaterializeResult(
                model.name, model.target, "ctas", obs.get["rows"],
            )

        compiled = compile_model(self.registry, model, is_incremental_run=True)
        batch = self.spark.sql(compiled.sql)
        batch = self._reconcile_schema(model, batch, cfg.on_schema_change)

        if cfg.strategy == "append":
            res = self.writer.write(batch, model.target, "append")
            return MaterializeResult(
                model.name, model.target, "append", res.rows_loaded
            )
        if cfg.strategy == "insert_overwrite":
            return self._insert_overwrite(model, batch, cfg)
        keys = (
            [cfg.unique_key] if isinstance(cfg.unique_key, str) else list(cfg.unique_key)
        )
        if cfg.strategy == "merge":
            res = self.writer.write(
                batch, model.target, "merge", primary_key=keys,
                precedence_col=cfg.updated_at,
            )
            return MaterializeResult(
                model.name, model.target, "merge", res.rows_loaded
            )
        # delete+insert: drop ALL target rows with keys present in the
        # batch, then insert the whole batch (dbt semantics). Batch rows
        # are observed inside the swap's one write pass (the stage write
        # happens before the old target files are replaced, so the
        # is_incremental() {{ this }} subquery still reads valid files).
        target = self.spark.table(model.target)
        kept = target.join(
            batch.select(*keys).distinct(), on=keys, how="left_anti"
        )
        observed_batch, obs = TableWriter._observed(batch.select(*target.columns))
        merged = kept.unionByName(observed_batch)
        self.writer._swap_in(merged, model.target)
        return MaterializeResult(
            model.name, model.target, "delete+insert", obs.get["rows"]
        )

    def _insert_overwrite(
        self, model: Model, batch: DataFrame, cfg
    ) -> MaterializeResult:
        """dbt-on-Spark's partition-replacing incremental: ONLY the
        partitions present in the batch are atomically overwritten
        (dynamic partition overwrite); untouched partitions are never
        read or rewritten — the write cost is proportional to the
        changed partitions, which is the point of the strategy at
        100 TB. No unique_key, no merge shuffle."""
        target_cols = self.spark.table(model.target).columns
        observed, obs = TableWriter._observed(batch.select(*target_cols))
        prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            # insertInto is position-based: columns were aligned above
            observed.write.insertInto(model.target, overwrite=True)
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
        return MaterializeResult(
            model.name, model.target, "insert_overwrite", obs.get["rows"]
        )

    def _reconcile_schema(
        self, model: Model, batch: DataFrame, mode: str
    ) -> DataFrame:
        """on_schema_change handling (T3) — dbt's four named modes
        (dbt_project.py:170-175 exposes the config; semantics per
        dbt-core's incremental materialization):

        - ``ignore`` (dbt default): new batch columns are simply not
          written; departed columns stay NULL-filled.
        - ``fail``: any schema drift aborts the run.
        - ``append_new_columns``: new batch columns are ADDED to the
          target; columns that vanished from the batch are kept
          (NULL for new rows).
        - ``sync_all_columns``: adds new columns AND drops target
          columns absent from the batch; batch values are cast to the
          target's type where both have the column.

        Column adds are metadata-only (ALTER TABLE ADD COLUMNS).
        Column drops on a parquet warehouse require a staged rewrite
        (no DROP COLUMNS without a v2/transactional catalog — on
        Delta/Iceberg this would be a metadata-only ALTER).
        """
        target_cols = set(self.spark.table(model.target).columns)
        batch_cols = set(batch.columns)
        new = batch_cols - target_cols
        departed = target_cols - batch_cols
        if mode == "fail":
            if new or departed:
                raise SchemaContractViolation(
                    f"model {model.name}: schema drift (new {sorted(new)},"
                    f" departed {sorted(departed)}) with on_schema_change=fail"
                )
            return batch
        if mode == "ignore":
            return batch.drop(*new) if new else batch
        if mode not in ("append_new_columns", "sync_all_columns"):
            raise ValidationError(f"unknown on_schema_change {mode!r}")
        if mode == "sync_all_columns" and departed:
            # The batch plan may read {{ this }} (the canonical
            # is_incremental pattern), so its unexecuted plan is pinned
            # to the target's CURRENT files — rewriting the target first
            # would delete those files out from under it and the later
            # batch execution dies with FileNotFoundException.
            # Materialize the batch eagerly before touching the target.
            # Cost is bounded: this runs only on the rare
            # departed-column drift event, and only the incremental
            # batch (not the table) is checkpointed.
            batch = batch.localCheckpoint(eager=True)
            survivors = [
                c for c in self.spark.table(model.target).columns
                if c not in departed
            ]
            self.writer._swap_in(
                self.spark.table(model.target).select(*survivors),
                model.target,
            )
        # evolve-add any new columns, then align order/types/NULL-fill
        # vs the (possibly just-narrowed) target schema
        df2, _ = self.writer._apply_column_contract(
            batch, model.target, SchemaContract(columns="evolve")
        )
        return df2
