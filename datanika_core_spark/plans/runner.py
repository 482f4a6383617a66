"""Model-run commands (T8): build / run / test / snapshot / compile
dispatch over the registry, with selector + full_refresh, returning
rows_affected accounting (T10) and per-node logs.

Reference: ``dbtRunner().invoke([command, --select, --full-refresh])``
in-process (dbt_project.py:262-311); rows summed across result nodes
(dbt_project.py:63-77). Here each node executes as Spark SQL in
dependency order; independent models could run concurrently via
Spark scheduler pools (the driver submits jobs; executors already
parallelize within each job).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.operators.scd2 import SnapshotRunner
from datanika_core_spark.plans.dag import build_graph, select
from datanika_core_spark.plans.materialize import Materializer
from datanika_core_spark.plans.model_tests import TestResult, run_test
from datanika_core_spark.plans.models import Model, ModelRegistry
from datanika_core_spark.plans.resolver import compile_model

COMMANDS = ("build", "run", "test", "compile", "seed", "snapshot")


@dataclass
class RunReport:
    command: str
    executed: list[str] = field(default_factory=list)
    rows_affected: int = 0
    test_results: list[TestResult] = field(default_factory=list)
    compiled: dict[str, str] = field(default_factory=dict)
    logs: list[str] = field(default_factory=list)

    @property
    def tests_passed(self) -> bool:
        return all(t.passed for t in self.test_results)


class ModelRunner:
    def __init__(self, spark: SparkSession, registry: ModelRegistry):
        self.spark = spark
        self.registry = registry
        self.materializer = Materializer(spark, registry)

    def invoke(
        self,
        command: str,
        selector: str | None = None,
        full_refresh: bool = False,
    ) -> RunReport:
        if command not in COMMANDS:
            raise ValidationError(f"command must be one of {COMMANDS}")
        if command == "seed":
            return self._run_seeds()
        if command == "snapshot":
            return self._run_snapshots()
        graph = build_graph(self.registry)
        names = select(graph, selector)
        report = RunReport(command)

        if command == "compile":
            for name in names:
                model = self.registry.get(name)
                report.compiled[name] = compile_model(self.registry, model).sql
                report.logs.append(f"compiled {name}")
            return report

        for name in names:
            model = self.registry.get(name)
            if command in ("run", "build"):
                res = self.materializer.run_model(name, full_refresh=full_refresh)
                if res.action != "skipped(ephemeral)":
                    report.executed.append(name)
                    report.rows_affected += res.rows_affected
                report.logs.append(
                    f"{res.action} {name} -> {res.target} ({res.rows_affected} rows)"
                )
            if command in ("test", "build"):
                if model.materialization == "ephemeral":
                    continue
                for ct in model.tests:
                    tr = run_test(
                        self.spark, model.target, ct.column, ct.test, ct.params
                    )
                    report.test_results.append(tr)
                    report.logs.append(
                        f"test {ct.test}({model.name}.{ct.column}):"
                        f" {'PASS' if tr.passed else f'FAIL ({tr.violations})'}"
                    )
        return report

    def _run_seeds(self) -> RunReport:
        """dbt seed: load each registered CSV as {schema}.{name}
        (header + schema inference, overwrite like --full-refresh)."""
        report = RunReport("seed")
        for seed in self.registry.seeds():
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {seed.schema}")
            df = (self.spark.read.option("header", "true")
                  .option("inferSchema", "true").csv(seed.path))
            from datanika_core_spark.operators.writers import drop_table

            drop_table(self.spark, seed.target)
            df.write.format("parquet").mode("overwrite").saveAsTable(
                seed.target
            )
            n = self.spark.table(seed.target).count()
            report.executed.append(seed.name)
            report.rows_affected += n
            report.logs.append(f"seed {seed.name} -> {seed.target} ({n} rows)")
        return report

    def _run_snapshots(self) -> RunReport:
        """dbt snapshot: compile each snapshot's source SQL
        (ref()/source() resolution) and apply one SCD2 run
        (dbt_project.py:529-610)."""
        report = RunReport("snapshot")
        snap_runner = SnapshotRunner(self.spark)
        for snap in self.registry.snapshots():
            self.spark.sql(
                f"CREATE DATABASE IF NOT EXISTS {snap.target_schema}"
            )
            shim = Model(
                name=snap.name, sql_body=snap.sql_body,
                materialization="view", schema=snap.target_schema,
            )
            compiled = compile_model(self.registry, shim)
            source_df = self.spark.sql(compiled.sql)
            n = snap_runner.run(source_df, snap.target, snap.config)
            report.executed.append(snap.name)
            report.rows_affected += n
            report.logs.append(
                f"snapshot {snap.name} -> {snap.target} ({n} new versions)"
            )
        return report
