"""Model-run commands (T8): build / run / test / snapshot / compile
dispatch over the registry, with selector + full_refresh, returning
rows_affected accounting (T10) and per-node logs.

Reference: ``dbtRunner().invoke([command, --select, --full-refresh])``
in-process (dbt_project.py:262-311); rows summed across result nodes
(dbt_project.py:63-77). Here each node executes as Spark SQL in
dependency order; INDEPENDENT models run concurrently (dbt
``threads: 4`` parity — the reference's generated profile,
dbt_project.py:231): the DAG is cut into topological levels and each
level's models are submitted from a thread pool, one Spark FAIR
scheduler pool per worker so a wide level's jobs time-share executors
instead of queuing FIFO behind each other. Reporting stays
deterministic — results merge in level order (names sorted within a
level, which concatenates to a valid topo order), and a failure
raises the alphabetically-first failed model's error after its level
drains.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.operators.scd2 import SnapshotRunner
from datanika_core_spark.plans.dag import build_graph, select, topo_levels
from datanika_core_spark.plans.materialize import Materializer
from datanika_core_spark.plans.model_tests import TestResult, run_test
from datanika_core_spark.plans.models import Model, ModelRegistry
from datanika_core_spark.plans.resolver import compile_model

COMMANDS = ("build", "run", "test", "compile", "seed", "snapshot")


def _scheduler_mode(spark: SparkSession) -> str:
    """The context's job-scheduling mode; pool tags are inert unless
    this is FAIR (a context conf — fixed at session build time)."""
    return spark.sparkContext.getConf().get(
        "spark.scheduler.mode", "FIFO"
    )


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
        threads: int = 4,
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

        # The per-worker pool tags only time-share executors under
        # FAIR scheduling (build_spark sets it + ships
        # resources/fairscheduler.xml); surface an advisory when the
        # session runs FIFO so the inert pools aren't a silent
        # surprise on a shared cluster.
        if max(1, int(threads)) > 1:
            if _scheduler_mode(self.spark).upper() != "FAIR":
                report.logs.append(
                    "note: spark.scheduler.mode=FIFO — per-worker "
                    "scheduler pools are inert; set FAIR (build_spark "
                    "default; pools in resources/fairscheduler.xml) so "
                    "a wide level's jobs time-share executors"
                )

        # Level-wise execution: models within a topo level share no
        # edges, so they run concurrently (dbt threads parity). A
        # later level never starts until the whole previous level —
        # including failures — has drained, so a failure can never
        # race its own downstream.
        for level in topo_levels(graph, set(names)):
            results = self._run_level(
                level, command, full_refresh, max(1, int(threads))
            )
            first_err: BaseException | None = None
            for name, executed, rows, trs, logs, exc in results:
                report.logs.extend(logs)
                if exc is not None:
                    if first_err is None:
                        first_err = exc
                    continue
                if executed:
                    report.executed.append(name)
                    report.rows_affected += rows
                report.test_results.extend(trs)
            if first_err is not None:
                raise first_err
        return report

    def _run_level(
        self,
        level: list[str],
        command: str,
        full_refresh: bool,
        threads: int,
    ):
        """Execute one topo level, concurrently when it is wide.
        Returns per-model result tuples IN LEVEL (sorted-name) order
        regardless of completion order, so reports are deterministic."""
        if threads <= 1 or len(level) <= 1:
            return [
                self._run_node(name, command, full_refresh, pool=None)
                for name in level
            ]
        with ThreadPoolExecutor(
            max_workers=min(threads, len(level)),
            thread_name_prefix="model-runner",
        ) as pool:
            futures = [
                pool.submit(
                    self._run_node, name, command, full_refresh,
                    f"models-{i % threads}",
                )
                for i, name in enumerate(level)
            ]
            return [f.result() for f in futures]

    def _run_node(
        self,
        name: str,
        command: str,
        full_refresh: bool,
        pool: str | None,
    ):
        """Materialize + test ONE model; never raises — the exception
        travels in the result tuple so the level can drain and the
        caller can fail deterministically. Sets a per-worker Spark
        FAIR-pool local property (thread-local under pinned-thread
        mode) so a wide level's jobs time-share executors."""
        sc = self.spark.sparkContext
        if pool is not None:
            sc.setLocalProperty("spark.scheduler.pool", pool)
        executed = False
        rows = 0
        trs: list[TestResult] = []
        logs: list[str] = []
        try:
            model = self.registry.get(name)
            if command in ("run", "build"):
                res = self.materializer.run_model(
                    name, full_refresh=full_refresh
                )
                if res.action != "skipped(ephemeral)":
                    executed = True
                    rows = res.rows_affected
                logs.append(
                    f"{res.action} {name} -> {res.target}"
                    f" ({res.rows_affected} rows)"
                )
            if command in ("test", "build"):
                if model.materialization == "ephemeral":
                    return (name, executed, rows, trs, logs, None)
                for ct in model.tests:
                    tr = run_test(
                        self.spark, model.target, ct.column, ct.test,
                        ct.params,
                    )
                    trs.append(tr)
                    logs.append(
                        f"test {ct.test}({model.name}.{ct.column}):"
                        f" {'PASS' if tr.passed else f'FAIL ({tr.violations})'}"
                    )
            return (name, executed, rows, trs, logs, None)
        except BaseException as exc:  # noqa: BLE001 — re-raised by caller
            logs.append(f"error {name}: {exc}")
            return (name, executed, rows, trs, logs, exc)
        finally:
            if pool is not None:
                sc.setLocalProperty("spark.scheduler.pool", None)

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
