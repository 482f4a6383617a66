"""Concurrent model execution (dbt ``threads: 4`` parity —
reference dbt_project.py:231 generates that profile setting).

Independent models in one topo level must OVERLAP in wall-clock;
dependent models must still strictly follow their upstreams; failures
surface deterministically (alphabetically-first failed model of the
level) after the level drains. The materializer is faked so these
tests measure the runner's scheduling, not Spark job latency.
"""

from __future__ import annotations

import threading
import time

import pytest

from datanika_core_spark.plans.materialize import MaterializeResult
from datanika_core_spark.plans.models import Model, ModelRegistry
from datanika_core_spark.plans.runner import ModelRunner

_SLEEP = 0.35


class FakeMaterializer:
    """Records (start, end) monotonic intervals per model."""

    def __init__(self, fail: set[str] | None = None):
        self.calls: dict[str, tuple[float, float]] = {}
        self.fail = fail or set()
        self._lock = threading.Lock()

    def run_model(self, name: str, full_refresh: bool = False):
        start = time.monotonic()
        time.sleep(_SLEEP)
        end = time.monotonic()
        with self._lock:
            self.calls[name] = (start, end)
        if name in self.fail:
            raise ValueError(f"boom:{name}")
        return MaterializeResult(name, f"an.{name}", "view", 1)


@pytest.fixture()
def diamond_registry():
    r = ModelRegistry()
    r.add(Model("a", "SELECT 1 AS x", materialization="view", schema="an"))
    r.add(Model("b", "SELECT 2 AS x", materialization="view", schema="an"))
    r.add(Model(
        "c",
        "SELECT * FROM {{ ref('a') }} UNION ALL SELECT * FROM {{ ref('b') }}",
        materialization="view", schema="an",
    ))
    return r


def test_independent_models_overlap(spark, diamond_registry):
    runner = ModelRunner(spark, diamond_registry)
    fake = FakeMaterializer()
    runner.materializer = fake
    report = runner.invoke("run", threads=4)

    # deterministic report: level order, names sorted within a level
    assert report.executed == ["a", "b", "c"]
    assert report.rows_affected == 3

    (a0, a1), (b0, b1) = fake.calls["a"], fake.calls["b"]
    c0, _ = fake.calls["c"]
    # a and b are one level: their intervals must overlap (each takes
    # _SLEEP; sequential execution would put one strictly after the
    # other with a 2*_SLEEP span)
    assert max(a0, b0) < min(a1, b1), "level-mates did not overlap"
    # c depends on both: it must start only after the level drains
    assert c0 >= max(a1, b1)


def test_sequential_threads_1_still_works(spark, diamond_registry):
    runner = ModelRunner(spark, diamond_registry)
    fake = FakeMaterializer()
    runner.materializer = fake
    report = runner.invoke("run", threads=1)
    assert report.executed == ["a", "b", "c"]
    (a0, a1), (b0, b1) = fake.calls["a"], fake.calls["b"]
    assert b0 >= a1 or a0 >= b1  # no overlap when threads=1


def test_level_failure_is_deterministic_and_blocks_downstream(
    spark, diamond_registry
):
    runner = ModelRunner(spark, diamond_registry)
    # BOTH level-mates fail: the raised error must be the
    # alphabetically-first one, every time.
    fake = FakeMaterializer(fail={"a", "b"})
    runner.materializer = fake
    with pytest.raises(ValueError, match="boom:a"):
        runner.invoke("run", threads=4)
    # the whole level drained (sibling b still ran) ...
    assert set(fake.calls) == {"a", "b"}
    # ... but the downstream model never started
    assert "c" not in fake.calls


def test_concurrent_build_real_models(spark):
    """End-to-end: four independent REAL table models + a downstream
    union, built with threads=4 against the live SparkSession —
    validates catalog/writer thread-safety, not just scheduling."""
    from datanika_core_spark.operators.writers import drop_table

    spark.sql("CREATE DATABASE IF NOT EXISTS an")
    drop_table(spark, "raw_conc")
    spark.createDataFrame(
        [(i, i * 10) for i in range(1, 9)], "id int, v int"
    ).write.mode("overwrite").saveAsTable("raw_conc")

    r = ModelRegistry()
    r.add_source("raw", "conc", "raw_conc")
    for q in range(4):
        r.add(Model(
            f"part{q}",
            "SELECT id, v FROM {{ source('raw','conc') }}"
            f" WHERE id % 4 = {q}",
            materialization="table", schema="an",
        ))
    r.add(Model(
        "conc_union",
        " UNION ALL ".join(
            "SELECT * FROM {{ ref('part%d') }}" % q for q in range(4)
        ),
        materialization="table", schema="an",
    ))
    report = ModelRunner(spark, r).invoke("build", threads=4)
    assert report.executed == [f"part{q}" for q in range(4)] + ["conc_union"]
    got = spark.table("an.conc_union").agg({"v": "sum"}).collect()[0][0]
    assert got == sum(i * 10 for i in range(1, 9))
    for q in range(4):
        drop_table(spark, f"an.part{q}")
    drop_table(spark, "an.conc_union")
    drop_table(spark, "raw_conc")


def test_fair_scheduler_wiring(spark):
    """build_spark sessions run FAIR with the shipped allocation
    file, so the per-worker pool tags actually time-share a wide
    level's jobs (dbt threads parity off local mode too)."""
    import xml.etree.ElementTree as ET

    from datanika_core_spark.session import FAIR_SCHEDULER_XML

    conf = spark.sparkContext.getConf()
    assert conf.get("spark.scheduler.mode") == "FAIR"
    assert conf.get("spark.scheduler.allocation.file") == FAIR_SCHEDULER_XML
    pools = {
        p.get("name")
        for p in ET.parse(FAIR_SCHEDULER_XML).getroot().findall("pool")
    }
    # one shipped pool per default-threads worker (extras auto-create)
    assert {f"models-{i}" for i in range(4)} <= pools


def test_fifo_session_logs_pool_advisory(spark, diamond_registry,
                                          monkeypatch):
    """Under a FIFO context the pool names are inert — the runner
    must say so in the report log instead of silently degrading; a
    FAIR context (the build_spark default) stays advisory-free."""
    import datanika_core_spark.plans.runner as runner_mod

    runner = ModelRunner(spark, diamond_registry)
    runner.materializer = FakeMaterializer()
    report = runner.invoke("run", threads=4)
    assert not [line for line in report.logs if "inert" in line]

    monkeypatch.setattr(runner_mod, "_scheduler_mode", lambda s: "FIFO")
    runner.materializer = FakeMaterializer()
    report = runner.invoke("run", threads=4)
    assert [line for line in report.logs if "inert" in line]
    # single-threaded runs never need the advisory
    runner.materializer = FakeMaterializer()
    report = runner.invoke("run", threads=1)
    assert not [line for line in report.logs if "inert" in line]
