"""Orchestration layer: run ledger state machine (O1), dependency
gating (O4/O5), cron scheduling (O3), hooks (O6), backup (O7),
catalog metadata (C1-C4)."""

import datetime as dt

import pytest

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.operators.writers import drop_table
from datanika_core_spark.orchestration.backup import (
    MASK,
    export_backup,
    import_backup,
)
from datanika_core_spark.orchestration.catalog_meta import (
    CatalogEntry,
    CatalogStore,
    ColumnInfo,
    introspect_database,
)
from datanika_core_spark.orchestration.dependencies import (
    DependencyGraph,
    Edge,
)
from datanika_core_spark.orchestration.hooks import HookBus
from datanika_core_spark.orchestration.runs import RunLedger, RunStatus
from datanika_core_spark.orchestration.scheduler import (
    CronExpr,
    Schedule,
    SchedulerLoop,
)

UTC = dt.timezone.utc


# -- O1: run ledger ---------------------------------------------------------


def test_run_lifecycle_success():
    led = RunLedger()
    r = led.create("upload", "42")
    assert r.status == RunStatus.PENDING
    led.start(r.run_id)
    led.complete(r.run_id, rows_loaded=123, logs="ok")
    got = led.get(r.run_id)
    assert got.status == RunStatus.SUCCESS
    assert got.rows_loaded == 123
    assert got.started_at and got.finished_at


def test_run_illegal_transitions():
    led = RunLedger()
    r = led.create("upload", "1")
    with pytest.raises(ValidationError):
        led.complete(r.run_id)  # not running
    led.start(r.run_id)
    with pytest.raises(ValidationError):
        led.start(r.run_id)  # already running
    led.complete(r.run_id)
    with pytest.raises(ValidationError):
        led.cancel(r.run_id)  # terminal


def test_run_cancel_from_pending_and_fail():
    led = RunLedger()
    a = led.create("pipeline", "p")
    led.cancel(a.run_id)
    assert led.get(a.run_id).status == RunStatus.CANCELLED
    b = led.create("pipeline", "p")
    led.start(b.run_id)
    led.fail(b.run_id, error="boom")
    assert led.get(b.run_id).error == "boom"


def test_run_journal_table(spark):
    drop_table(spark, "meta.runs")
    led = RunLedger(spark, "meta.runs")
    r = led.create("upload", "u1")
    led.start(r.run_id)
    led.complete(r.run_id, rows_loaded=5)
    hist = led.history()
    assert hist.count() == 3  # one row per transition
    latest = hist.orderBy("updated_at", ascending=False).first()
    assert latest.status == "success" and latest.rows_loaded == 5


# -- O4/O5: dependencies ----------------------------------------------------


def test_edge_validation():
    with pytest.raises(ValidationError):
        Edge("upload", "1", "upload", "1")  # self-ref
    with pytest.raises(ValidationError):
        Edge("upload", "1", "pipeline", "2", 0, "minutes")
    with pytest.raises(ValidationError):
        Edge("upload", "1", "pipeline", "2", 5, "days")
    g = DependencyGraph()
    e = Edge("upload", "1", "pipeline", "2", 5, "minutes")
    g.add(e)
    with pytest.raises(ValidationError):
        g.add(e)  # duplicate


def test_gate_requires_fresh_success():
    led = RunLedger()
    g = DependencyGraph()
    g.add(Edge("upload", "u", "transformation", "t", 30, "minutes"))
    now = dt.datetime(2026, 1, 1, 12, 0)
    # no upstream run at all -> blocked
    assert not g.check_gate(led, "transformation", "t", now).satisfied
    r = led.create("upload", "u")
    led.start(r.run_id)
    led.complete(r.run_id)
    led.get(r.run_id).finished_at = now - dt.timedelta(minutes=10)
    assert g.check_gate(led, "transformation", "t", now).satisfied
    # stale success -> blocked again
    led.get(r.run_id).finished_at = now - dt.timedelta(minutes=45)
    res = g.check_gate(led, "transformation", "t", now)
    assert not res.satisfied and len(res.blocking) == 1


def test_gate_ignores_metadata_only_edges():
    led = RunLedger()
    g = DependencyGraph()
    g.add(Edge("upload", "u", "transformation", "t"))  # no timeframe
    assert g.check_gate(led, "transformation", "t").satisfied


def test_gate_with_retry_celery_parity():
    """Reference polls countdown=60 max_retries=5; virtual time:
    upstream succeeds while the downstream is sleeping between
    attempts."""
    led = RunLedger()
    g = DependencyGraph()
    g.add(Edge("upload", "u", "transformation", "t", 30, "minutes"))
    t0 = dt.datetime(2026, 1, 1, 12, 0)
    state = {"now": t0}
    sleeps: list[int] = []

    def sleep(s):
        sleeps.append(s)
        state["now"] += dt.timedelta(seconds=s)
        if len(sleeps) == 2:  # upstream lands during the 2nd wait
            r = led.create("upload", "u")
            led.start(r.run_id)
            led.complete(r.run_id)
            led.get(r.run_id).finished_at = state["now"]

    res = g.gate_with_retry(
        led, "transformation", "t",
        retries=5, delay_seconds=60,
        sleep=sleep, clock=lambda: state["now"],
    )
    assert res.satisfied
    assert sleeps == [60, 60]  # stopped as soon as satisfied

    # never-satisfied: exhausts exactly the retry budget
    g2 = DependencyGraph()
    g2.add(Edge("upload", "x", "transformation", "y", 5, "minutes"))
    sleeps2: list[int] = []
    res2 = g2.gate_with_retry(
        RunLedger(), "transformation", "y",
        retries=5, delay_seconds=60,
        sleep=lambda s: sleeps2.append(s), clock=lambda: t0,
    )
    assert not res2.satisfied
    assert sleeps2 == [60] * 5


# -- O3: cron ---------------------------------------------------------------


def test_cron_parse_and_match():
    c = CronExpr.parse("*/15 9-17 * * 1-5")
    assert c.matches(dt.datetime(2026, 8, 12, 9, 30))   # Wednesday
    assert not c.matches(dt.datetime(2026, 8, 12, 9, 31))
    assert not c.matches(dt.datetime(2026, 8, 15, 9, 30))  # Saturday
    assert not c.matches(dt.datetime(2026, 8, 12, 18, 0))


def test_cron_validation():
    for bad in ("* * * *", "60 * * * *", "* * * * 8", "a * * * *",
                "*/0 * * * *"):
        with pytest.raises(ValidationError):
            CronExpr.parse(bad)
    # dow 7 == Sunday == 0
    assert CronExpr.parse("0 0 * * 7").matches(dt.datetime(2026, 8, 16, 0, 0))


def test_cron_dom_dow_or_semantics():
    # both restricted -> vixie OR: fires on the 1st AND on Mondays
    c = CronExpr.parse("0 0 1 * 1")
    assert c.matches(dt.datetime(2026, 9, 1, 0, 0))   # 1st (a Tuesday)
    assert c.matches(dt.datetime(2026, 9, 7, 0, 0))   # a Monday, not the 1st
    assert not c.matches(dt.datetime(2026, 9, 2, 0, 0))


def test_cron_next_fire():
    c = CronExpr.parse("30 2 * * *")
    nxt = c.next_fire(dt.datetime(2026, 8, 13, 2, 30))
    assert nxt == dt.datetime(2026, 8, 14, 2, 30)


def test_scheduler_loop_dispatch_once_per_minute():
    loop = SchedulerLoop()
    loop.add(Schedule.create("upload", "u", "*/5 * * * *"))
    t0 = dt.datetime(2026, 8, 13, 10, 5, 2, tzinfo=UTC)
    assert len(loop.due(t0)) == 1
    assert len(loop.due(t0.replace(second=40))) == 0  # coalesced
    assert len(loop.due(t0 + dt.timedelta(minutes=5))) == 1


def test_scheduler_timezone():
    loop = SchedulerLoop()
    loop.add(Schedule.create("upload", "u", "0 9 * * *",
                             timezone="America/New_York"))
    # 13:00 UTC == 09:00 EDT (August)
    assert len(loop.due(dt.datetime(2026, 8, 13, 13, 0, tzinfo=UTC))) == 1
    with pytest.raises(ValidationError):
        Schedule.create("upload", "u", "0 9 * * *", timezone="Mars/Olympus")


# -- O6: hooks --------------------------------------------------------------


def test_hooks_on_emit_off_clear():
    bus = HookBus()
    seen = []
    h = seen.append
    bus.on("run.upload_completed", h)
    bus.emit("run.upload_completed", 3)
    bus.off("run.upload_completed", h)
    bus.emit("run.upload_completed", 4)
    assert seen == [3]
    bus.on("x", h)
    bus.clear()
    assert bus.emit("x", 1) == []


# -- O7: backup -------------------------------------------------------------


def test_backup_roundtrip_masks_and_relinks():
    conns = [{"name": "pg", "type": "postgres", "direction": "source",
              "config": {"host": "h", "password": "hunter2"}}]
    uploads = [
        {"name": "daily", "source_connection": "pg",
         "destination_connection": "wh",
         "dlt_config": {"mode": "single_table", "table": "t",
                        "credentials": {"token": "tok"}}},
        {"name": "orphan", "source_connection": "gone",
         "destination_connection": "wh", "dlt_config": {}},
    ]
    payload = export_backup(conns, uploads)
    assert "hunter2" not in payload and "tok" not in payload
    restored = import_backup(
        payload, existing_connections=[{"name": "wh"}]
    )
    assert [u["name"] for u in restored["uploads"]] == ["daily"]
    assert restored["skipped"] == [{"upload": "orphan", "missing": ["gone"]}]
    assert restored["connections"][0]["config"]["password"] == MASK
    with pytest.raises(ValidationError):
        import_backup("{not json")


# -- C1-C4: catalog ---------------------------------------------------------


def test_catalog_introspect_and_sync(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS cat_db")
    drop_table(spark, "cat_db.t1")
    drop_table(spark, "cat_db._dlt_loads")
    spark.createDataFrame([(1, "a")], "id int, name string") \
        .write.mode("overwrite").saveAsTable("cat_db.t1")
    spark.createDataFrame([(1,)], "x int") \
        .write.mode("overwrite").saveAsTable("cat_db._dlt_loads")

    tables = introspect_database(spark, "cat_db")
    assert [t["table"] for t in tables] == ["t1"]  # _dlt_* skipped
    assert tables[0]["columns"] == [
        {"name": "id", "data_type": "int"},
        {"name": "name", "data_type": "string"},
    ]

    store = CatalogStore()
    store.sync_from_database(spark, "cat_db", dataset="ds",
                             connection="wh")
    e = store.get("t1", "cat_db", "ds")
    assert e.entry_type == "source_table"
    assert [c.name for c in e.columns] == ["id", "name"]

    # upsert updates in place
    store.upsert(CatalogEntry(
        "source_table", "t1", "cat_db", "ds",
        columns=[ColumnInfo("id", "bigint")], description="d2",
    ))
    assert store.get("t1", "cat_db", "ds").description == "d2"
    assert len(store.list()) == 1
    assert store.list(connection="wh") == []  # replaced entry has no conn

    df = store.to_df(spark)
    assert df.count() == 1
    store.delete("t1", "cat_db", "ds")
    assert store.list() == []


# -- backfill / catchup planning ----------------------------------------


def test_backfill_windows_hourly():
    import datetime as dt

    from datanika_core_spark.orchestration.scheduler import (
        backfill_windows,
    )

    runs = backfill_windows(
        "0 * * * *",
        dt.datetime(2024, 1, 1, 0, 30),
        dt.datetime(2024, 1, 1, 5, 0),
    )
    assert [r.hour for r in runs] == [1, 2, 3, 4, 5]
    assert all(r.minute == 0 and r.tzinfo is not None for r in runs)


def test_backfill_windows_timezone():
    import datetime as dt

    from datanika_core_spark.orchestration.scheduler import (
        backfill_windows,
    )

    # 09:00 New York == 14:00 UTC on a winter date
    runs = backfill_windows(
        "0 9 * * *",
        dt.datetime(2024, 1, 10),
        dt.datetime(2024, 1, 12),
        timezone="America/New_York",
    )
    assert [(r.day, r.hour) for r in runs] == [(10, 14), (11, 14)]


def test_backfill_windows_bound():
    import datetime as dt

    import pytest

    from datanika_core_spark.errors import ValidationError
    from datanika_core_spark.orchestration.scheduler import (
        backfill_windows,
    )

    with pytest.raises(ValidationError):
        backfill_windows(
            "* * * * *",
            dt.datetime(2024, 1, 1),
            dt.datetime(2024, 3, 1),
            max_windows=100,
        )


# -- O1+O2 seam: two schedules racing one target table ----------------------


def test_concurrent_schedule_collision(spark):
    """Two schedules fire in the same minute for the SAME target
    table. The dispatch-time exclusivity guard must let exactly one
    through: the loser is journaled CANCELLED with a skip reason and
    never reaches a writer, so the target ends up exactly as a
    single run would leave it — queued/skipped, never corrupt."""
    from datanika_core_spark.operators.writers import TableWriter

    table = "default.collision_t"
    drop_table(spark, table)
    writer = TableWriter(spark)
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, v string"
    )
    writer.write(base, table, "replace")

    loop = SchedulerLoop()
    loop.add(Schedule.create("transformation", table, "* * * * *"))
    loop.add(Schedule.create("transformation", table, "* * * * *"))
    fired = loop.due(dt.datetime(2024, 3, 1, 12, 0, tzinfo=UTC))
    assert len(fired) == 2  # both are due — the ledger must arbitrate

    ledger = RunLedger()
    batch = spark.createDataFrame(
        [(2, "b2"), (3, "c")], "id bigint, v string"
    )

    # dispatch both while neither has finished: the race window
    runs = [
        ledger.create_exclusive(s.target_type, s.target_id)
        for s in fired
    ]
    winners = [r for r, acquired in runs if acquired]
    losers = [r for r, acquired in runs if not acquired]
    assert len(winners) == 1 and len(losers) == 1

    loser = losers[0]
    assert loser.status is RunStatus.CANCELLED
    assert loser.error and loser.error.startswith("skipped: run")
    # a skipped run can never transition to RUNNING (writer-proof)
    with pytest.raises(ValidationError):
        ledger.start(loser.run_id)

    win = winners[0]
    ledger.start(win.run_id)
    res = writer.write(batch, table, "merge", primary_key="id")
    ledger.complete(win.run_id, rows_loaded=res.rows_loaded)

    got = {
        (r.id, r.v) for r in spark.table(table).collect()
    }
    assert got == {(1, "a"), (2, "b2"), (3, "c")}  # one clean merge

    # once the winner finished, the next dispatch acquires normally
    rerun, acquired = ledger.create_exclusive("transformation", table)
    assert acquired and rerun.status is RunStatus.PENDING

    statuses = sorted(
        r.status.value for r in ledger.runs_for("transformation", table)
    )
    assert statuses == ["cancelled", "pending", "success"]
    drop_table(spark, table)
