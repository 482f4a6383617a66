"""End-to-end ELT scenario: the reference's daily loop stitched
across modules — incremental cursor ingest (merge disposition) →
model DAG build (staging view, incremental merge model, rollup) →
data tests → SCD2 snapshot → catalog sync → run ledger + dependency
gate + cron fire. Piecewise behavior is covered elsewhere; this file
guards the SEAMS (cursor state feeding the second extraction,
is_incremental() reading {{ this }} after the first build, snapshot
closing rows the ingest just merged, catalog reflecting the final
tables, the gate reading the ledger the runs wrote)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datanika_core_spark.ingest import IngestionJob
from datanika_core_spark.operators.incremental import CursorStateStore
from datanika_core_spark.operators.scd2 import SnapshotConfig
from datanika_core_spark.operators.writers import drop_table
from datanika_core_spark.orchestration.catalog_meta import CatalogStore
from datanika_core_spark.orchestration.dependencies import (
    DependencyGraph,
    Edge,
)
from datanika_core_spark.orchestration.runs import RunLedger
from datanika_core_spark.orchestration.scheduler import (
    Schedule,
    SchedulerLoop,
)
from datanika_core_spark.plans.models import (
    ColumnTest,
    IncrementalConfig,
    Model,
    ModelRegistry,
    SnapshotDef,
)
from datanika_core_spark.plans.runner import ModelRunner
from datanika_core_spark.session import EngineSession
from datanika_core_spark.sources.base import TableBatch
from datanika_core_spark.specs import UploadSpec


class _ListSource:
    def __init__(self, *batches: TableBatch):
        self._batches = list(batches)

    def tables(self):
        yield from self._batches


def _purchases(spark, rows):
    return spark.createDataFrame(
        rows, "id int, user_id int, status string, amount double,"
        " updated string"
    ).selectExpr(
        "id", "user_id", "status", "amount",
        "cast(updated as timestamp_ntz) AS updated",
    )


DAY1 = [
    (1, 10, "open", 50.0, "2024-03-01 08:00:00"),
    (2, 10, "open", 70.0, "2024-03-01 09:00:00"),
    (3, 11, "paid", 20.0, "2024-03-01 10:00:00"),
]
# day 2: row 2 flips to paid (newer cursor), rows 4-5 are new
DAY2_CHANGES = [
    (2, 10, "paid", 70.0, "2024-03-02 07:00:00"),
    (4, 12, "open", 90.0, "2024-03-02 08:00:00"),
    (5, 11, "paid", 40.0, "2024-03-02 09:00:00"),
]

SPEC = {
    "mode": "single_table",
    "table": "purchases",
    "write_disposition": "merge",
    "primary_key": "id",
    "incremental": {"cursor_path": "updated"},
}


@pytest.fixture(scope="module")
def scenario(spark, tmp_path_factory):
    """Run the whole two-day loop once; tests assert on the result."""
    tmp = tmp_path_factory.mktemp("elt_scenario")
    engine = EngineSession(spark)
    engine.drop_database("shop_land")
    for tbl in ("analytics_scn.stg_purchases",
                "analytics_scn.user_revenue",
                "analytics_scn.revenue_by_status",
                "snapshots.purchases_snap",
                "snapshots.purchases_snap__stage"):
        drop_table(spark, tbl)
    spark.sql("CREATE DATABASE IF NOT EXISTS analytics_scn")

    state = CursorStateStore(str(tmp / "cursors.json"))
    job = IngestionJob(engine, state)
    spec = UploadSpec.from_config("Shop Land", SPEC)

    ledger = RunLedger()
    deps = DependencyGraph()
    deps.add(Edge("upload", "shop_land", "transformation", "user_revenue",
                  timeframe_value=24, timeframe_unit="hours"))
    loop = SchedulerLoop()
    loop.add(Schedule.create("upload", "shop_land", "0 6 * * *"))

    registry = ModelRegistry()
    registry.add_source("land", "purchases", "shop_land.purchases")
    registry.add(Model(
        "stg_purchases",
        "SELECT id, user_id, status, amount, updated"
        " FROM {{ source('land', 'purchases') }}",
        materialization="view", schema="analytics_scn",
    ))
    registry.add(Model(
        "user_revenue",
        """
        SELECT id, user_id, amount, updated
        FROM {{ ref('stg_purchases') }}
        {% if is_incremental() %}
        WHERE updated > (SELECT max(updated) FROM {{ this }})
        {% endif %}
        """,
        materialization="incremental", schema="analytics_scn",
        incremental=IncrementalConfig(strategy="merge", unique_key="id"),
        tests=[ColumnTest("id", "not_null"),
               ColumnTest("id", "unique")],
    ))
    registry.add(Model(
        "revenue_by_status",
        "SELECT status, count(*) AS n, round(sum(amount), 2) AS revenue"
        " FROM {{ ref('stg_purchases') }} GROUP BY status",
        materialization="table", schema="analytics_scn",
    ))
    registry.add_snapshot(SnapshotDef(
        name="purchases_snap",
        sql_body="SELECT * FROM {{ source('land', 'purchases') }}",
        config=SnapshotConfig(unique_key="id", strategy="timestamp",
                              updated_at="updated"),
    ))
    runner = ModelRunner(spark, registry)

    def one_day(source_rows):
        run = ledger.create("upload", "shop_land")
        ledger.start(run.run_id)
        res = job.run(
            spec, _ListSource(TableBatch("purchases",
                                         _purchases(spark, source_rows)))
        )
        ledger.complete(run.run_id, rows_loaded=res.rows_loaded)
        build = runner.invoke("build")
        tests = runner.invoke("test")
        snap = runner.invoke("snapshot")
        return res, build, tests, snap

    # day 1: cursor state empty -> everything extracts
    d1 = one_day(DAY1)
    # day 2: the "source table" now holds day1 + day2 rows; the cursor
    # must prune extraction to the three rows past the high-water mark
    d2 = one_day(DAY1 + DAY2_CHANGES)

    catalog = CatalogStore()
    catalog.sync_from_database(spark, "shop_land", dataset="shop_land",
                               connection="warehouse")
    return {
        "engine": engine, "state": state, "ledger": ledger,
        "deps": deps, "loop": loop, "catalog": catalog,
        "d1": d1, "d2": d2, "spark": spark,
    }


def test_ingest_cursor_prunes_second_extraction(scenario):
    d1_res, *_ = scenario["d1"]
    d2_res, *_ = scenario["d2"]
    assert d1_res.rows_loaded == 3
    # day 2 re-presents all 6 source rows; only the 3 past the cursor load
    assert d2_res.rows_loaded == 3
    spark = scenario["spark"]
    tbl = spark.table("shop_land.purchases")
    assert tbl.count() == 5  # merge on id: row 2 upserted, not duplicated
    assert tbl.filter("id = 2").first().status == "paid"


def test_cursor_state_advances(scenario):
    val = scenario["state"].get("shop_land", "purchases")
    assert val is not None and "2024-03-02 09:00:00" in str(val)


def test_incremental_model_merges_only_new_rows(scenario):
    spark = scenario["spark"]
    ur = spark.table("analytics_scn.user_revenue")
    assert ur.count() == 5
    assert ur.filter("id = 2").first().amount == 70.0
    # second build ran in incremental mode and touched only the delta:
    # the runner logs per-node rows_affected
    _, build2, _, _ = scenario["d2"]
    line = next(l for l in build2.logs if " user_revenue " in l)
    assert "(3 rows)" in line, f"is_incremental() must prune: {line}"


def test_model_tests_green(scenario):
    _, _, tests2, _ = scenario["d2"]
    assert tests2.tests_passed


def test_rollup_reflects_final_state(scenario):
    spark = scenario["spark"]
    got = {
        r.status: (r.n, r.revenue)
        for r in spark.table("analytics_scn.revenue_by_status").collect()
    }
    assert got == {"open": (2, 140.0), "paid": (3, 130.0)}


def test_snapshot_closed_the_flipped_row(scenario):
    spark = scenario["spark"]
    hist = spark.table("snapshots.purchases_snap")
    # 3 initial versions + row 2's new version + rows 4, 5
    assert hist.count() == 6
    row2 = hist.filter("id = 2").orderBy("dbt_valid_from").collect()
    assert len(row2) == 2
    assert row2[0].dbt_valid_to is not None  # closed
    assert row2[1].dbt_valid_to is None      # current
    assert row2[1].status == "paid"


def test_catalog_sees_ingested_table(scenario):
    entry = scenario["catalog"].get("purchases", "shop_land", "shop_land")
    assert {c.name for c in entry.columns} >= {
        "id", "user_id", "status", "amount", "updated"
    }


def test_gate_and_schedule_read_the_ledger(scenario):
    ledger, deps, loop = (
        scenario["ledger"], scenario["deps"], scenario["loop"]
    )
    last = ledger.last_success("upload", "shop_land")
    assert last is not None
    # inside the 24-hour window -> gate opens
    ok = deps.check_gate(
        ledger, "transformation", "user_revenue",
        now=last.finished_at + dt.timedelta(hours=1),
    )
    assert ok.satisfied
    # 3 days later with no fresh upload run -> gate blocks
    stale = deps.check_gate(
        ledger, "transformation", "user_revenue",
        now=last.finished_at + dt.timedelta(days=3),
    )
    assert not stale.satisfied
    # the upload's 06:00 cron fires exactly at its minute
    fire = loop.due(dt.datetime(2024, 3, 3, 6, 0,
                                tzinfo=dt.timezone.utc))
    assert [s.target_id for s in fire] == ["shop_land"]
    assert loop.due(dt.datetime(2024, 3, 3, 6, 1,
                                tzinfo=dt.timezone.utc)) == []


# -- day 3: schema drift through the whole loop -----------------------------

DAY3_CHANGES = [
    # a new `channel` column appears at the source
    (6, 13, "open", 30.0, "2024-03-03 08:00:00", "web"),
    (7, 10, "paid", 60.0, "2024-03-03 09:00:00", "app"),
]


def test_day3_schema_drift_append_new_columns(scenario):
    """The new source column must flow: ingest evolves the landing
    table (contract default), and the incremental model with
    on_schema_change=append_new_columns ADDs the column while old
    rows backfill NULL — the canonical mid-stream drift event."""
    spark = scenario["spark"]
    state = scenario["state"]
    engine = scenario["engine"]

    base = _purchases(spark, DAY1 + DAY2_CHANGES).withColumn(
        "channel", F.lit(None).cast("string")
    )
    extra = spark.createDataFrame(
        DAY3_CHANGES,
        "id int, user_id int, status string, amount double,"
        " updated string, channel string",
    ).selectExpr(
        "id", "user_id", "status", "amount",
        "cast(updated as timestamp_ntz) AS updated", "channel",
    )
    source_now = base.unionByName(extra)

    job = IngestionJob(engine, state)
    spec = UploadSpec.from_config("Shop Land", SPEC)
    res = job.run(spec, _ListSource(TableBatch("purchases", source_now)))
    # cursor prunes to the two day-3 rows
    assert res.rows_loaded == 2
    landed = spark.table("shop_land.purchases")
    assert "channel" in landed.columns  # contract evolved the table
    assert landed.count() == 7
    assert landed.filter("channel IS NOT NULL").count() == 2

    # rebuild with a model that now selects the new column and asks
    # for append_new_columns
    registry = ModelRegistry()
    registry.add_source("land", "purchases", "shop_land.purchases")
    registry.add(Model(
        "user_revenue",
        """
        SELECT id, user_id, amount, updated, channel
        FROM {{ source('land', 'purchases') }}
        {% if is_incremental() %}
        WHERE updated > (SELECT max(updated) FROM {{ this }})
        {% endif %}
        """,
        materialization="incremental", schema="analytics_scn",
        incremental=IncrementalConfig(
            strategy="merge", unique_key="id",
            on_schema_change="append_new_columns",
        ),
    ))
    report = ModelRunner(spark, registry).invoke("build")
    line = next(l for l in report.logs if " user_revenue " in l)
    assert "(2 rows)" in line, line
    ur = spark.table("analytics_scn.user_revenue")
    assert "channel" in ur.columns
    assert ur.count() == 7
    # old rows NULL-backfilled, new rows carry the value
    assert ur.filter("channel IS NOT NULL").count() == 2
    assert ur.filter("id = 6").first().channel == "web"


# -- days 4-6: downtime, then a backfill_windows-driven catch-up ------------

CATCHUP = [
    # (row, visible-from) — one change lands each day of the outage
    (8, 12, "open", 25.0, "2024-03-04 05:00:00", "web"),
    (9, 13, "paid", 55.0, "2024-03-05 05:30:00", "app"),
    (2, 10, "refunded", 70.0, "2024-03-06 04:00:00", "web"),
]


def test_backfill_catchup_replays_missed_windows(scenario):
    """The scheduler was down for three days after the 06:00 fire on
    day 3. backfill_windows enumerates the missed fire times, and the
    operator replays ONE ingest per window in order, each seeing the
    source as it stood at that fire time. The seam being guarded:
    window enumeration (scheduler) x cursor state (incremental) x
    merge disposition (writer) x run ledger (orchestration) compose
    so the catch-up loads every row exactly once and the gate reopens."""
    import datetime as dt

    from datanika_core_spark.orchestration.scheduler import (
        backfill_windows,
    )

    spark = scenario["spark"]
    engine = scenario["engine"]
    state = scenario["state"]
    ledger = scenario["ledger"]
    deps = scenario["deps"]

    missed = backfill_windows(
        "0 6 * * *",
        start=dt.datetime(2024, 3, 3, 6, 0),
        end=dt.datetime(2024, 3, 6, 7, 0),
    )
    assert [t.replace(tzinfo=None) for t in missed] == [
        dt.datetime(2024, 3, 4, 6, 0),
        dt.datetime(2024, 3, 5, 6, 0),
        dt.datetime(2024, 3, 6, 6, 0),
    ]

    # the source as of the end of the outage: day-3 state + the three
    # catch-up changes (row 2 flips a second time, to refunded)
    base = _purchases(spark, DAY1 + DAY2_CHANGES).withColumn(
        "channel", F.lit(None).cast("string")
    )
    drift = spark.createDataFrame(
        DAY3_CHANGES + CATCHUP,
        "id int, user_id int, status string, amount double,"
        " updated string, channel string",
    ).selectExpr(
        "id", "user_id", "status", "amount",
        "cast(updated as timestamp_ntz) AS updated", "channel",
    )
    # row 2 appears twice (paid at day 2, refunded at day 6): each
    # window's cursor filter picks the versions visible at fire time,
    # and merge keeps the latest — exactly the replay semantics
    source_full = base.unionByName(drift)

    job = IngestionJob(engine, state)
    spec = UploadSpec.from_config("Shop Land", SPEC)

    loaded_per_window = []
    for w in missed:
        cut = w.replace(tzinfo=None)
        visible = source_full.filter(F.col("updated") <= F.lit(cut))
        run = ledger.create("upload", "shop_land")
        ledger.start(run.run_id)
        res = job.run(
            spec, _ListSource(TableBatch("purchases", visible))
        )
        ledger.complete(run.run_id, rows_loaded=res.rows_loaded)
        loaded_per_window.append(res.rows_loaded)

    # each window loaded exactly its day's delta, in order
    assert loaded_per_window == [1, 1, 1]

    landed = spark.table("shop_land.purchases")
    assert landed.count() == 9  # ids 1-9, each exactly once
    assert landed.groupBy("id").count().filter("count > 1").count() == 0
    # row 2 carries its THIRD version (merge replayed in window order)
    assert landed.filter("id = 2").first().status == "refunded"
    # cursor advanced to the last catch-up row
    assert "2024-03-06 04:00:00" in str(state.get("shop_land", "purchases"))

    # the gate reopens: a fresh upload success is now in the ledger
    last = ledger.last_success("upload", "shop_land")
    ok = deps.check_gate(
        ledger, "transformation", "user_revenue",
        now=last.finished_at + dt.timedelta(hours=1),
    )
    assert ok.satisfied


# -- seam: restore-from-backup, then incremental catch-up -------------------

RESTORE_DAY3 = [
    (5, 11, "refunded", 40.0, "2024-03-03 07:30:00"),
    (6, 13, "open", 15.0, "2024-03-03 09:00:00"),
]


def test_restore_from_backup_then_incremental_catchup(
    spark, tmp_path_factory
):
    """Disaster-recovery seam: the CONFIG backup restores connections/
    uploads (secrets masked), the WAREHOUSE restores from a stale
    snapshot, and the cursor store is gone. Recovery procedure: re-
    seed the cursor from max(cursor) of the RESTORED table, then run
    a normal incremental ingest. The merge disposition absorbs the
    re-extracted overlap between the stale snapshot and the lost
    high-water mark, so the catch-up run converges to exactly the
    no-disaster state — nothing duplicated, nothing skipped."""
    from datanika_core_spark.orchestration.backup import (
        MASK,
        export_backup,
        import_backup,
    )

    tmp = tmp_path_factory.mktemp("restore_seam")
    engine = EngineSession(spark)
    engine.drop_database("restore_land")
    state = CursorStateStore(str(tmp / "cursors.json"))
    job = IngestionJob(engine, state)
    spec = UploadSpec.from_config("Restore Land", SPEC)

    def ingest(rows):
        return job.run(
            spec,
            _ListSource(TableBatch("purchases", _purchases(spark, rows))),
        )

    # normal life: two daily ingests
    ingest(DAY1)
    ingest(DAY1 + DAY2_CHANGES)
    assert spark.table("restore_land.purchases").count() == 5

    # config backup taken while healthy
    conns = [{"name": "src_pg", "type": "postgres",
              "direction": "source",
              "config": {"host": "h", "password": "hunter2"}}]
    uploads = [{"name": "Restore Land", "source_connection": "src_pg",
                "destination_connection": "wh", "dlt_config": SPEC}]
    payload = export_backup(conns, uploads)

    # disaster: warehouse AND cursor state are lost
    engine.drop_database("restore_land")
    state.clear("restore_land", "purchases")
    assert state.get("restore_land", "purchases") is None

    # restore configs (secrets come back masked — re-keyed by an
    # operator, not round-tripped) ...
    restored = import_backup(payload,
                             existing_connections=[{"name": "wh"}])
    assert restored["uploads"][0]["name"] == "Restore Land"
    assert restored["connections"][0]["config"]["password"] == MASK
    r_spec = UploadSpec.from_config(
        restored["uploads"][0]["name"],
        restored["uploads"][0]["dlt_config"],
    )
    assert r_spec.incremental is not None  # cursor config survived

    # ... and the warehouse from LAST NIGHT's snapshot: day-1 only
    engine.ensure_database("restore_land")
    _purchases(spark, DAY1).write.saveAsTable("restore_land.purchases")

    # cursor re-seed FROM THE RESTORED DATA — never from a stale
    # state file (which could be newer than the restored table and
    # would silently skip the gap)
    hwm = (
        spark.table("restore_land.purchases")
        .agg(F.max("updated").alias("m")).collect()[0].m
    )
    state.set("restore_land", "purchases", hwm.isoformat())

    # catch-up: the source now holds the full history incl. day 3
    res = job.run(
        spec,
        _ListSource(TableBatch(
            "purchases",
            _purchases(spark, DAY1 + DAY2_CHANGES + RESTORE_DAY3),
        )),
    )
    # re-extracts everything past the RESTORED watermark — the day-2
    # overlap plus day 3 — and the cursor-precedence dedup collapses
    # the two extracted versions of id 5 before the merge: 4 land
    assert res.rows_loaded == 4

    got = {
        (r.id, r.status)
        for r in spark.table("restore_land.purchases").collect()
    }
    assert got == {
        (1, "open"), (2, "paid"), (3, "paid"), (4, "open"),
        (5, "refunded"), (6, "open"),
    }
    # cursor advanced to the day-3 high-water mark: the NEXT run
    # extracts nothing
    res2 = ingest(DAY1 + DAY2_CHANGES + RESTORE_DAY3)
    assert res2.rows_loaded == 0
    engine.drop_database("restore_land")


# -- seam: crash AFTER the write lands, BEFORE the cursor commits -----------


def test_crash_between_write_and_cursor_commit(spark, tmp_path_factory):
    """The ingestion job persists the cursor only after every load
    succeeded; a crash in that window leaves the warehouse AHEAD of
    the cursor. The contract: the rerun re-extracts the already-
    loaded rows (stale cursor) and the merge absorbs them — the
    replay-idempotency window is safe in the duplicate direction,
    never the data-loss direction (the reverse order, cursor first,
    would skip rows on crash)."""
    from datanika_core_spark.operators.incremental import (
        apply_incremental,
    )
    from datanika_core_spark.operators.writers import TableWriter

    tmp = tmp_path_factory.mktemp("crash_seam")
    engine = EngineSession(spark)
    engine.drop_database("crash_land")
    state = CursorStateStore(str(tmp / "cursors.json"))
    job = IngestionJob(engine, state)
    spec = UploadSpec.from_config("Crash Land", SPEC)

    def src(rows):
        return _ListSource(
            TableBatch("purchases", _purchases(spark, rows))
        )

    job.run(spec, src(DAY1))
    hwm_day1 = state.get("crash_land", "purchases")
    assert hwm_day1 is not None

    # --- the crashing run: extraction + write succeed, then the
    # process dies before commit() — simulated by simply not calling
    # it (exactly the job's code path up to the commit loop)
    inc = apply_incremental(
        _purchases(spark, DAY1 + DAY2_CHANGES),
        spec.incremental, state, "crash_land", "purchases",
    )
    TableWriter(spark).write(
        inc.df, "crash_land.purchases", "merge",
        primary_key="id", precedence_col=inc.cursor_column,
    )
    # warehouse is ahead of the cursor: the crash window
    assert spark.table("crash_land.purchases").count() == 5
    assert state.get("crash_land", "purchases") == hwm_day1

    # --- the rerun: re-extracts day 2 (stale cursor), merge absorbs
    res = job.run(spec, src(DAY1 + DAY2_CHANGES))
    assert res.rows_loaded == 3  # the day-2 rows, replayed
    got = {
        (r.id, r.status)
        for r in spark.table("crash_land.purchases").collect()
    }
    assert got == {
        (1, "open"), (2, "paid"), (3, "paid"), (4, "open"), (5, "paid"),
    }
    # cursor finally advanced; the next run extracts nothing
    assert state.get("crash_land", "purchases") != hwm_day1
    assert job.run(spec, src(DAY1 + DAY2_CHANGES)).rows_loaded == 0
    engine.drop_database("crash_land")
