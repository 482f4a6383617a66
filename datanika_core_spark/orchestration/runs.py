"""Run ledger — execution records with the reference's state machine
(O1: /root/reference/datanika/services/execution_service.py:13-111,
datanika/models/run.py:11-36).

States: PENDING → RUNNING → SUCCESS | FAILED; CANCELLED allowed only
from PENDING/RUNNING. Each run records target (type, id), timestamps,
logs, rows_loaded and error.

Storage: in-memory registry + an optional Spark-table journal
(`meta.runs`, append-only — each state transition appends a row; the
"current" state of a run is the latest row by updated_at). Append-only
is the scale-correct choice: no read-modify-write on the ledger, and
run history is a first-class queryable table.
"""

from __future__ import annotations

import datetime as dt
import itertools
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame, SparkSession

from datanika_core_spark.errors import ValidationError


class RunStatus(str, Enum):
    PENDING = "pending"
    RUNNING = "running"
    SUCCESS = "success"
    FAILED = "failed"
    CANCELLED = "cancelled"


_TERMINAL = {RunStatus.SUCCESS, RunStatus.FAILED, RunStatus.CANCELLED}

_LEDGER_SCHEMA = (
    "run_id bigint, target_type string, target_id string, status string, "
    "created_at timestamp_ntz, started_at timestamp_ntz, "
    "finished_at timestamp_ntz, rows_loaded bigint, error string, "
    "logs string, updated_at timestamp_ntz"
)


def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


@dataclass
class Run:
    run_id: int
    target_type: str  # upload | transformation | pipeline
    target_id: str
    status: RunStatus = RunStatus.PENDING
    created_at: dt.datetime = field(default_factory=_now)
    started_at: dt.datetime | None = None
    finished_at: dt.datetime | None = None
    rows_loaded: int | None = None
    error: str | None = None
    logs: str = ""


class RunLedger:
    """Create/start/complete/fail/cancel with reference transition
    rules; optionally journaled to a Spark table."""

    def __init__(self, spark: SparkSession | None = None,
                 table: str | None = None):
        self.spark = spark
        self.table = table
        self._runs: dict[int, Run] = {}
        self._ids = itertools.count(1)
        if spark and table:
            db = table.split(".")[0] if "." in table else None
            if db:
                spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")

    # -- transitions (execution_service.py:13-111) ----------------------

    def create(self, target_type: str, target_id: str) -> Run:
        run = Run(next(self._ids), target_type, str(target_id))
        self._runs[run.run_id] = run
        self._journal(run)
        return run

    def active_runs(self, target_type: str,
                    target_id: str) -> list[Run]:
        """Runs currently PENDING or RUNNING for a target."""
        return [
            r for r in self.runs_for(target_type, target_id)
            if r.status in (RunStatus.PENDING, RunStatus.RUNNING)
        ]

    def create_exclusive(self, target_type: str,
                         target_id: str) -> tuple[Run, bool]:
        """Create a run ONLY IF no run is already active (PENDING/
        RUNNING) for the same target — the dispatch-time guard that
        keeps two colliding schedules from racing one target table
        with concurrent writes. The loser is still journaled (full
        audit trail) but lands directly in CANCELLED with the skip
        reason in ``error``; it never transitions to RUNNING, so it
        can never reach a writer. Returns ``(run, acquired)``.

        The in-memory dict is the serialization point here; a
        multi-scheduler deployment puts the same check inside one
        transactional INSERT ... WHERE NOT EXISTS against the
        journal table (append-only, so the guard is a single
        conditional append — no read-modify-write)."""
        existing = self.active_runs(target_type, target_id)
        run = Run(next(self._ids), target_type, str(target_id))
        self._runs[run.run_id] = run
        if existing:
            run.status = RunStatus.CANCELLED
            run.finished_at = _now()
            run.error = (
                f"skipped: run {existing[0].run_id} already active"
                f" for {target_type}:{target_id}"
            )
            self._journal(run)
            return run, False
        self._journal(run)
        return run, True

    def start(self, run_id: int) -> Run:
        run = self._get(run_id)
        if run.status != RunStatus.PENDING:
            raise ValidationError(
                f"run {run_id}: cannot start from {run.status.value}"
            )
        run.status = RunStatus.RUNNING
        run.started_at = _now()
        self._journal(run)
        return run

    def complete(self, run_id: int, rows_loaded: int | None = None,
                 logs: str = "") -> Run:
        run = self._get(run_id)
        if run.status != RunStatus.RUNNING:
            raise ValidationError(
                f"run {run_id}: cannot complete from {run.status.value}"
            )
        run.status = RunStatus.SUCCESS
        run.finished_at = _now()
        run.rows_loaded = rows_loaded
        run.logs = logs
        self._journal(run)
        return run

    def fail(self, run_id: int, error: str, logs: str = "") -> Run:
        run = self._get(run_id)
        if run.status not in (RunStatus.PENDING, RunStatus.RUNNING):
            raise ValidationError(
                f"run {run_id}: cannot fail from {run.status.value}"
            )
        run.status = RunStatus.FAILED
        run.finished_at = _now()
        run.error = error
        run.logs = logs
        self._journal(run)
        return run

    def cancel(self, run_id: int) -> Run:
        run = self._get(run_id)
        # reference: cancellable only from PENDING/RUNNING
        if run.status in _TERMINAL:
            raise ValidationError(
                f"run {run_id}: cannot cancel from {run.status.value}"
            )
        run.status = RunStatus.CANCELLED
        run.finished_at = _now()
        self._journal(run)
        return run

    # -- queries ---------------------------------------------------------

    def get(self, run_id: int) -> Run:
        return self._get(run_id)

    def runs_for(self, target_type: str, target_id: str) -> list[Run]:
        return [
            r for r in self._runs.values()
            if r.target_type == target_type and r.target_id == str(target_id)
        ]

    def last_success(self, target_type: str,
                     target_id: str) -> Run | None:
        done = [
            r for r in self.runs_for(target_type, target_id)
            if r.status == RunStatus.SUCCESS and r.finished_at
        ]
        return max(done, key=lambda r: r.finished_at) if done else None

    def history(self) -> DataFrame:
        """The journal table (append-only; latest row per run_id is
        current state)."""
        if not (self.spark and self.table):
            raise ValidationError("ledger has no journal table")
        return self.spark.table(self.table)

    # -- internals --------------------------------------------------------

    def _get(self, run_id: int) -> Run:
        if run_id not in self._runs:
            raise ValidationError(f"unknown run {run_id}")
        return self._runs[run_id]

    def _journal(self, run: Run) -> None:
        if not (self.spark and self.table):
            return
        row = [(
            run.run_id, run.target_type, run.target_id, run.status.value,
            run.created_at, run.started_at, run.finished_at,
            run.rows_loaded, run.error, run.logs, _now(),
        )]
        (self.spark.createDataFrame(row, _LEDGER_SCHEMA)
         .write.format("parquet").mode("append").saveAsTable(self.table))
