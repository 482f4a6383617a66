"""Incremental cursor reads + persistent cursor state (S3).

Reference semantics (dlt incremental — dlt_runner.py:173-180,
upload_service rules): only rows whose ``cursor_path`` column is
strictly beyond the last-seen value are extracted; the max cursor is
persisted between runs (dlt keeps it in ``_dlt_pipeline_state``);
``initial_value`` seeds the first run; ``row_order`` asc/desc sorts
the batch.

Spark mapping: the cursor becomes a pushdown filter on the scan —
``col(cursor) > last_max`` reaches the JDBC WHERE clause / parquet
row-group stats, so an incremental run over a 100 TB table reads
only the new partitions/row-groups instead of extracting everything
and filtering in Python. State is written ONLY after a successful
load (exactly-once-ish across failed runs, like dlt — SURVEY.md §7
hard-point 4).

State store: a single JSON file per warehouse keyed by
(pipeline, table). Deliberately not a Spark table: cursor state is a
few bytes of driver-side metadata with read-modify-write semantics,
and a parquet round-trip per run would add latency with no scale
benefit. On a cluster this file lives on shared storage (DBFS/S3);
swap for a Delta table if multi-writer runs are needed.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datanika_core_spark.specs import IncrementalSpec


class CursorStateStore:
    """Persist per-(pipeline, table) max-cursor values between runs."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict[str, Any]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as fh:
            return json.load(fh)

    def _save(self, state: dict[str, Any]) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        # Atomic replace so a crashed run can't corrupt state.
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as fh:
            json.dump(state, fh, default=str)
        os.replace(tmp, self.path)

    @staticmethod
    def _key(pipeline: str, table: str) -> str:
        return f"{pipeline}::{table}"

    def get(self, pipeline: str, table: str) -> Any:
        return self._load().get(self._key(pipeline, table))

    def set(self, pipeline: str, table: str, value: Any) -> None:
        state = self._load()
        state[self._key(pipeline, table)] = value
        self._save(state)

    def clear(self, pipeline: str, table: str) -> None:
        state = self._load()
        state.pop(self._key(pipeline, table), None)
        self._save(state)


@dataclass
class IncrementalResult:
    df: DataFrame
    cursor_column: str
    #: call after a successful load to persist the new high-water mark
    commit: Any  # Callable[[], None]


def apply_incremental(
    df: DataFrame,
    spec: IncrementalSpec,
    store: CursorStateStore,
    pipeline: str,
    table: str,
) -> IncrementalResult:
    """Filter to rows beyond the stored cursor (or initial_value),
    ordered per row_order; returns a commit() that persists the new
    max cursor — call it only after the load succeeds."""
    cursor = spec.cursor_path
    last = store.get(pipeline, table)
    if last is None:
        last = spec.initial_value

    out = df
    if last is not None:
        out = out.filter(F.col(cursor) > F.lit(last))
    if spec.row_order == "asc":
        out = out.orderBy(F.col(cursor).asc())
    elif spec.row_order == "desc":
        out = out.orderBy(F.col(cursor).desc())

    # The high-water mark is observed DURING the load action, from the
    # rows actually extracted — not by re-executing the source plan
    # afterwards. Re-evaluation was both a second full source scan and
    # a correctness hole: against a live source (JDBC/REST), rows
    # arriving between load and commit would bump the persisted cursor
    # without ever being loaded, and the next run would skip them
    # (dlt derives the cursor from extracted rows; dlt_runner.py:173-180).
    from pyspark.sql import Observation

    obs = Observation()
    out = out.observe(obs, F.max(F.col(cursor)).alias("m"))

    def commit() -> None:
        # The observation completes with the caller's load action, so
        # after a normal load obs.get returns instantly. If commit()
        # is called WITHOUT a load having run, obs.get would block
        # forever — probe the JVM Observation non-blockingly
        # (getRowOrEmpty never waits) and, when still empty, run the
        # extraction into a noop sink: that IS the load in that usage.
        # No waiter thread and no fixed timeout means a failure in the
        # fallback write propagates to the caller instead of wedging a
        # blocked obs.get thread, and a slow caller-side load can't
        # race a timeout into a redundant second extraction.
        try:
            filled = not obs._jo.getRowOrEmpty().isEmpty()
        except Exception:  # probe unavailable (e.g. Spark Connect)
            filled = False
        if not filled:
            out.write.format("noop").mode("overwrite").save()
        row = obs.get
        value = row["m"]
        if value is not None:
            # JSON-serializable representation; timestamps → ISO str
            # (string compare on re-filter works because the column is
            # re-cast by Spark's comparison coercion).
            store.set(pipeline, table, value)

    return IncrementalResult(out, cursor, commit)
