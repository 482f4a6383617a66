"""Dependency DAG edges + execution gating (O4/O5).

Reference semantics:
- Edges (upstream_type, upstream_id) → (downstream_type,
  downstream_id) over upload/transformation/pipeline, with an
  optional freshness timeframe (N minutes|hours)
  (/root/reference/datanika/models/dependency.py:9-28).
- Validation: no self-reference, no duplicate edge, timeframe unit ∈
  {minutes, hours} with value > 0
  (datanika/services/dependency_service.py:46-106).
- Gating: an edge WITH a timeframe requires a SUCCESS run of the
  upstream finished within the window; edges without a timeframe are
  metadata-only (datanika/services/dependency_check.py:23-82). The
  reference retries 60 s × 5 via Celery; our engine surfaces
  check results and lets the caller retry — and can additionally
  topo-sort (the reference cannot, README.md:58 notwithstanding).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.orchestration.runs import RunLedger

TARGET_TYPES = ("upload", "transformation", "pipeline")
TIMEFRAME_UNITS = {"minutes": 60, "hours": 3600}


@dataclass(frozen=True)
class Edge:
    upstream_type: str
    upstream_id: str
    downstream_type: str
    downstream_id: str
    timeframe_value: int | None = None
    timeframe_unit: str | None = None

    def __post_init__(self):
        for t in (self.upstream_type, self.downstream_type):
            if t not in TARGET_TYPES:
                raise ValidationError(f"target type must be one of {TARGET_TYPES}")
        if (self.upstream_type, self.upstream_id) == (
            self.downstream_type, self.downstream_id
        ):
            raise ValidationError("self-referencing dependency")
        if (self.timeframe_value is None) != (self.timeframe_unit is None):
            raise ValidationError("timeframe value and unit go together")
        if self.timeframe_unit is not None:
            if self.timeframe_unit not in TIMEFRAME_UNITS:
                raise ValidationError(
                    f"timeframe unit must be one of {sorted(TIMEFRAME_UNITS)}"
                )
            if self.timeframe_value is None or self.timeframe_value <= 0:
                raise ValidationError("timeframe value must be > 0")

    @property
    def window_seconds(self) -> int | None:
        if self.timeframe_unit is None:
            return None
        return self.timeframe_value * TIMEFRAME_UNITS[self.timeframe_unit]


@dataclass
class GateResult:
    satisfied: bool
    blocking: list[Edge]


class DependencyGraph:
    def __init__(self) -> None:
        self._edges: list[Edge] = []

    def add(self, edge: Edge) -> Edge:
        if edge in self._edges:
            raise ValidationError("duplicate dependency edge")
        self._edges.append(edge)
        return edge

    def remove(self, edge: Edge) -> None:
        if edge in self._edges:
            self._edges.remove(edge)

    def edges(self) -> list[Edge]:
        return list(self._edges)

    def upstream_of(self, target_type: str, target_id: str) -> list[Edge]:
        return [
            e for e in self._edges
            if (e.downstream_type, e.downstream_id)
            == (target_type, str(target_id))
        ]

    def check_gate(
        self,
        ledger: RunLedger,
        target_type: str,
        target_id: str,
        now: dt.datetime | None = None,
    ) -> GateResult:
        """Reference gate: every upstream edge WITH a timeframe needs
        a SUCCESS upstream run finished within the window."""
        now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        blocking: list[Edge] = []
        for e in self.upstream_of(target_type, target_id):
            win = e.window_seconds
            if win is None:
                continue  # metadata-only edge
            last = ledger.last_success(e.upstream_type, e.upstream_id)
            if last is None or (
                (now - last.finished_at).total_seconds() > win
            ):
                blocking.append(e)
        return GateResult(not blocking, blocking)

    def gate_with_retry(
        self,
        ledger: RunLedger,
        target_type: str,
        target_id: str,
        retries: int = 5,
        delay_seconds: int = 60,
        sleep=None,
        clock=None,
    ) -> GateResult:
        """The reference's Celery-side polling behavior
        (dependency_helpers.py:14-15: countdown=60, max_retries=5):
        re-check the gate up to ``retries`` times, sleeping
        ``delay_seconds`` between attempts, until satisfied.

        ``sleep``/``clock`` are injectable so tests (and cooperative
        schedulers) can drive virtual time; by default wall-clock
        time.sleep. Returns the LAST GateResult — satisfied or still
        blocked after the retry budget."""
        import time as _time

        sleep = sleep or _time.sleep
        res = self.check_gate(ledger, target_type, target_id,
                              clock() if clock else None)
        for _ in range(retries):
            if res.satisfied:
                return res
            sleep(delay_seconds)
            res = self.check_gate(ledger, target_type, target_id,
                                  clock() if clock else None)
        return res
