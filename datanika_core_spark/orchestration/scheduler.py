"""Cron schedules (O3) — 5-field cron + timezone per target.

Reference: APScheduler CronTrigger jobs with coalesce=True,
max_instances=1, misfire_grace_time=300 s
(/root/reference/datanika/services/scheduler_integration.py:18-141);
5-field validation in schedule_service.py:132-140.

croniter/APScheduler aren't available here, so this ships a minimal,
dependency-free 5-field cron evaluator (minute hour day-of-month
month day-of-week) supporting ``*``, ``*/n``, ``a-b``, ``a-b/n`` and
comma lists — the grammar the reference's UI accepts. Day-of-month /
day-of-week compose with OR when both are restricted (vixie-cron
semantics).

The driver loop (`SchedulerLoop.due`) is deliberately poll-based:
call it from any ticker (a while-loop, Airflow, cron itself); it
dispatches each due schedule at most once per matching minute
(max_instances=1 + coalesce behavior).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from zoneinfo import ZoneInfo

from datanika_core_spark.errors import ValidationError

_FIELD_RANGES = ((0, 59), (0, 23), (1, 31), (1, 12), (0, 6))
_FIELD_NAMES = ("minute", "hour", "day", "month", "day_of_week")


def _parse_field(spec: str, lo: int, hi: int, name: str) -> frozenset[int]:
    out: set[int] = set()
    for part in spec.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            if not step_s.isdigit() or int(step_s) == 0:
                raise ValidationError(f"cron {name}: bad step {step_s!r}")
            step = int(step_s)
        if part == "*":
            rng = range(lo, hi + 1, step)
        elif "-" in part:
            a, b = part.split("-", 1)
            if not (a.isdigit() and b.isdigit()):
                raise ValidationError(f"cron {name}: bad range {part!r}")
            a_i, b_i = int(a), int(b)
            if not (lo <= a_i <= b_i <= hi):
                raise ValidationError(f"cron {name}: range {part!r} out of bounds")
            rng = range(a_i, b_i + 1, step)
        else:
            if not part.isdigit():
                raise ValidationError(f"cron {name}: bad value {part!r}")
            v = int(part)
            # vixie-cron: dow 7 == 0 (Sunday)
            if name == "day_of_week" and v == 7:
                v = 0
            if not (lo <= v <= hi):
                raise ValidationError(f"cron {name}: {v} out of [{lo},{hi}]")
            rng = range(v, v + 1)
        out.update(rng)
    if not out:
        raise ValidationError(f"cron {name}: empty set")
    return frozenset(out)


@dataclass(frozen=True)
class CronExpr:
    """Parsed 5-field cron expression."""

    minute: frozenset[int]
    hour: frozenset[int]
    day: frozenset[int]
    month: frozenset[int]
    day_of_week: frozenset[int]
    raw: str = ""
    dom_restricted: bool = False
    dow_restricted: bool = False

    @classmethod
    def parse(cls, expr: str) -> "CronExpr":
        parts = expr.split()
        if len(parts) != 5:
            raise ValidationError(
                f"cron must have 5 fields, got {len(parts)}: {expr!r}"
            )
        sets = [
            _parse_field(p, lo, hi, n)
            for p, (lo, hi), n in zip(parts, _FIELD_RANGES, _FIELD_NAMES)
        ]
        return cls(
            *sets, raw=expr,
            dom_restricted=parts[2] != "*",
            dow_restricted=parts[4] != "*",
        )

    def matches(self, t: dt.datetime) -> bool:
        if t.minute not in self.minute or t.hour not in self.hour:
            return False
        if t.month not in self.month:
            return False
        dom_ok = t.day in self.day
        dow_ok = t.weekday() in self._py_dow()
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok  # vixie OR semantics
        return dom_ok and dow_ok

    def _py_dow(self) -> frozenset[int]:
        # cron: 0=Sunday..6=Saturday; python weekday(): 0=Monday..6=Sunday
        return frozenset((d - 1) % 7 for d in self.day_of_week)

    def next_fire(self, after: dt.datetime) -> dt.datetime:
        """Next matching minute strictly after ``after`` (minute
        resolution, like CronTrigger)."""
        t = (after + dt.timedelta(minutes=1)).replace(second=0, microsecond=0)
        for _ in range(366 * 24 * 60):  # bounded scan: ≤ 1 year
            if self.matches(t):
                return t
            t += dt.timedelta(minutes=1)
        raise ValidationError(f"cron {self.raw!r} never fires")


@dataclass
class Schedule:
    target_type: str
    target_id: str
    cron: CronExpr
    timezone: str = "UTC"
    is_active: bool = True
    last_fired: dt.datetime | None = field(default=None, compare=False)

    @classmethod
    def create(cls, target_type: str, target_id: str, cron_expr: str,
               timezone: str = "UTC", is_active: bool = True) -> "Schedule":
        try:
            ZoneInfo(timezone)
        except Exception as e:
            raise ValidationError(f"unknown timezone {timezone!r}") from e
        return cls(target_type, str(target_id), CronExpr.parse(cron_expr),
                   timezone, is_active)


class SchedulerLoop:
    """Poll-based dispatcher: ``due(now_utc)`` returns schedules whose
    cron matches the current minute in their own timezone and that
    haven't fired this minute yet (coalesce + max_instances=1).
    Misfire grace (300 s in the reference) is the poller's interval
    responsibility — poll at least once a minute."""

    def __init__(self) -> None:
        self.schedules: list[Schedule] = []

    def add(self, schedule: Schedule) -> Schedule:
        self.schedules.append(schedule)
        return schedule

    def due(self, now_utc: dt.datetime | None = None) -> list[Schedule]:
        now_utc = now_utc or dt.datetime.now(dt.timezone.utc)
        if now_utc.tzinfo is None:
            now_utc = now_utc.replace(tzinfo=dt.timezone.utc)
        fired: list[Schedule] = []
        for s in self.schedules:
            if not s.is_active:
                continue
            local = now_utc.astimezone(ZoneInfo(s.timezone)).replace(
                second=0, microsecond=0
            )
            naive = local.replace(tzinfo=None)
            if not s.cron.matches(naive):
                continue
            if s.last_fired == naive:
                continue  # already dispatched this minute
            s.last_fired = naive
            fired.append(s)
        return fired


def backfill_windows(
    cron_expr: str,
    start: dt.datetime,
    end: dt.datetime,
    timezone: str = "UTC",
    max_windows: int = 10_000,
) -> list[dt.datetime]:
    """Catchup planning (Airflow-style backfill): every fire time of
    ``cron_expr`` in ``(start, end]``, as UTC datetimes — the run
    list an operator replays after downtime, or enumerates when a
    schedule is created with a historical start date.

    The reference's scheduler (APScheduler with coalesce=True,
    scheduler_integration.py:24-28) COALESCES missed fires into one;
    backfill is the complementary mode for pipelines whose runs are
    window-parameterized (incremental models, partition loads) and
    therefore must execute once per missed window, in order.

    ``max_windows`` bounds runaway ranges (a '* * * * *' cron over a
    year is half a million windows — almost certainly a config
    error, not an intent)."""
    tz = ZoneInfo(timezone)
    cron = CronExpr.parse(cron_expr)

    def to_utc(t: dt.datetime) -> dt.datetime:
        return t.replace(tzinfo=tz).astimezone(dt.timezone.utc)

    def to_local(t: dt.datetime) -> dt.datetime:
        if t.tzinfo is None:
            t = t.replace(tzinfo=dt.timezone.utc)
        return t.astimezone(tz).replace(tzinfo=None)

    out: list[dt.datetime] = []
    t = to_local(start)
    end_local = to_local(end)
    while True:
        t = cron.next_fire(t)
        if t > end_local:
            break
        out.append(to_utc(t))
        if len(out) > max_windows:
            raise ValidationError(
                f"backfill of {cron_expr!r} over"
                f" {start.isoformat()}..{end.isoformat()} exceeds"
                f" {max_windows} windows — narrow the range"
            )
    return out
