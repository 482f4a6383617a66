"""Custom stateful streaming operators via ``applyInPandasWithState``
(the escape hatch for operators Structured Streaming lacks natively).

``streaming_dedup`` — continuous exact deduplication: emit only the
FIRST row seen per key across the whole stream. This is the streaming
form of the batch hash-dedup (workloads/text_dedup.py::
dedup_exact_pairs): per-key "seen" state lives in the state store,
bounded by an optional processing-time timeout (for corpora where keys
stop recurring after a retention horizon).

Why applyInPandasWithState and not ``dropDuplicates``: the built-in
needs the dedup columns to include the watermark column to bound
state; a custom operator can keep arbitrary first-seen payloads,
custom timeouts, and custom tie-breaking — the pattern generalizes to
any keyed training-data state (running quality stats, per-source
quotas, online fingerprint registries).

Scale: state is hash-partitioned by key across executors (the shuffle
is the groupBy); each micro-batch touches only its keys' state. Arrow
batches move rows to Python — the per-key pandas work is O(batch).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def streaming_dedup(
    sdf: DataFrame,
    key: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Emit the first row per ``key`` value ever seen on the stream;
    drop every later occurrence. ``timeout`` ∈ {"NoTimeout",
    "ProcessingTimeTimeout"} — with a timeout, idle keys are evicted
    and may re-emit after expiry (retention-bounded dedup)."""
    out_schema: StructType = sdf.schema
    state_schema = StructType.fromDDL("seen boolean")
    timeout_conf = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
    }[timeout]

    def _dedup(
        key_tuple: Any,
        batches: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # key already emitted in an earlier batch: consume & drop
            for _ in batches:
                pass
            return
        first = None
        for pdf in batches:
            if len(pdf) and first is None:
                first = pdf.iloc[:1]
        state.update((True,))
        if timeout == "ProcessingTimeTimeout":
            state.setTimeoutDuration(24 * 3600 * 1000)
        if first is not None:
            yield first

    return (
        sdf.groupBy(key)
        .applyInPandasWithState(
            _dedup, out_schema, state_schema, "append", timeout_conf
        )
    )
