"""applyInPandasWithState custom operator: streaming exact dedup."""

from pyspark.sql import functions as F

from datanika_core_spark.session import read_table
from datanika_core_spark.streaming.jobs import (
    read_event_stream,
    run_available_now_to_memory,
)
from datanika_core_spark.streaming.stateful import streaming_dedup

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_streaming_dedup_one_row_per_user(spark):
    sdf = read_event_stream(spark, EVENTS)
    deduped = streaming_dedup(sdf, "user_id")
    run_available_now_to_memory(deduped, "t_dedup_users",
                                output_mode="append")
    out = spark.table("t_dedup_users")
    batch = read_table(spark, EVENTS)
    n_users = batch.select("user_id").distinct().count()
    assert out.count() == n_users
    assert out.select("user_id").distinct().count() == n_users
    # every emitted row is a real event row of that user
    joined = out.alias("o").join(
        batch.withColumn("ts", F.col("ts").cast("timestamp")).alias("b"),
        ["user_id", "event_id"],
    )
    assert joined.count() == n_users


def test_token_quota_stream_matches_batch_twin(spark):
    """transformWithStateInPandas quota operator == batch window
    cumsum twin, row for row, on an availableNow run."""
    from datanika_core_spark.streaming.stateful import (
        streaming_token_quota,
        tws_runtime_available,
    )
    from datanika_core_spark.workloads.corpus_quality import (
        _batch_token_quota,
    )

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    budget = 150  # low enough that sf0.001 sources overflow

    if tws_runtime_available():
        # transformWithState path additionally needs RocksDB state
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    sdf = read_event_stream(spark, docs_path).select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("bigint")
        .alias("tokens"),
    )
    out = streaming_token_quota(
        sdf,
        key="source",
        order_col="doc_id",
        token_col="tokens",
        budget=budget,
        output_schema=(
            "doc_id bigint, source string, tokens bigint,"
            " used_after bigint"
        ),
    )
    run_available_now_to_memory(out, "t_quota", output_mode="append")
    got = {
        (r.source, r.doc_id, r.tokens, r.used_after)
        for r in spark.table("t_quota").collect()
    }

    batch_docs = read_table(spark, docs_path).select(
        "doc_id", "source", F.lower(F.trim(F.col("text"))).alias("text")
    )
    want = {
        (r.source, r.doc_id, r.tokens, r.used_after)
        for r in _batch_token_quota(batch_docs, budget).collect()
    }
    assert want, "budget too low: twin kept nothing"
    total_docs = read_table(spark, docs_path).count()
    assert len(want) < total_docs, "budget too high: nothing dropped"
    assert got == want


def test_token_quota_processor_logic_without_runtime():
    """The transformWithState processor's per-key logic, driven with
    a fake handle — exercises the TWS code path even where the
    protobuf state runtime is unavailable (this container)."""
    import pandas as pd

    from datanika_core_spark.streaming.stateful import TokenQuotaProcessor

    class FakeValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, t):
            self.v = t

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

    p = TokenQuotaProcessor("doc_id", "tokens", budget=10)
    h = FakeHandle()
    p.init(h)
    # batch 1: rows arrive out of order; cumsum in doc_id order is
    # 4, 9, 15 -> first two kept
    b1 = pd.DataFrame(
        {"doc_id": [2, 1, 3], "tokens": [5, 4, 6], "source": ["s"] * 3}
    )
    out1 = pd.concat(list(p.handleInputRows(("s",), iter([b1]), None)))
    assert list(out1.doc_id) == [1, 2]
    assert list(out1.used_after) == [4, 9]
    assert h.state.get() == (15,)
    # batch 2: cursor already past budget -> nothing emitted, state
    # still advances
    b2 = pd.DataFrame({"doc_id": [4], "tokens": [1], "source": ["s"]})
    out2 = list(p.handleInputRows(("s",), iter([b2]), None))
    assert out2 == []
    assert h.state.get() == (16,)


def test_ttl_seen_dedup_first_occurrence_per_user(spark):
    """TTL-bounded first-occurrence filter: one row per user (its
    earliest event by (ts, event_id)); within the run every repeat
    is suppressed by the live TTL marker."""
    import pytest

    from datanika_core_spark.streaming.stateful import (
        streaming_seen_dedup,
        tws_runtime_available,
    )

    if not tws_runtime_available():
        pytest.skip("transformWithState runtime unavailable")
    sdf = read_event_stream(spark, EVENTS).withColumn(
        "ord",
        F.concat(
            F.date_format("ts", "yyyyMMddHHmmssSSS"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ),
    ).select("user_id", "event_id", "ord")
    out_schema = "user_id bigint, event_id bigint, ord string"
    deduped = streaming_seen_dedup(
        sdf, "user_id", "ord", out_schema, ttl_ms=3600 * 1000
    )
    run_available_now_to_memory(deduped, "t_ttl_dedup",
                                output_mode="append")
    out = spark.table("t_ttl_dedup")
    batch = read_table(spark, EVENTS)
    n_users = batch.select("user_id").distinct().count()
    assert out.count() == n_users
    # the emitted row is each user's EARLIEST event
    first = batch.withColumn(
        "rn",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    ).filter("rn = 1").select("user_id", "event_id")
    match = out.join(first, ["user_id", "event_id"]).count()
    assert match == n_users


def test_ttl_seen_dedup_processor_logic_without_runtime():
    """SeenRecentlyDedupProcessor's per-key logic with a fake handle:
    first batch emits exactly the earliest row and sets the TTL'd
    marker; while the marker lives, repeats emit nothing; after the
    store evicts it (simulated), the key passes again."""
    import pandas as pd

    from datanika_core_spark.streaming.stateful import (
        SeenRecentlyDedupProcessor,
    )

    class FakeValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, t):
            self.v = t

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()
            self.ttl_ms = None

        def getValueState(self, name, schema, ttlDurationMs=None):
            self.ttl_ms = ttlDurationMs
            return self.state

    p = SeenRecentlyDedupProcessor("ord", ttl_ms=1234)
    h = FakeHandle()
    p.init(h)
    assert h.ttl_ms == 1234            # TTL config reaches the store

    b1 = pd.DataFrame({"user_id": [7, 7], "ord": ["b", "a"]})
    out1 = pd.concat(list(p.handleInputRows((7,), iter([b1]), None)))
    assert list(out1.ord) == ["a"]     # earliest only
    assert h.state.exists()

    b2 = pd.DataFrame({"user_id": [7], "ord": ["c"]})
    assert list(p.handleInputRows((7,), iter([b2]), None)) == []

    h.state.v = None                   # simulate TTL eviction
    out3 = pd.concat(list(p.handleInputRows((7,), iter([b2]), None)))
    assert list(out3.ord) == ["c"]     # key admissible again
