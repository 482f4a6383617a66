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
