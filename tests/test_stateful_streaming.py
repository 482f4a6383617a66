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
