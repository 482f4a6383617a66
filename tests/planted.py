"""Shared helpers for planted-signal property tests: temp sf-dir
writers, synthetic frame builders, and the engine's md5 A/B arm
assignment replicated bit-for-bit (ONE copy, so a change to the
assignment salt or hash-prefix width can't silently diverge the
test files)."""

from __future__ import annotations

import datetime as dt
import hashlib


def _write(df, path, name):
    df.sparkSession.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/{name}.parquet")


def _day(d, hour=12):
    return dt.datetime(2024, 3, 1 + d, hour)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def _ab_variant(user_id: int) -> int:
    """The engine's md5 arm assignment, replicated bit-for-bit."""
    h = hashlib.md5(f"ab-{user_id}".encode()).hexdigest()
    return int(h[:15], 16) % 2
