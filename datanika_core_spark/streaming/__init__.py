from datanika_core_spark.streaming.jobs import (  # noqa: F401
    dedup_within_watermark,
    hopping_totals,
    interval_join_left_outer,
    read_event_stream,
    run_available_now_to_memory,
    session_aggregates,
    stream_ingest,
    tumbling_counts,
)
