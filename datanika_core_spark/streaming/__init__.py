from datanika_core_spark.streaming.jobs import (  # noqa: F401
    hopping_totals,
    read_event_stream,
    run_available_now_to_memory,
    session_aggregates,
    stream_ingest,
    tumbling_counts,
)
