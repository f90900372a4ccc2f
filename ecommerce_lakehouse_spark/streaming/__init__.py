from ecommerce_lakehouse_spark.streaming.jobs import (  # noqa: F401
    deduped_stream,
    read_events_stream,
    running_user_profile,
    sessionized_stream,
    stream_merge_into,
    stream_rollup_refresh,
    stream_static_enrich,
    stream_stream_join,
    windowed_event_counts,
)
