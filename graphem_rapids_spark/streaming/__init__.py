from graphem_rapids_spark.streaming.events import (  # noqa: F401
    hourly_counts_stream,
    sessionize_stream,
    stream_events,
)
