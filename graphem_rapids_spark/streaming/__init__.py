from graphem_rapids_spark.streaming.anomaly import anomaly_stream  # noqa: F401
from graphem_rapids_spark.streaming.events import (  # noqa: F401
    hourly_counts_stream,
    sessionize_stream,
    stream_events,
)
