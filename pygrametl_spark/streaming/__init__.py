from pygrametl_spark.streaming.events import (  # noqa: F401
    stream_windowed_event_counts,
    windowed_event_counts_batch,
)
