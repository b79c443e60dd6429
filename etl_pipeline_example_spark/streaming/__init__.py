from etl_pipeline_example_spark.streaming.events import (
    STREAM_QUERIES,
    STREAM_ORACLES,
    stream_events_tumbling,
)

__all__ = ["STREAM_QUERIES", "STREAM_ORACLES", "stream_events_tumbling"]
