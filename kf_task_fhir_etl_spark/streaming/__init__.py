from kf_task_fhir_etl_spark.streaming.events import (
    read_events_stream,
    sessionized_counts,
    windowed_event_counts,
)

__all__ = ["read_events_stream", "windowed_event_counts", "sessionized_counts"]
