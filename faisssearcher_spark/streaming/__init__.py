from faisssearcher_spark.streaming.events import (
    read_events_stream, windowed_event_counts, streaming_dedup)

__all__ = ["read_events_stream", "windowed_event_counts", "streaming_dedup"]
