from faisssearcher_spark.streaming.events import (
    read_events_stream, windowed_event_counts, streaming_dedup)
from faisssearcher_spark.streaming.incremental import minhash_screen_sink
from faisssearcher_spark.streaming.sinks import (
    idempotent_parquet_sink, read_sink)

__all__ = ["read_events_stream", "windowed_event_counts", "streaming_dedup",
           "idempotent_parquet_sink", "read_sink", "minhash_screen_sink"]
