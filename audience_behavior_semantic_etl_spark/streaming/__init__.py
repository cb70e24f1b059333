from audience_behavior_semantic_etl_spark.cdc.stream import StreamRun, run_wal_stream
from audience_behavior_semantic_etl_spark.streaming.stateful import running_turn_counts
from audience_behavior_semantic_etl_spark.streaming.windowed import tumbling_window_counts

__all__ = ["StreamRun", "run_wal_stream", "running_turn_counts", "tumbling_window_counts"]
