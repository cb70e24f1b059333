from audience_behavior_semantic_etl_spark.sources.wal import read_wal, read_wal_stream

__all__ = ["read_wal", "read_wal_stream"]
