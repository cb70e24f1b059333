"""CDC / incremental-ingest engine (BASELINE.json north_star).

WAL-style change events (insert/update/delete/schema_change envelopes
keyed by ``(conv_id, turn_idx)``) are applied to a snapshot-committed
transcripts table via Structured Streaming ``foreachBatch``:

    normalize (Arrow pandas-UDF payload canonicalizers)
      -> LWW dedup by (lsn desc, ts desc) via row_number window
      -> hot-key salted repartition
      -> MERGE into bucketed table (anti-join + rewrite touched buckets)
      -> atomic snapshot commit carrying the batch id + offset range

Exactly-once: the committed stream batch id and per-source-partition
LSN watermarks live inside the table snapshot, so a killed-and-resumed
job re-delivers a batch and the engine no-ops it; replaying the whole
log converges to the identical final table.

The table layer is an Iceberg-shaped fallback (parquet + JSON manifest
with atomic pointer swap) because no Iceberg runtime jar ships in this
environment; the public API (`Table.merge_batch`, snapshot properties,
ADD COLUMN) mirrors what an Iceberg-backed implementation would expose,
so swapping in `MERGE INTO` on a real cluster is a sink change, not an
engine change. This mirrors how the reference persists cubes as
Hive-partitioned parquet steps (reference ETLProcess.scala:111-128) —
minus its coalesce(1) single-file anti-pattern.
"""
