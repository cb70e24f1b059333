"""audience_behavior_semantic_etl_spark — a brand-new PySpark-native
analytics + CDC/incremental-ingest engine with the capabilities of the
reference repo cubefyre/audience-behavior-semantic-etl (SparklineData
"SemanticETL"), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing and
                   cluster-scale defaults (AQE, Arrow, UTC).
- ``operators``  : the reference's operator inventory (SURVEY.md §2) as
                   composable ``DataFrame -> DataFrame`` functions —
                   projection/rename/case, filter, join (equi + theta),
                   aggregate, dedup (deterministic LWW), window metrics,
                   sessionize (window algebra), flatten/explode — plus the
                   training-data-pipeline ops (dedup family, similarity
                   search, text analysis, multimodal plumbing).
- ``functions``  : scalar function surface (datetime, math, URL, user-agent
                   and IP enrichment analogs) with a single
                   ``register(spark)`` entry point, mirroring the
                   reference's ``functions.register`` (reference:
                   etl/src/main/scala/org/sparkline/etl/functions/package.scala:30-35).
- ``plans``      : ETLStep/ETLProcess analog — a small declarative DAG of
                   named steps with persist/caching semantics (reference:
                   etl/src/main/scala/org/sparkline/etl/ETLProcess.scala).
- ``sources``    : schema'd readers (JSON/parquet/WAL file stream).
- ``cdc``        : the CDC / incremental-ingest engine (BASELINE.json
                   north_star): WAL change events -> normalize -> salt ->
                   LWW dedup -> MERGE into a snapshot-committed transcripts
                   table with exactly-once offset tracking.
- ``streaming``  : Structured Streaming drivers (foreachBatch apply,
                   session windows).

Everything here is public-API PySpark: DataFrame/SQL/Catalyst, Arrow
pandas UDFs for the few genuinely non-relational kernels. No RDDs, no
per-row Python in hot paths.
"""

__version__ = "0.1.0"
