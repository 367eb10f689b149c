"""metrocloud_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference IoT sensor pipeline
(SamuliLam/metrocloud-data-pipeline: RuuviTag/BLE -> MQTT -> Kafka ->
TimescaleDB) as an idiomatic Spark DataFrame/SQL/Structured-Streaming
library, extended with the operators a large-scale (100 TB) training-data
pipeline needs: deduplication, similarity search, text analysis, and
multimodal-column plumbing.

Layout
------
- ``session``    : tuned SparkSession builders (local test + cluster-shaped confs)
- ``sources``    : parquet star-schema loaders, raw-fixture generators
- ``operators``  : ingest/normalize chain, analytics builders, window
                   analytics, maintenance (archive/retention/compaction)
- ``functions``  : reusable column-expression helpers (time bucketing,
                   safe casts, validation predicates)
- ``streaming``  : Structured Streaming wiring (micro-batch sink,
                   alerting, continuous aggregates)
- ``llm``        : dedup / similarity / text-analysis / multimodal ops
- ``queries``    : the named query registry exposed through
                   ``__spark_entry__.py`` (Spark builder + DuckDB oracle)
"""

__version__ = "0.1.0"
