"""cassandra_data_migrator_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine (NOT a port) with the capabilities of DataStax
cassandra-data-migrator (reference at /root/reference): partition-range
copy, validation diff, auto-correction — re-expressed as a Structured
Streaming change-event pipeline that MERGEs into a bucket-partitioned
parquet lake table with exactly-once epoch-fenced commits, per-partition
lineage + checksums, schema evolution, and skew-aware repartitioning.

Layout
------
- ``lake``       : snapshot-manifest lake table (mini-Iceberg: atomic commits,
                   bucket pruning, copy-on-write MERGE, schema evolution)
- ``operators``  : diff/validate/autocorrect, dedup family, filters,
                   transforms, partitioning, checksums, similarity, textstats
- ``sources``    : deterministic synthetic web-page/change-event generators,
                   event-log batch + streaming readers
- ``functions``  : hashing/bucketing expressions, vectorized pandas UDFs
                   (HTML→text extraction, lang normalization)
- ``streaming``  : foreachBatch CDC pipeline, checkpoint resume, lineage
- ``plans``      : plan inspection helpers (pushdown / codegen assertions)
"""

__version__ = "0.1.0"
