from cassandra_data_migrator_spark.operators.diff import (  # noqa: F401
    autocorrect,
    diff_counters,
    diff_tables,
    per_bucket_diff,
)
