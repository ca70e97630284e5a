from cassandra_data_migrator_spark.functions.hashing import (  # noqa: F401
    bucket_expr,
    row_checksum_expr,
    salted_partition_exprs,
)
