from cassandra_data_migrator_spark.streaming.pipeline import (  # noqa: F401
    CdcPipeline,
)
