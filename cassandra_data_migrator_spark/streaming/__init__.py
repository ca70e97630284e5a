from cassandra_data_migrator_spark.streaming.changelog import (  # noqa: F401
    ChangelogConsumer,
    changes_to_events,
    ensure_replica,
    replicate,
)
from cassandra_data_migrator_spark.streaming.dedupstream import (  # noqa: F401
    apply_dedup_epoch,
    run_online_dedup_stream,
)
from cassandra_data_migrator_spark.streaming.pipeline import (  # noqa: F401
    CdcPipeline,
)
from cassandra_data_migrator_spark.streaming.runinfo import (  # noqa: F401
    finalize_stream_run,
    finalize_tracked_run,
    run_info,
)
from cassandra_data_migrator_spark.streaming.trackrun import (  # noqa: F401
    BatchRunTracker,
)
