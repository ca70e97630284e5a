from cassandra_data_migrator_spark.sources.synthetic import (  # noqa: F401
    gen_change_events,
    gen_web_pages,
)
from cassandra_data_migrator_spark.sources.event_log import (  # noqa: F401
    read_event_log,
    read_event_stream,
    write_event_log,
)
from cassandra_data_migrator_spark.sources.debezium import (  # noqa: F401
    events_to_envelopes,
    read_debezium_log,
    read_debezium_stream,
)
