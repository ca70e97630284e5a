"""``python -m cassandra_data_migrator_spark`` / spark-submit entry —
see :mod:`cassandra_data_migrator_spark.jobs`."""

import sys

from cassandra_data_migrator_spark.jobs import main

if __name__ == "__main__":
    sys.exit(main())
