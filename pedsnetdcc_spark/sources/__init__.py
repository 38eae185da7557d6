from pedsnetdcc_spark.sources.io import (  # noqa: F401
    TableStore,
    read_table,
    read_tables,
)
