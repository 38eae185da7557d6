from pedsnetdcc_spark.functions.intervals import months_in_interval  # noqa: F401
