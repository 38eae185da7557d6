from pedsnetdcc_spark.plans.pipeline import Job, run_parallel, run_serial  # noqa: F401
