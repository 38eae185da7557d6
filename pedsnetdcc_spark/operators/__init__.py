from pedsnetdcc_spark.operators.transforms import (  # noqa: F401
    with_literal_column,
    with_dimension_names,
    with_interval_months,
    recompute_column,
)
from pedsnetdcc_spark.operators.eras import derive_eras  # noqa: F401
from pedsnetdcc_spark.operators.interval_summary import interval_summary  # noqa: F401
from pedsnetdcc_spark.operators.integrity import referential_integrity_counts  # noqa: F401
from pedsnetdcc_spark.operators.cohort import distinct_cohort, subset_by_cohort  # noqa: F401
from pedsnetdcc_spark.operators.merge import merge_sites  # noqa: F401
from pedsnetdcc_spark.operators.ids import IdAllocator, assign_surrogate_ids, remap_keys  # noqa: F401
from pedsnetdcc_spark.operators.upsert import insert_missing  # noqa: F401
from pedsnetdcc_spark.operators.split import classify_domain, split_by_domain  # noqa: F401
from pedsnetdcc_spark.operators.group_counts import group_count_table  # noqa: F401
from pedsnetdcc_spark.operators.quality import drop_invalid_values  # noqa: F401
