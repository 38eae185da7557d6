from pedsnetdcc_spark.streaming.incremental import (  # noqa: F401
    streaming_eras,
    streaming_event_counts,
    streaming_interval_eras,
    streaming_interval_summary,
)
from pedsnetdcc_spark.streaming.sync import (  # noqa: F401
    incremental_interval_sync,
)
