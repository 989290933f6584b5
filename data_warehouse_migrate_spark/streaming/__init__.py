from data_warehouse_migrate_spark.streaming.dedup import (
    dedup_exact_stream,
    run_dedup_exact_stream,
)
from data_warehouse_migrate_spark.streaming.windows import (
    sessionize,
    streaming_windowed_counts,
    tumbling_window_agg,
)

__all__ = [
    "dedup_exact_stream",
    "run_dedup_exact_stream",
    "sessionize",
    "streaming_windowed_counts",
    "tumbling_window_agg",
]
