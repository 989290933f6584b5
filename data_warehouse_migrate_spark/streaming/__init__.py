from data_warehouse_migrate_spark.streaming.windows import (
    sessionize,
    streaming_windowed_counts,
    tumbling_window_agg,
)

__all__ = ["sessionize", "streaming_windowed_counts", "tumbling_window_agg"]
