"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship migrate-pipeline query on sf0.001;
``queries``/``oracle_sql`` expose the full operator registry
(data_warehouse_migrate_spark.queries) — one entry per implemented operator
from SURVEY.md §2 plus the beyond-reference LLM-pipeline operators.
Seven queries intentionally have no oracle (probabilistic/approximate by
construction: LSH banding, multi-probe ANN, IVF, HLL, percentile sketch,
PCA); the driver records rows-only checks for them, and each has an
oracle-checked exact companion in the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_migrate_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["migrate_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
