"""BigQuery sink adapter — the reference's primary destination (reference
``bigquery_client.py``), wired to the PUBLIC spark-bigquery-connector
(``com.google.cloud.spark:spark-bigquery-with-dependencies``). Soft
dependency: availability is probed at call time and a clear error names
the public artifact when the jar is absent; no other code path depends on
it.

Reference semantics mirrored (``bigquery_client.py:133-194``):
  * WRITE_APPEND / WRITE_TRUNCATE map to Spark save modes append /
    overwrite — overwrite keeps the table (truncate), matching the
    reference's load-job disposition rather than a drop-recreate;
  * an explicit schema disables autodetect — here the engine's
    ``schema.bigquery_schema`` translation (T1) validates the frame's
    columns BEFORE the load instead of being attached to a load job
    (the connector derives the BQ schema from the Spark schema, which is
    already typed end-to-end — the reference needed autodetect because
    pandas frames aren't);
  * dataset auto-creation (``create_dataset_if_not_exists``,
    ``bigquery_client.py:45-65``) via the connector's
    ``createDisposition`` / dataset options.

How it differs (Spark-first): the reference funnels every row through one
pandas DataFrame into a single load job — bounded by driver memory. The
connector writes partition-parallel through the BigQuery Storage Write
API (direct mode), which is the only shape that survives 100 TB.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

from data_warehouse_migrate_spark.exceptions import (
    ConfigurationError,
    ConnectionFailedError,
)

logger = logging.getLogger(__name__)

_BQ_FORMAT = "bigquery"
_BQ_ARTIFACT = ("com.google.cloud.spark:"
                "spark-bigquery-with-dependencies_2.13:<version>")


def bigquery_connector_available(spark) -> bool:
    """True when the public spark-bigquery-connector is on the classpath
    (probed via the DataSource registry, not an import — the connector is
    a JVM artifact)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource \
            .lookupDataSource(_BQ_FORMAT, spark._jsparkSession.sessionState()
                              .conf())
        return True
    except Exception:
        return False


def write_bigquery(df: DataFrame, dataset_id: str, table_id: str,
                   mode: str = "append",
                   project: str | None = None,
                   temporary_gcs_bucket: str | None = None,
                   write_method: str = "direct",
                   validate_schema: bool = True,
                   **options) -> None:
    """Write ``df`` to ``dataset_id.table_id`` through the public
    connector.

    ``mode``: ``append`` ↔ WRITE_APPEND, ``overwrite`` ↔ WRITE_TRUNCATE
    (reference ``bigquery_client.py:140,160-167``). ``write_method``
    defaults to ``direct`` (Storage Write API — no staging bucket);
    pass ``indirect`` plus ``temporary_gcs_bucket`` for the legacy
    load-job path. ``validate_schema`` runs the engine's T1 translation
    over the frame first so an untranslatable column fails HERE with a
    column name, not inside a connector stack trace.
    """
    if mode not in ("append", "overwrite"):
        raise ConfigurationError(
            f"mode must be append|overwrite (got {mode!r})")
    if validate_schema:
        from data_warehouse_migrate_spark.schema import (
            bigquery_schema,
            specs_from_dataframe,
        )

        fields = bigquery_schema(specs_from_dataframe(df))
        logger.info("BigQuery schema for %s.%s: %s", dataset_id, table_id,
                    [f["name"] for f in fields])
    spark = df.sparkSession
    if not bigquery_connector_available(spark):
        raise ConnectionFailedError(
            "the BigQuery connector is not on the Spark classpath; add "
            f"the public artifact {_BQ_ARTIFACT} (spark.jars.packages) — "
            "no proprietary dependency is involved")
    table = f"{project + ':' if project else ''}{dataset_id}.{table_id}"
    writer = (df.write.format(_BQ_FORMAT).mode(mode)
              .option("table", table)
              .option("writeMethod", write_method))
    if temporary_gcs_bucket:
        writer = writer.option("temporaryGcsBucket", temporary_gcs_bucket)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
    logger.info("wrote %s mode=%s via %s", table, mode, write_method)


def read_bigquery(spark, dataset_id: str, table_id: str,
                  project: str | None = None, **options) -> DataFrame:
    """Read a BigQuery table through the public connector (Storage Read
    API: server-side column pruning + filter pushdown — ``.explain``
    shows them like any DataSourceV2 scan)."""
    if not bigquery_connector_available(spark):
        raise ConnectionFailedError(
            "the BigQuery connector is not on the Spark classpath; add "
            f"the public artifact {_BQ_ARTIFACT} (spark.jars.packages)")
    table = f"{project + ':' if project else ''}{dataset_id}.{table_id}"
    reader = spark.read.format(_BQ_FORMAT).option("table", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
