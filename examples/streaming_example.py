"""Streaming example: continuous (incremental) migration plus
dedup-at-ingestion over the same source directory.

Run: python examples/streaming_example.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_migrate_spark.migrate import MigrationJob
from data_warehouse_migrate_spark.session import get_spark
from data_warehouse_migrate_spark.streaming.dedup import run_dedup_exact_stream


def main() -> None:
    spark = get_spark("streaming-example")
    work = tempfile.mkdtemp(prefix="dwms_stream_example_")
    src, dest, ckpt = f"{work}/src", f"{work}/dest", f"{work}/ckpt"

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(300).write.parquet(src)

    # 1. continuous migration: first run drains what exists...
    job = MigrationJob(
        source_path=src, destination_path=dest, mode="overwrite",
        mapping={"computed": {"text_upper": "upper(text)"}})
    print("catch-up 1:", job.run_stream(spark, ckpt))

    # ...new files arrive; the next catch-up migrates ONLY the delta
    docs.orderBy("doc_id").limit(50).coalesce(1) \
        .write.mode("append").parquet(src)
    print("catch-up 2:", job.run_stream(spark, ckpt))

    # 2. dedup-at-ingestion over the same stream source
    deduped = run_dedup_exact_stream(spark, src, text_col="text")
    print(f"stream dedup: {deduped.count()} distinct docs "
          f"(source now has {spark.read.parquet(src).count()} rows)")

    # 3. stream-static enrichment: per-micro-batch broadcast dim join
    # (stateless — the canonical dimension-enrichment pattern)
    from data_warehouse_migrate_spark.streaming.joins import enrich_stream

    dim = spark.createDataFrame(
        [("src0", "web"), ("src1", "code"), ("src2", "books")],
        "source string, corpus_kind string")
    stream = (spark.readStream
              .schema(spark.read.parquet(src).schema).parquet(src))
    enriched = enrich_stream(stream, dim, ["source"])
    q = (enriched.writeStream.format("memory").queryName("enriched")
         .option("checkpointLocation", f"{ckpt}_enrich")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    kinds = spark.table("enriched").groupBy("corpus_kind").count()
    print("enriched stream by corpus kind:")
    kinds.show()

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
