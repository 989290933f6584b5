"""End-to-end LLM training-data pipeline over the documents table:
scrub PII → exact dedup → near-dup dedup (MinHash LSH) → cluster →
quality filter → pack into training sequences. Each stage is one of the
engine's operators; the whole chain is lazy until the final action.

Run: python examples/llm_pipeline_example.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions.text import redact_pii
from data_warehouse_migrate_spark.operators.dedup import (
    connected_components,
    drop_exact_dups,
    minhash_lsh_pairs,
)
from data_warehouse_migrate_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)
from data_warehouse_migrate_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llm-pipeline-example")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. hygiene: redact contact strings before anything else sees text
    docs = docs.withColumn("text", redact_pii(F.col("text")))

    # 2. exact dedup (normalized-text hash, keep min id)
    docs = drop_exact_dups(docs, "text", "doc_id")

    # 3. near-dup pairs -> clusters -> keep one doc per cluster
    pairs = minhash_lsh_pairs(docs, "text", "doc_id",
                              n=3, k=16, bands=8, threshold=0.6)
    clusters = connected_components(
        docs.select(F.col("doc_id").alias("id")), pairs)
    keep = (clusters.groupBy("cluster_id")
            .agg(F.min("id").alias("doc_id")).select("doc_id"))
    docs = docs.join(keep, "doc_id", "leftsemi")

    # 4. pack survivors into fixed-budget training sequences
    packed = pack_sequences(docs, "text", "doc_id",
                            budget=2048, n_groups=8)
    stats = packing_stats(packed, budget=2048)

    n_docs = docs.count()
    print(f"surviving documents: {n_docs}")
    print("packing stats (per shard):")
    for r in stats.orderBy("pack_group").collect():
        print(f"  shard {r.pack_group}: {r.n_docs} docs, "
              f"{r.total_tokens} tokens -> {r.n_seqs} seqs "
              f"(fill {r.fill_ratio})")
    spark.stop()


if __name__ == "__main__":
    main()
