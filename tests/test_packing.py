import pyspark.sql.functions as F
import pytest

from data_warehouse_migrate_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


def test_pack_sequences_arithmetic(spark):
    # one group, known token counts -> hand-checkable chunk layout
    rows = [(1, "a b c d"),          # 4 tokens, starts seq 0 @ 0
            (2, "e f g"),            # 3 tokens, starts seq 0 @ 4
            (3, "h i j k l m n o"),  # 8 tokens, starts seq 0 @ 7, spans
            (4, "p q"),              # 2 tokens, starts seq 1 @ 5
            (5, "")]                 # 0 tokens, zero-width slot @ 7
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in pack_sequences(
        df, "text", "doc_id", budget=10, n_groups=1,
        group_expr=F.lit(0)).collect()}
    assert [out[i].n_tokens for i in range(1, 6)] == [4, 3, 8, 2, 0]
    assert [out[i].seq_id for i in range(1, 6)] == [0, 0, 0, 1, 1]
    assert [out[i].start_offset for i in range(1, 6)] == [0, 4, 7, 5, 7]


def test_pack_sequences_partition_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = pack_sequences(docs, "text", "doc_id", budget=256, n_groups=4)
    b = pack_sequences(docs.repartition(7), "text", "doc_id",
                       budget=256, n_groups=4)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # every document lands in exactly one slot
    assert a.count() == docs.count()
    assert a.select("id").distinct().count() == docs.count()
    # offsets always inside the budget
    assert a.filter((F.col("start_offset") < 0)
                    | (F.col("start_offset") >= 256)).count() == 0


def test_packing_stats_conservation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = pack_sequences(docs, "text", "doc_id", budget=256, n_groups=4)
    stats = packing_stats(packed, budget=256)
    rows = stats.collect()
    assert {r.pack_group for r in rows} <= {0, 1, 2, 3}
    total = packed.agg(F.sum("n_tokens")).first()[0]
    assert sum(r.total_tokens for r in rows) == total
    for r in rows:
        assert 0 < r.fill_ratio <= 1.0
        assert r.n_seqs * 256 >= r.total_tokens > (r.n_seqs - 1) * 256


def test_pack_sequences_chunk_overflow_raises(spark, monkeypatch):
    """A group exceeding the chunks-per-group bound raises instead of
    silently colliding with the next group's seq_ids (bound shrunk via
    monkeypatch — the real 1e9 needs 2×10^12 tokens to trip)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from data_warehouse_migrate_spark.operators import packing

    monkeypatch.setattr(packing, "_MAX_CHUNKS_PER_GROUP", 4)
    docs = spark.createDataFrame(
        [(i, "tok " * 10) for i in range(10)], "id long, text string")
    out = packing.pack_sequences(docs, "text", "id", budget=5, n_groups=1,
                                 group_expr=F.lit(0))
    with pytest.raises(SparkRuntimeException, match="exceeds 4 chunks"):
        out.collect()


def test_chunk_documents_windows_and_overlap(spark):
    from data_warehouse_migrate_spark.operators.packing import chunk_documents

    words = ["alpha", "beta", "gamma", "delta", "epsilon",
             "zeta", "eta", "theta", "iota", "kappa"]
    text = " ".join(words)                        # 10 tokens
    df = spark.createDataFrame([(1, text), (2, ""), (3, "only three tokens")],
                               "doc_id long, text string")
    out = {(r.id, r.chunk_id): r for r in
           chunk_documents(df, "text", "doc_id",
                           chunk_tokens=4, overlap=2).collect()}
    # doc 1: stride 2, starts 0,2,4,6 (8 would add no new token: 8+2 >= 10)
    assert [(k[1]) for k in sorted(out) if k[0] == 1] == [0, 1, 2, 3]
    assert out[(1, 0)].chunk_text == "alpha beta gamma delta"
    assert out[(1, 1)].chunk_text == "gamma delta epsilon zeta"  # overlap 2
    assert out[(1, 3)].chunk_text == "eta theta iota kappa"      # covers tail
    # empty doc yields one empty chunk, not zero rows
    assert out[(2, 0)].n_tokens == 0 and out[(2, 0)].chunk_text == ""
    # doc shorter than one chunk: single chunk
    assert [(k[1]) for k in sorted(out) if k[0] == 3] == [0]

    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=4)


def test_chunk_documents_plan_is_narrow(spark, sf_dir):
    """Chunking must not shuffle: no Exchange in the physical plan."""
    from data_warehouse_migrate_spark.operators.packing import chunk_documents
    from data_warehouse_migrate_spark.plans.dryrun import explain_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = explain_plan(chunk_documents(docs, "text", "doc_id"))
    assert "Exchange" not in plan


def test_packing_null_docs(spark):
    """NULL documents: pack_sequences counts them 0 tokens (zero-width
    slot — before the r8 audit the NULL token count turned the
    cumulative window NULL and tripped the 1e9-chunk guard with a
    misleading error); chunk_documents yields one NULL chunk (module
    NULL-propagation convention), distinguishable from the empty doc's
    empty chunk."""
    from data_warehouse_migrate_spark.operators.packing import (
        chunk_documents,
        pack_sequences,
    )

    df = spark.createDataFrame([(1, "w w w"), (2, None), (3, "")],
                               "id long, text string")
    packed = {r.id: r for r in pack_sequences(df, "text", "id", budget=4,
                                              n_groups=1).collect()}
    assert len(packed) == 3
    assert packed[2].n_tokens == 0 and packed[3].n_tokens == 0
    assert packed[1].n_tokens == 3

    chunks = {r.id: r for r in chunk_documents(df, "text", "id",
                                               chunk_tokens=4,
                                               overlap=0).collect()}
    assert len(chunks) == 3                       # rows never vanish
    assert chunks[2].n_tokens is None and chunks[2].chunk_text is None
    assert chunks[3].n_tokens == 0 and chunks[3].chunk_text == ""
