"""Eager parameter validation across the operator surface.

The r17 review leg extended the ``sample_frames(every_n_bytes=0)``
lesson (r16) package-wide: a degenerate size/count/fraction parameter
must fail AT CALL TIME with a ValueError naming the parameter — never
rows-deep as an executor-side arithmetic error, an opaque analysis
failure, and above all never a SILENTLY-wrong result. The sweep found
four silent-wrongness classes (each pinned below):

- ``semantic_dedup(n_cells=0)`` returned an EMPTY kept corpus — total
  data loss for a parameter typo (the zero-centroid seed routed into
  the empty-corpus early-return).
- ``simhash_near_pairs(bands > bits)`` banded on 0-bit keys — one
  bucket, silent all-pairs degeneration (correct output, corpus² cost).
- ``train_eval_split(n_buckets=0)`` failed rows-deep (REMAINDER_BY_ZERO
  under Spark 4's default ANSI mode; with ANSI off, pmod NULL falls
  through every WHEN and silently labels the whole corpus "train");
  ``weighted_bernoulli_sample(max_weight=0)`` kept every
  positively-weighted row.
- ``hash_sample(fraction=-0.1)`` kept nothing, ``fraction=1.1`` kept
  everything, ``shuffle_corpus(n_shards=0)`` silently fell back to the
  default parallelism (0 is falsy).
"""

import pytest
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.operators.dedup import (
    cross_corpus_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_fingerprints,
    simhash_near_pairs,
)
from data_warehouse_migrate_spark.operators.sampling import (
    hash_sample,
    shuffle_corpus,
    train_eval_split,
    weighted_bernoulli_sample,
)
from data_warehouse_migrate_spark.operators.similarity import (
    ivf_topk,
    kmeans_centroids,
    lsh_topk,
    lsh_topk_indexed,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "an entirely different sentence about spark plans")],
        "doc_id long, text string")


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0]), (3, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>")


def _qc(vecs):
    q = vecs.select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec"))
    c = vecs.select(F.col("vec_id").alias("corpus_id"),
                    F.col("embedding").alias("corpus_vec"))
    return q, c


# ---------------------------------------------------------------------------
# the invalid matrix: every case must raise ValueError at CALL time
# ---------------------------------------------------------------------------

def test_minhash_rejects_degenerate_sizes(docs):
    for kw in ({"n": 0}, {"k": 0}, {"k": 10_000}):
        with pytest.raises(ValueError, match="n must be|k must be"):
            minhash_signatures(docs, "text", "doc_id", **kw)
    # bands=0 used to ZeroDivisionError; non-dividing bands was a bare
    # assert (strippable under -O)
    with pytest.raises(ValueError, match="bands must be"):
        minhash_lsh_pairs(docs, "text", "doc_id", bands=0)
    with pytest.raises(ValueError, match="bands must be"):
        minhash_lsh_pairs(docs, "text", "doc_id", k=16, bands=17)
    with pytest.raises(ValueError, match="divide evenly"):
        minhash_lsh_pairs(docs, "text", "doc_id", k=16, bands=3)


def test_ngram_jaccard_rejects_degenerate_params(docs):
    with pytest.raises(ValueError, match="n must be"):
        ngram_jaccard_pairs(docs, "text", "doc_id", n=0)
    for f in (0, -1):
        with pytest.raises(ValueError, match="max_shingle_freq"):
            ngram_jaccard_pairs(docs, "text", "doc_id", max_shingle_freq=f)
    # the cross-corpus wrapper flows through the same validated spine
    with pytest.raises(ValueError, match="n must be"):
        cross_corpus_dedup(docs, docs, "text", "doc_id", n=-1)


def test_simhash_rejects_degenerate_bands_and_bits(docs):
    for bits in (0, 61):
        with pytest.raises(ValueError, match="bits must be"):
            simhash_fingerprints(docs, "text", "doc_id", bits=bits)
    # bands > bits = 0-bit band keys = ONE bucket = silent all-pairs
    with pytest.raises(ValueError, match="bands must be"):
        simhash_near_pairs(docs, "text", "doc_id", bands=61)
    with pytest.raises(ValueError, match="bands must be"):
        simhash_near_pairs(docs, "text", "doc_id", bands=0)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_pairs(docs, "text", "doc_id", max_hamming=-1)


def test_embedding_near_dups_rejects_degenerate_lsh_params(vecs):
    from data_warehouse_migrate_spark.operators.dedup import (
        embedding_near_dups,
    )

    with pytest.raises(ValueError, match="bands must be"):
        embedding_near_dups(vecs, "embedding", "vec_id", bands=0)
    with pytest.raises(ValueError, match="n_planes must be >= bands"):
        embedding_near_dups(vecs, "embedding", "vec_id",
                            n_planes=2, bands=4)
    with pytest.raises(ValueError, match="divide evenly"):
        embedding_near_dups(vecs, "embedding", "vec_id",
                            n_planes=10, bands=4)
    for pb in (-1, 3):
        with pytest.raises(ValueError, match="probe_bits"):
            embedding_near_dups(vecs, "embedding", "vec_id",
                                n_planes=8, bands=4, probe_bits=pb)


def test_semantic_dedup_rejects_zero_cells_instead_of_losing_data(vecs):
    with pytest.raises(ValueError, match="n_cells"):
        semantic_dedup(vecs, "embedding", "vec_id", n_cells=0)
    with pytest.raises(ValueError, match="max_bucket_size"):
        semantic_dedup(vecs, "embedding", "vec_id", max_bucket_size=0)
    # the non-degenerate call KEEPS the corpus (1 and 2 collapse to one
    # representative at the default threshold only if cosine >= 0.95;
    # here cos(1,2)≈0.994 — so 2 of 3 survive): the n_cells=0 bug would
    # have returned ZERO rows here
    kept = semantic_dedup(vecs, "embedding", "vec_id", n_cells=1)
    assert kept.count() == 2


def test_similarity_rejects_degenerate_lsh_and_ivf_params(vecs):
    q, c = _qc(vecs)
    with pytest.raises(ValueError, match="bands must be"):
        lsh_topk(q, c, bands=0)
    with pytest.raises(ValueError, match="n_planes must be >= bands"):
        lsh_topk(q, c, n_planes=2, bands=4)
    with pytest.raises(ValueError, match="divide evenly"):
        lsh_topk(q, c, n_planes=10, bands=4)
    for pb in (-1, 3):
        with pytest.raises(ValueError, match="probe_bits"):
            lsh_topk(q, c, n_planes=8, bands=4, probe_bits=pb)
    with pytest.raises(ValueError, match="max_bucket_size"):
        lsh_topk(q, c, n_planes=8, bands=4, max_bucket_size=0)
    # indexed probe: validation fires BEFORE the catalog lookup, so no
    # index table needs to exist
    with pytest.raises(ValueError, match="probe_bits"):
        lsh_topk_indexed(q, "nonexistent_table", probe_bits=9)
    with pytest.raises(ValueError, match="n_cells"):
        ivf_topk(q, c, n_cells=0)
    with pytest.raises(ValueError, match="nprobe"):
        ivf_topk(q, c, nprobe=0)
    # k=0 used to raise the MISLEADING "empty corpus" error
    with pytest.raises(ValueError, match="k must be"):
        kmeans_centroids(vecs, "embedding", "vec_id", k=0)
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_centroids(vecs, "embedding", "vec_id", k=2, n_iter=-1)


def test_sampling_rejects_degenerate_params(docs):
    for f in (-0.1, 1.1):
        with pytest.raises(ValueError, match="fraction"):
            hash_sample(docs, "doc_id", f)
    with pytest.raises(ValueError, match="n_buckets"):
        train_eval_split(docs, "doc_id", n_buckets=0)
    with pytest.raises(ValueError, match="must be >= 0"):
        train_eval_split(docs, "doc_id", eval_buckets=-1)
    with pytest.raises(ValueError, match="<= n_buckets"):
        train_eval_split(docs, "doc_id", n_buckets=10,
                         eval_buckets=6, test_buckets=5)
    for w in (0.0, -5.0):
        with pytest.raises(ValueError, match="max_weight"):
            weighted_bernoulli_sample(docs, "doc_id", "doc_id", w)
    for s in (0, -2):
        with pytest.raises(ValueError, match="n_shards"):
            shuffle_corpus(docs, "doc_id", n_shards=s)


# ---------------------------------------------------------------------------
# valid boundary values still work (the guards must not over-reject)
# ---------------------------------------------------------------------------

def test_boundary_params_still_accepted(docs, vecs, spark):
    # fraction endpoints are meaningful: 0 keeps nothing, 1 keeps all
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == 3
    # an all-eval/test split (train range empty) is a valid request
    rows = train_eval_split(docs, "doc_id", n_buckets=2,
                            eval_buckets=1, test_buckets=1)
    assert {r.split for r in rows.collect()} <= {"eval", "test"}
    # bands == k → r=1 (the loosest S-curve), bands == bits → 1-bit slices
    assert minhash_lsh_pairs(docs, "text", "doc_id",
                             k=4, bands=4, threshold=0.5).count() >= 0
    pairs = simhash_near_pairs(docs, "text", "doc_id",
                               max_hamming=0, bands=60)
    assert pairs.count() >= 0
    # explicit single-shard shuffle
    assert shuffle_corpus(docs, "doc_id", n_shards=1).count() == 3
