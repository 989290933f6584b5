"""Deduplication operators for LLM-data pipelines (beyond-reference;
SURVEY.md §7.3). All shuffle-aware, no driver-side collects:

  * exact_dedup            — hash-groupBy on normalized text (one shuffle)
  * ngram_jaccard_pairs    — EXACT all-pairs Jaccard ≥ t via inverted-index
                             join (complete for J>0: pairs sharing no
                             shingle have J=0). The scalable exact path.
  * minhash_lsh_pairs      — MinHash + LSH banding: probabilistic candidate
                             generation, then exact-Jaccard verification.
                             The 100 TB path (candidates only, no all-pairs).
  * simhash_fingerprints / simhash_near_pairs — 32-bit SimHash + banded
                             hamming pairing.
  * embedding_near_dups    — cosine ≥ t near-dup pairs over embeddings,
                             LSH-bucketed.

Scale notes: inverted-index joins explode per-shingle — frequency-cap hot
shingles (``max_shingle_freq``) to bound the quadratic bucket blowup
(standard PPJoin-style prefix trick, here a plain frequency filter: a
shingle occurring in >F docs contributes F² candidate pairs; capping F
bounds skew while keeping recall for rare-shingle pairs — near-dup pairs
share many shingles, so dropping the hottest ones rarely loses a true pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions.text import (
    md5_prefix_int,
    minhash_signature,
    normalized_text,
    polyhash,
    simhash32,
    word_shingles,
)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical normalized texts: returns one row per distinct text
    with the keeper (min id) and the duplicate count. One hash-partitioned
    aggregate; at scale group keys are the 128-bit md5, not the text."""
    return (
        df.select(F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def drop_exact_dups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep only the min-id row per normalized text (the dedup materializer)."""
    h = F.md5(normalized_text(F.col(text_col)))
    w = df.withColumn("__h", h)
    keep = w.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return w.join(keep, [id_col, "__h"], "leftsemi").drop("__h")


# ---------------------------------------------------------------------------
# shingle machinery shared by Jaccard / MinHash
# ---------------------------------------------------------------------------

def _shingle_sets(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingles: array<long>) — distinct hashed word n-grams per doc."""
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(word_shingles(F.col(text_col), n), lambda s: _hash_shingle(s))
        ).alias("shingles"),
    )


def _hash_shingle(s):
    # polyhash is cheap and oracle-twinnable; collisions at 1e9+7 are
    # acceptable for shingle identity (same tradeoff as 32-bit minhash)
    return F.aggregate(
        F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(1_000_000_007),
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        n: int = 3, threshold: float = 0.8,
                        max_shingle_freq: int | None = None) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via inverted-index join.

    Returns (id_a, id_b, jaccard) for all pairs with J ≥ threshold,
    id_a < id_b. Complete: a pair with J>0 shares ≥1 shingle and is found
    by the shingle join. ``max_shingle_freq`` drops shingles occurring in
    more than F docs (skew cap; see module docstring).
    """
    sets = _shingle_sets(df, text_col, id_col, n)
    sizes = sets.select("id", F.size("shingles").alias("set_size"))
    inv = sets.select("id", F.explode("shingles").alias("shingle"))
    if max_shingle_freq:
        freq = inv.groupBy("shingle").agg(F.count("*").alias("f"))
        inv = inv.join(freq.filter(F.col("f") <= max_shingle_freq), "shingle", "leftsemi")
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    out = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(
            F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH banding (the at-scale near-dup path)
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       n: int = 3, k: int = 16) -> DataFrame:
    """(id, shingles, sig: array<long>[k]) MinHash signatures."""
    sets = _shingle_sets(df, text_col, id_col, n)
    return sets.withColumn("sig", minhash_signature(F.col("shingles"), k))


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      n: int = 3, k: int = 16, bands: int = 4,
                      threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs via LSH banding over MinHash signatures, verified
    with exact Jaccard on the shingle sets.

    k/bands rows-per-band r=k/b gives the usual S-curve: P(candidate) =
    1-(1-J^r)^b. Candidates are generated per band bucket (groupBy-join,
    shuffle on band hash — never all-pairs), then exact-verified.
    """
    assert k % bands == 0
    r = k // bands
    sigs = minhash_signatures(df, text_col, id_col, n, k)
    # band rows: (band_idx, band_key, id)
    band_rows = sigs.select(
        "id",
        F.posexplode(F.array(*[
            F.hash(*[F.col("sig")[i] for i in range(b * r, (b + 1) * r)]).alias(f"b{b}")
            for b in range(bands)
        ])).alias("band", "band_key"),
    )
    a = band_rows.alias("a")
    b_ = band_rows.alias("b")
    candidates = (
        a.join(b_, (F.col("a.band") == F.col("b.band")) &
               (F.col("a.band_key") == F.col("b.band_key")) &
               (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sets = sigs.select("id", "shingles")
    out = (
        candidates
        .join(sets.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard", F.round(
            F.col("n_inter") /
            (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash) 32-bit fingerprints — oracle-twinnable in SQL."""
    return df.select(F.col(id_col).alias("id"), simhash32(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(df: DataFrame, text_col: str, id_col: str,
                       max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via banded exact-match
    (pigeonhole: ≤3 differing bits over 4 bands leaves ≥1 identical band).
    Shuffles on 8-bit band values, never all-pairs."""
    fp = simhash_fingerprints(df, text_col, id_col)
    width = 32 // bands
    mask = (1 << width) - 1
    band_rows = fp.select(
        "id", "simhash",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ])).alias("band", "band_key"),
    )
    a = band_rows.alias("a")
    b_ = band_rows.alias("b")
    cand = (
        a.join(b_, (F.col("a.band") == F.col("b.band")) &
               (F.col("a.band_key") == F.col("b.band_key")) &
               (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("a.simhash").alias("sh_a"),
                F.col("b.id").alias("id_b"), F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(df: DataFrame, vec_col: str, id_col: str,
                        threshold: float = 0.95,
                        n_planes: int = 8) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, candidate-
    generated by random-hyperplane LSH buckets with hamming-1 multi-probe
    (near-identical vectors can still straddle one plane; probing 1-bit
    neighbors recovers those pairs at n_planes× candidate cost)."""
    from data_warehouse_migrate_spark.functions.vectors import cosine, hyperplane_signature

    sig = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
                    hyperplane_signature(F.col(vec_col), n_planes).alias("bucket"))
    probes = sig.withColumn("probe", F.explode(F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << j))
                           for j in range(n_planes)])))
    a = probes.alias("a")
    b = sig.alias("b")
    return (
        a.join(b, (F.col("a.probe") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("a.vec").alias("vec_a"),
                F.col("b.id").alias("id_b"), F.col("b.vec").alias("vec_b"))
        .distinct()
        .withColumn("cosine", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
