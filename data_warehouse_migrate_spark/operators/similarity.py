"""Similarity search over embedding columns (beyond-reference;
SURVEY.md §7.3).

  * brute_force_topk — exact cosine top-k: broadcast the (small) query set,
    one narrow pass over the corpus, per-query top-k. The correctness
    baseline and the oracle-checked path.
  * lsh_topk         — random-hyperplane-bucketed ANN: queries only probe
    matching buckets (multi-probe over hamming-adjacent buckets for
    recall). The 100 TB path: corpus is bucket-partitioned once (write it
    bucketed to reuse across queries) and each query touches a tiny slice.

Scale notes: top-k uses a window over (query_id) AFTER the score filter —
the shuffle carries only per-query candidates, not the full cross product;
with broadcast queries the cross join itself never shuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions.vectors import cosine


def brute_force_topk(queries: DataFrame, corpus: DataFrame,
                     k: int = 10,
                     query_id: str = "query_id", query_vec: str = "query_vec",
                     corpus_id: str = "corpus_id", corpus_vec: str = "corpus_vec",
                     exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k neighbors per query. Deterministic tie-break:
    (cosine DESC, corpus_id ASC). Queries are broadcast — the corpus scan
    stays narrow and shuffle-free until the per-query top-k window."""
    q = F.broadcast(queries.select(F.col(query_id).alias("query_id"),
                                   F.col(query_vec).alias("__qv")))
    c = corpus.select(F.col(corpus_id).alias("corpus_id"), F.col(corpus_vec).alias("__cv"))
    scored = q.crossJoin(c)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("corpus_id"))
    scored = scored.withColumn("cosine", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "corpus_id", "cosine", "rank"))




def ivf_topk(queries: DataFrame, corpus: DataFrame,
             k: int = 10, n_cells: int = 16, nprobe: int = 4,
             query_id: str = "query_id", query_vec: str = "query_vec",
             corpus_id: str = "corpus_id", corpus_vec: str = "corpus_vec",
             exclude_self: bool = True) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    every corpus vector to its nearest centroid cell; each query probes its
    ``nprobe`` nearest cells and ranks exact cosine only within them.

    Centroids are the ``n_cells`` lowest-id corpus vectors — deterministic
    (no RNG, stable across retries) and adequate as a coarse quantizer;
    swap in k-means centroids for production recall. Centroid assignment
    broadcasts the (tiny) centroid set, so building the index is one
    narrow pass over the corpus; at 100 TB the assigned corpus is written
    out partitioned by cell so queries prune to nprobe/n_cells of the data.
    """
    cents = F.broadcast(
        corpus.select(F.col(corpus_id).alias("corpus_id"),
                      F.col(corpus_vec).alias("__cv"))
        .withColumn("__rn", F.row_number().over(Window.orderBy(F.col("corpus_id"))))
        .filter(F.col("__rn") <= n_cells)
        .select(F.col("__rn").alias("cell"), F.col("__cv").alias("__cent")))

    def _assign(df, id_col, vec_col, n_keep):
        scored = (df.crossJoin(cents)
                  .withColumn("__sim", cosine(F.col(vec_col), F.col("__cent"))))
        w = Window.partitionBy(id_col).orderBy(
            F.col("__sim").desc(), F.col("cell").asc())
        return (scored.withColumn("__cr", F.row_number().over(w))
                .filter(F.col("__cr") <= n_keep)
                .drop("__cent", "__sim", "__cr"))

    c = _assign(corpus.select(F.col(corpus_id).alias("corpus_id"),
                              F.col(corpus_vec).alias("__cv")),
                "corpus_id", "__cv", 1)
    q = _assign(queries.select(F.col(query_id).alias("query_id"),
                               F.col(query_vec).alias("__qv")),
                "query_id", "__qv", nprobe)
    scored = q.join(c, "cell")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("corpus_id"))
    scored = (scored
              .withColumn("cosine", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
              .select("query_id", "corpus_id", "cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "corpus_id", "cosine", "rank"))


def lsh_topk(queries: DataFrame, corpus: DataFrame,
             k: int = 10, n_planes: int = 24, bands: int = 4,
             probe_bits: int = 1,
             query_id: str = "query_id", query_vec: str = "query_vec",
             corpus_id: str = "corpus_id", corpus_vec: str = "corpus_vec",
             exclude_self: bool = True) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: the corpus is
    indexed in ``bands`` independent tables keyed by r = n_planes/bands
    sign bits each; queries probe their key (plus keys within
    ``probe_bits`` flips — multi-probe) in every table, and candidates
    from any table are union-ranked by exact cosine.

    Single-table sign-LSH cannot hold recall on unclustered data (one
    r-bit key match has P ≈ p^r, p = 1−θ/π); the union over tables gives
    1−(1−P_table)^bands — the standard recall/storage tradeoff, at
    ``bands``× index entries per vector. Key space per table is 2^r: size
    r ≈ log2(corpus/target_bucket) so bucket occupancy — and the per-query
    candidate count — stays bounded as the corpus grows (r=6 suits ~10^4
    vectors; a 10^9-vector corpus wants r≥24). The join is (table,
    key)-equi, shuffle-partitioned on the key — never all-pairs; at 100 TB
    the indexed corpus is written bucketed by (table, key) once and reused
    across query batches."""
    from data_warehouse_migrate_spark.functions.vectors import (
        band_keys_from_projections,
        hyperplane_projections,
    )
    from data_warehouse_migrate_spark.operators.dedup import _probe_keys

    r = n_planes // bands
    assert bands * r == n_planes, "n_planes must divide evenly into bands"

    def _indexed(df, id_name, vec_name, out_id, out_vec):
        keys = band_keys_from_projections(
            hyperplane_projections(F.col(vec_name), n_planes), bands, r)
        return df.select(
            F.col(id_name).alias(out_id), F.col(vec_name).alias(out_vec),
            F.posexplode(keys).alias("band", "band_key"))

    c = _indexed(corpus, corpus_id, corpus_vec, "corpus_id", "__cv")
    q = (_indexed(queries, query_id, query_vec, "query_id", "__qv")
         .select("query_id", "__qv", "band",
                 F.explode(_probe_keys(F.col("band_key"), r, probe_bits))
                  .alias("band_key")))
    scored = q.join(c, ["band", "band_key"]).drop("band", "band_key")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("corpus_id"))
    scored = (scored
              .withColumn("cosine", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
              .select("query_id", "corpus_id", "cosine")
              .distinct())  # multi-probe may hit the same candidate twice
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "corpus_id", "cosine", "rank"))


def label_principal_direction(df: DataFrame, vec_col: str = "embedding",
                              label_col: str = "label",
                              id_col: str = "vec_id",
                              n_iter: int = 30) -> DataFrame:
    """Per-label top principal direction of the embedding cloud — a custom
    grouped operator built on ``applyInPandas`` (power iteration over the
    group covariance; genuinely inexpressible with built-in aggregates).

    Deterministic: rows are sorted by ``id_col`` inside each group before
    any float reduction (Arrow delivers groups in partition-arrival order),
    and power iteration starts from a fixed vector. Scale: state per group
    is one dim×dim covariance — groups stream through Arrow batches, and
    the shuffle is one hash partition by label.

    Returns (label, n, explained, pc: array<double>) where ``explained``
    is the share of variance along the principal direction.
    """
    import numpy as np
    import pandas as pd

    schema = f"{label_col} int, n long, explained double, pc array<double>"

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col)
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        mu = X.mean(axis=0)
        Xc = X - mu
        C = Xc.T @ Xc / max(len(X) - 1, 1)
        v = np.ones(C.shape[0]) / np.sqrt(C.shape[0])
        for _ in range(n_iter):
            w = C @ v
            nv = np.linalg.norm(w)
            if nv == 0:
                break
            v = w / nv
        lam = float(v @ C @ v)
        tot = float(np.trace(C)) or 1.0
        return pd.DataFrame([{
            label_col: int(pdf[label_col].iloc[0]),
            "n": len(X),
            "explained": round(lam / tot, 6),
            "pc": [float(x) for x in np.round(v, 6)],
        }])

    return df.groupBy(label_col).applyInPandas(fn, schema)
