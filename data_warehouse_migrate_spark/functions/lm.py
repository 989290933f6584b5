"""Corpus unigram language-model scoring (beyond-reference LLM-pipeline
surface): the CCNet/C4-style "how much does this document look like the
corpus" signal, usable for quality gating and outlier mining.

Two passes, both plain DataFrame aggregates:

  1. ``unigram_model`` — token frequencies over the whole corpus plus
     each token's log10 probability. One explode + one hash aggregate
     (map-side partial combine keeps the shuffle at distinct-token
     volume, not token-instance volume).
  2. ``doc_unigram_logprob`` — per-document mean token log-probability:
     explode, join the model on token, aggregate per doc.

100 TB shape: the model is distinct-token sized (Heaps' law: ~10⁶-10⁸
rows at corpus scale — far below instance counts); the scoring join
shuffles on the token key and aggregates per doc. No UDFs, no driver
data paths, no collect. Tokenization is the engine's shared BPE-ish
regex (``functions.text.TOKEN_REGEX``) over lowercased text, identical
to the ANSI-SQL oracle's ``regexp_extract_all``.

Self-scoring note: scoring the same corpus the model was built from has
no out-of-vocabulary tokens by construction. When scoring OTHER text
against a reference-corpus model, pass ``oov_logp`` (e.g. the model's
minimum logp minus 1) so unseen tokens penalize instead of dropping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions.text import TOKEN_REGEX


def _tokens(text_col) -> F.Column:
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_REGEX), 0)


def unigram_model(docs: DataFrame, text_col: str) -> DataFrame:
    """(token, n, logp): corpus token frequencies and log10 probability.

    ``logp`` is rounded to 6dp — the model is the cross-engine contract
    surface, so its values are pinned before any downstream averaging.
    """
    toks = docs.select(
        F.explode(_tokens(F.col(text_col))).alias("token"))
    freq = toks.groupBy("token").agg(F.count("*").alias("n"))
    total = freq.agg(F.sum("n").cast("double").alias("__total"))
    return (freq.crossJoin(F.broadcast(total))
            .select("token", "n",
                    F.round(F.log10(F.col("n") / F.col("__total")), 6)
                    .alias("logp")))


def doc_unigram_logprob(docs: DataFrame, text_col: str, id_col: str,
                        model: DataFrame | None = None,
                        oov_logp: float | None = None) -> DataFrame:
    """(id, n_tokens, avg_logprob) per document.

    ``model`` defaults to a model built from ``docs`` itself
    (self-scoring — no OOV possible). With an external model, tokens
    missing from it take ``oov_logp`` when given, else their rows drop
    from the average (disclosed: dropping inflates scores of
    OOV-heavy documents; prefer an explicit penalty).

    Documents with zero tokens survive with n_tokens=0 and NULL score
    (empty is a length-filter concern, not a score of 0 — which would
    be a PERFECT logprob).
    """
    if model is None:
        model = unigram_model(docs, text_col)
    dtoks = docs.select(F.col(id_col).alias("id"),
                        F.explode(_tokens(F.col(text_col))).alias("token"))
    how = "left" if oov_logp is not None else "inner"
    scored = dtoks.join(model.select("token", "logp"), "token", how)
    if oov_logp is not None:
        scored = scored.withColumn(
            "logp", F.coalesce(F.col("logp"), F.lit(float(oov_logp))))
    # Order-independent mean: the model's logp values are 6dp-rounded, so
    # ×1e6 they are EXACT integers — summing longs is associative where a
    # double sum is not (cross-engine ±1ulp flipped the 6dp rounding).
    # The long sum stays far under 2^63; the final division is one
    # deterministic double op.
    micro = F.round(F.col("logp") * 1e6).cast("long")
    per_doc = (scored.groupBy("id")
               .agg(F.count("*").alias("n_tokens"),
                    F.round(F.sum(micro)
                            / (F.count("*") * F.lit(1_000_000.0)), 6)
                    .alias("avg_logprob")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per_doc, "id", "left")
            .select("id",
                    F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
                    .alias("n_tokens"),
                    "avg_logprob"))


def pmi_collocations(docs: DataFrame, text_col: str,
                     min_count: int = 5, k: int = 50) -> DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information:

      pmi(a,b) = log10( p(a,b) / (p(a)·p(b)) )

    with p(a,b) over adjacent-bigram occurrences and p(·) over unigram
    occurrences — the classic "new york"/"machine learning" detector,
    feeding tokenizer merge candidates and phrase-aware dedup.
    ``min_count`` floors the bigram count (PMI is notoriously noisy on
    rare pairs). Deterministic order: rounded-6dp pmi desc, then the
    bigram itself.

    Two explodes + three hash aggregates, all shuffles at distinct-token
    / distinct-bigram volume (map-side combined); the two totals ride
    along as broadcast scalars. No UDFs, no sorts beyond the k-row
    TakeOrdered.
    """
    bi = (docs.select(F.explode(_bigrams(F.col(text_col)))
                      .alias("p")).select("p.w1", "p.w2"))
    bic = bi.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    uni = (docs.select(F.explode(_tokens(F.col(text_col))).alias("w"))
           .groupBy("w").agg(F.count("*").alias("c")))
    tot_bi = bic.agg(F.sum("c_ab").cast("double").alias("__tb"))
    tot_uni = uni.agg(F.sum("c").cast("double").alias("__tu"))
    pmi = F.round(F.log10(
        (F.col("c_ab") / F.col("__tb"))
        / ((F.col("ca") / F.col("__tu")) * (F.col("cb") / F.col("__tu")))), 6)
    return (bic.filter(F.col("c_ab") >= min_count)
            .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("ca")),
                  "w1")
            .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("cb")),
                  "w2")
            .crossJoin(F.broadcast(tot_bi))
            .crossJoin(F.broadcast(tot_uni))
            .select("w1", "w2", "c_ab", pmi.alias("pmi"))
            .orderBy(F.desc("pmi"), "w1", "w2")
            .limit(k))


def tfidf_top_terms(docs: DataFrame, text_col: str, id_col: str,
                    top_n: int = 3) -> DataFrame:
    """Per-document top-``top_n`` terms by tf·idf — the classic
    keyword/topic surface (feeds dataset cards, cluster labeling, and
    per-domain vocabulary drift checks).

      idf(t)      = log10(N / df_t)   (N = corpus documents, df_t =
                                       documents containing t)
      tfidf(d, t) = tf_{d,t} · idf(t), rounded 6dp

    Deterministic rank per doc: (tfidf DESC, token ASC). idf is rounded
    6dp BEFORE the product (the cross-engine contract surface, same
    convention as ``unigram_model``); tf is an exact integer, so the
    product is one deterministic IEEE multiply on both engines.

    100 TB shape: tf is a (doc, token)-keyed hash aggregate; df reuses
    the same exploded tokens at distinct-token volume (map-side
    combined); N rides along as a broadcast scalar; the idf join
    shuffles on the token key; the final top-n window is keyed per doc
    with O(1) frame state. No UDFs, no collects.
    """
    dtoks = docs.select(F.col(id_col).alias("id"),
                        F.explode(_tokens(F.col(text_col))).alias("token"))
    tf = dtoks.groupBy("id", "token").agg(F.count("*").alias("tf"))
    df_t = (tf.groupBy("token")
            .agg(F.count("*").alias("df")))
    n_docs = docs.agg(F.count("*").cast("double").alias("__n"))
    idf = (df_t.crossJoin(F.broadcast(n_docs))
           .select("token",
                   F.round(F.log10(F.col("__n") / F.col("df")), 6)
                   .alias("idf")))
    scored = (tf.join(idf, "token")
              .withColumn("tfidf",
                          F.round(F.col("tf") * F.col("idf"), 6)))
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n)
            .select("id", "token", "tf", "tfidf", "rank"))


def _bigrams(text_col) -> F.Column:
    """Adjacent-token bigram structs (w1, w2) — the PMI construction,
    shared so model and scorer tokenize identically (pmi_collocations
    uses it too since r9).

    The token array is LET-BOUND via a single-element-array transform
    (the r9 ``word_shingles`` pattern): the r8 shape referenced the
    ``_tokens`` split tree four times (size + two slices + explode
    sibling), re-running the full-text regex split per reference — a
    constant factor, but one a 100 TB bigram pass pays on every row."""
    return F.transform(
        F.array(_tokens(text_col)),
        lambda t: F.when(F.size(t) < 2, F.array()).otherwise(
            F.zip_with(F.slice(t, 1, F.size(t) - 1),
                       F.slice(t, 2, F.size(t) - 1),
                       lambda a, b: F.struct(a.alias("w1"),
                                             b.alias("w2")))))[0]


def bigram_model(docs: DataFrame, text_col: str) -> DataFrame:
    """(w1, w2, n, logp): adjacent-bigram counts and CONDITIONAL log10
    probability p(w2 | w1) = c(w1,w2) / Σ_b c(w1,b) — the next-token
    fluency model one step up from ``unigram_model``. ``logp`` rounded
    6dp (the cross-engine contract convention).

    One explode + two hash aggregates; the context totals Σ_b c(w1,b)
    come from a window-free second aggregate joined back on w1 —
    distinct-bigram volume throughout, map-side combined.
    """
    bi = (docs.select(F.explode(_bigrams(F.col(text_col))).alias("p"))
          .select("p.w1", "p.w2"))
    counts = bi.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    ctx = counts.groupBy("w1").agg(F.sum("n").alias("__ca"))
    return (counts.join(ctx, "w1")
            .select("w1", "w2", "n",
                    F.round(F.log10(F.col("n") / F.col("__ca")), 6)
                    .alias("logp")))


def doc_bigram_logprob(docs: DataFrame, text_col: str, id_col: str,
                       model: DataFrame | None = None,
                       oov_logp: float | None = None) -> DataFrame:
    """(id, n_bigrams, avg_logprob): per-document mean conditional
    bigram log-probability — the fluency signal that catches
    scrambled/templated text a unigram model scores as normal (same
    token multiset, broken transitions).

    Self-scoring by default (no OOV possible); with an external
    ``model``, unseen bigrams take ``oov_logp`` when given, else drop
    from the mean (disclosed, same convention as
    ``doc_unigram_logprob``). Documents with fewer than 2 tokens
    survive with n_bigrams=0 and NULL score. The mean uses the
    engine's order-independent micro-integer summation.
    """
    if model is None:
        model = bigram_model(docs, text_col)
    dbi = (docs.select(F.col(id_col).alias("id"),
                       F.explode(_bigrams(F.col(text_col))).alias("p"))
           .select("id", "p.w1", "p.w2"))
    how = "left" if oov_logp is not None else "inner"
    scored = dbi.join(model.select("w1", "w2", "logp"), ["w1", "w2"], how)
    if oov_logp is not None:
        scored = scored.withColumn(
            "logp", F.coalesce(F.col("logp"), F.lit(float(oov_logp))))
    micro = F.round(F.col("logp") * 1e6).cast("long")
    per_doc = (scored.groupBy("id")
               .agg(F.count("*").alias("n_bigrams"),
                    F.round(F.sum(micro)
                            / (F.count("*") * F.lit(1_000_000.0)), 6)
                    .alias("avg_logprob")))
    return (docs.select(F.col(id_col).alias("id"))
            .join(per_doc, "id", "left")
            .select("id",
                    F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
                    .alias("n_bigrams"),
                    "avg_logprob"))
