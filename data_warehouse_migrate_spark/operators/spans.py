"""Exact repeated-substring span detection (beyond-reference
LLM-pipeline surface; the ExactSubstr half of Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better").

Document-level dedup (``operators.dedup``) removes whole near-identical
documents; what it cannot see is the boilerplate PHRASE — a license
header, a navigation bar, a templated disclaimer — pasted into millions
of otherwise-distinct pages. The reference paper removes any substring
of >= N tokens that occurs verbatim more than once in the corpus; its
implementation is a single-node suffix array, which neither fits nor
parallelizes at 100 TB. The Spark-first re-expression is a token k-gram
inverted index:

  position i of document d is COVERED when the k-gram starting at i
  occurs in >= ``min_docs`` distinct documents; maximal runs of covered
  positions (overlapping or adjacent windows chain) are the repeated
  spans. A repeated substring of length L >= k covers exactly its
  L - k + 1 window starts, so the merged span recovers the full maximal
  repeat — the suffix-array result at k-gram resolution (repeats
  shorter than k are below the filter threshold by design).

100 TB shape: two shuffles, both on keys that are well-distributed by
construction — (1) the k-gram-hash aggregate counting distinct source
documents (map-side combined; gram keys are 64-bit hashes, so shuffle
width is 1 long + 1 long per instance, not the gram text) plus the
leftsemi join back (same key — AQE reuses the exchange), and (2) the
per-document island-merge window (keyed on doc id, O(1) frame state per
row). No UDFs, no collects, no driver data paths. Hot grams (a phrase
in millions of docs) fan back out to their instances through the
leftsemi join — linear in instances, never pairwise, which is exactly
why this beats the pair-join dedup shapes for boilerplate.

Gram keys are ``xxhash64`` of the gram text: a 64-bit collision
(~n²/2⁶⁵ for n distinct grams — negligible below ~10¹⁸ grams) could
mark a unique position as covered; accepted and disclosed here in
exchange for shuffling 8-byte keys instead of k-token strings.
Tokenization is the engine's shared BPE-ish ``TOKEN_REGEX`` over
lowercased text, identical to the ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions.text import TOKEN_REGEX


def _gram_instances(docs: DataFrame, text_col: str, id_col: str,
                    k: int) -> DataFrame:
    """(id, p, gh): 0-based window start p and 64-bit gram hash gh for
    every token k-gram. Gram assembly is all JVM-side and the gram TEXT
    never materializes — only its hash does.

    Plan shape matters here: the k-gram hashes must be computed in a
    Project ABOVE the position Generate, referencing the token array as
    a bound attribute. Building the whole hash array inside one
    ``transform`` lambda inlines the tokenization INTO the lambda body
    (CollapseProject substitutes the alias), re-running the regexp for
    every window position — measured 35µs/instance (~8s at sf0.1, 131s
    at 10×) vs ~1µs/instance for this shape: a Generate node is a
    barrier alias substitution cannot cross, so the regexp runs ~2×
    per document (filter + project) instead of ~n_tokens times.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_REGEX), 0)
    base = (docs
            .filter(F.size(toks) >= k)
            .select(F.col(id_col).alias("id"), toks.alias("__toks")))
    return (base
            .select("id", "__toks",
                    F.posexplode(
                        F.sequence(F.lit(1), F.size("__toks") - k + 1))
                    .alias("p", "__start"))
            .select("id", "p",
                    F.xxhash64(
                        F.concat_ws(" ", F.slice(F.col("__toks"),
                                                 F.col("__start"), k)))
                    .alias("gh")))


def _merge_islands(covered: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands merge of covered window starts (id, p) into
    maximal spans: per doc, ordered by p (one window start per position,
    so p is unique within a doc), a gap strictly greater than ``k``
    breaks the island."""
    w = Window.partitionBy("id").orderBy("p")
    brk = F.when(F.lag("p").over(w).isNull()
                 | (F.col("p") - F.lag("p").over(w) > k), 1).otherwise(0)
    islands = (covered
               .withColumn("__brk", brk)
               .withColumn("__island",
                           F.sum("__brk").over(
                               w.rowsBetween(Window.unboundedPreceding, 0))))
    return (islands.groupBy("id", "__island")
            .agg(F.min("p").alias("span_start"),
                 (F.max("p") + k - 1).alias("span_end"),
                 (F.max("p") - F.min("p") + k).alias("n_tokens"))
            .select("id", "span_start", "span_end", "n_tokens"))


def repeated_ngram_spans(docs: DataFrame, text_col: str, id_col: str,
                         k: int = 20, min_docs: int = 2) -> DataFrame:
    """(id, span_start, span_end, n_tokens): maximal token spans whose
    every length-``k`` window occurs in >= ``min_docs`` distinct docs.

    Positions are 0-based token indices into the ``TOKEN_REGEX``
    tokenization of ``lower(text)``; ``span_end`` is inclusive and
    ``n_tokens = span_end - span_start + 1`` (>= k always). Documents
    shorter than ``k`` tokens yield no spans. Two windows merge when
    they overlap or touch (next start <= current end + 1): window
    starts are strictly increasing per doc, so a gap strictly greater
    than ``k`` between consecutive covered starts is the island break.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2 (got {min_docs})")

    inst = _gram_instances(docs, text_col, id_col, k)
    # distinct-doc counts per gram, map-side combined; the leftsemi join
    # back rides the same gh-keyed exchange
    dup = (inst.groupBy("gh")
           .agg(F.count_distinct("id").alias("nd"))
           .filter(F.col("nd") >= min_docs))
    covered = inst.join(dup.select("gh"), "gh", "leftsemi")
    return _merge_islands(covered, k)


def cross_corpus_spans(docs: DataFrame, ref: DataFrame,
                       text_col: str, id_col: str, k: int = 20,
                       ref_text_col: str | None = None,
                       ref_id_col: str | None = None) -> DataFrame:
    """Span-level decontamination surface: maximal token spans of
    ``docs`` whose every length-``k`` window occurs verbatim ANYWHERE in
    ``ref`` (a benchmark/eval corpus). Where ``operators.contamination``
    drops whole documents past an overlap threshold, this locates the
    exact leaked passages — the surgical-removal recipe (excise the
    quoted benchmark item, keep the page).

    Same inverted-index shape as :func:`repeated_ngram_spans` with the
    duplicate test swapped for membership in the reference gram set:
    the ref side reduces to DISTINCT 64-bit gram hashes (benchmark-
    sized, broadcast/Bloom-prunable at corpus scale — contamination is
    rare, so the leftsemi drops almost every instance before the
    shuffle), then the per-doc island merge. Output schema matches
    ``repeated_ngram_spans``; positions index the ``docs`` side.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    inst = _gram_instances(docs, text_col, id_col, k)
    ref_set = (_gram_instances(ref, ref_text_col or text_col,
                               ref_id_col or id_col, k)
               .select("gh").distinct())
    covered = inst.join(ref_set, "gh", "leftsemi")
    return _merge_islands(covered, k)


def strip_repeated_spans(docs: DataFrame, text_col: str, id_col: str,
                         k: int = 20, min_docs: int = 2,
                         out_col: str = "clean_tokens") -> DataFrame:
    """The removal half of ExactSubstr dedup: drop every repeated-span
    token from each document, returning (id, ``out_col``) with the
    surviving tokens re-joined by single spaces (token-level fidelity —
    original whitespace/case are not reconstructed, matching the
    paper's operate-on-token-stream semantics).

    Spans come from ``repeated_ngram_spans`` on the same arguments; the
    per-doc span list is collected into an array (bounded: spans per
    doc <= n_tokens / k) and the kept tokens selected with a single
    JVM-side ``filter`` over the token array — no explode of the
    corpus, no UDF, one join keyed on doc id.
    """
    spans = (repeated_ngram_spans(docs, text_col, id_col, k, min_docs)
             .groupBy("id")
             .agg(F.collect_list(F.struct("span_start", "span_end"))
                  .alias("__spans")))
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_REGEX), 0)
    base = docs.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    kept = F.filter(
        F.transform(F.col("__toks"),
                    lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("__spans"),
            lambda sp: (s["i"] >= sp["span_start"])
            & (s["i"] <= sp["span_end"])))
    return (base.join(spans, "id", "left")
            .select("id",
                    F.when(F.col("__spans").isNull(),
                           F.concat_ws(" ", F.col("__toks")))
                    .otherwise(F.concat_ws(
                        " ", F.transform(kept, lambda s: s["t"])))
                    .alias(out_col)))
