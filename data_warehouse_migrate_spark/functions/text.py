"""Text-analysis expressions for LLM-data pipelines: tokenization, shingles,
deterministic hashing, quality scoring, language ID, fingerprinting.

Everything is a built-in Column expression (JVM-side, codegen) — no Python
UDFs — and every function has an exact ANSI-SQL twin runnable by DuckDB
(used by the correctness oracle). Determinism rules:
  * ``polyhash``: 31-polynomial over unicode code points mod 1e9+7 —
    identical in Spark (``aggregate``/``ascii``) and DuckDB
    (``list_reduce``/``ascii``).
  * ``md5_prefix_int``: first 15 hex chars of md5 → int64 (60 bits, never
    overflows) — identical via ``conv`` (Spark) / ``CAST('0x…')`` (DuckDB).

Beyond-reference operators (the reference has no text functions at all);
designed per SURVEY.md §7.3.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_MOD = 1_000_000_007
POLY_BASE = 31

# fixed per-language stopword lists for the n-gram language heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
}

# a BPE-ish word/number/symbol segmentation used for token counting
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased trimmed text. Empty text yields
    [''] (both engines agree)."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col: Column) -> Column:
    """BPE-ish token count: words, numbers, and individual symbols."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle strings; texts shorter than n words yield the
    whole text as a single shingle.

    The token array is LET-BOUND via a single-element-array transform so
    the per-shingle lambda references it as a bound lambda variable.
    Referencing the ``tokens`` expression tree directly inside the
    lambda (the r8 shape) made Catalyst inline the full-text regex
    split into the lambda body — re-evaluated PER SHINGLE ELEMENT,
    O(words²) regex work per document. The binding makes it one split
    per row: measured 6× on the sf0.1 shingle-explode path (4.27s →
    0.71s), and it is the difference between the shingle family
    scaling with corpus size vs corpus size × document length at
    100 TB. Same construction as the round-7 CollapseProject fix in
    ``operators/spans.py``, expressed inside a single Column."""
    return F.transform(
        F.array(tokens(col)),
        lambda t: F.when(
            F.size(t) < n, F.array(F.array_join(t, " "))
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - n + 1),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            )
        ))[0]


def polyhash(col: Column) -> Column:
    """31-polynomial rolling hash over code points mod 1e9+7 (document
    fingerprint primitive; deterministic across engines)."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * POLY_BASE + x) % F.lit(POLY_MOD),
    )


def md5_prefix_int(col: Column) -> Column:
    """First 60 bits of md5 as int64 — a strong deterministic hash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def normalized_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace, trim."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


SIMHASH_BITS = 60  # md5-prefix token hashes carry exactly 60 meaningful bits


def simhash(col: Column, bits: int = SIMHASH_BITS) -> Column:
    """``bits``-wide SimHash over whitespace tokens with md5-prefix token
    hashes (60 usable bits — polyhash mod 1e9+7 only fills ~30 bits, which
    makes fingerprints cluster and near-pair search quadratic).

    For each bit j: sum over tokens of ±1 by bit j of the token hash; bit
    set iff the sum is positive. Single-pass: token hashes are the input of
    ONE ``aggregate`` with an array-of-votes accumulator, so each token is
    hashed exactly once per row (a per-bit aggregate would re-hash every
    token ``bits`` times). Bit tests use literal power-of-two masks —
    pure array math, expressible identically in DuckDB for the oracle.
    """
    assert 0 < bits <= 60
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    tok_hashes = F.transform(tokens(col), lambda t: md5_prefix_int(t))
    votes = F.aggregate(
        tok_hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc, powers,
            lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1)),
    )
    return F.aggregate(
        F.zip_with(votes, powers,
                   lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def simhash32(col: Column) -> Column:
    """32-bit SimHash (back-compat shorthand for ``simhash(col, 32)``)."""
    return simhash(col, 32)


# MinHash: k fixed affine permutations (a_i*h + b_i) mod p over shingle hashes.
# Constants are arbitrary-but-fixed odd multipliers (no runtime randomness —
# resumability + cross-engine determinism).
MINHASH_A = (1579, 2719, 3359, 4463, 5519, 6689, 7717, 8837,
             9739, 10847, 11941, 13043, 14159, 15269, 16381, 17477)
MINHASH_B = (401, 7919, 1201, 9601, 2801, 11003, 4001, 12413,
             5209, 13807, 6397, 15013, 7591, 16217, 8783, 17401)


def minhash_signature(shingle_hashes: Column, k: int = 16) -> Column:
    """Array of k min-hash values over an array<long> of shingle hashes.

    Single-pass: ONE ``aggregate`` over the shingle array with a k-element
    running-min accumulator, so the (possibly expensive) shingle-hash
    subtree is referenced exactly once — k separate array_min expressions
    made Catalyst inline that subtree k times (measured 6× slower).

    Hashes are reduced mod 1e9+7 BEFORE the affine permutation: 60-bit
    inputs times a 5-digit multiplier would overflow int64 — Spark would
    silently wrap while DuckDB raises, so the oracle twin requires the
    reduction on both sides."""
    assert k <= len(MINHASH_A)
    A = F.array(*[F.lit(a).cast("long") for a in MINHASH_A[:k]])
    B = F.array(*[F.lit(b).cast("long") for b in MINHASH_B[:k]])
    return F.aggregate(
        shingle_hashes,
        F.array_repeat(F.lit(POLY_MOD).cast("long"), k),
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(A, B, lambda a, b: ((h % F.lit(POLY_MOD)) * a + b)
                       % F.lit(POLY_MOD)),
            lambda x, y: F.least(x, y)),
    )


# ---------------------------------------------------------------------------
# SQL-text twins of the fingerprint expression builders (r18, guide §1.2
# driver-bound work). The Column builders above cost 180-280 ms of
# py4j round-trips PER CALL at the default sizes (measured: simhash
# bits=60 → 279 ms, minhash k=16 → 180 ms) — pure driver latency every
# banding/fingerprint operator paid on every invocation. Emitting the
# SAME expression as one SQL string parses JVM-side in <1 ms (the
# vectors.band_keys_sql precedent). Twins take plain COLUMN NAMES (all
# in-tree operator callers pass names); expression-valued inputs keep
# the Column builders. Outputs are pinned BIT-IDENTICAL to the Column
# forms in tests/test_text.py::test_sql_twins_match_column_builders —
# and transitively by the cell-exact DuckDB oracle replay, since every
# fingerprint query's oracle hashes these columns.
# ---------------------------------------------------------------------------

def _tokens_sql(col_sql: str) -> str:
    # twin of tokens(): split(lower(trim(c)), '\s+') — the SQL literal
    # needs the backslash doubled ('\\s+' parses to \s+)
    return f"split(lower(trim({col_sql})), '\\\\s+')"


def _md5_prefix_int_sql(s: str) -> str:
    # twin of md5_prefix_int()
    return f"CAST(conv(substring(md5({s}), 1, 15), 16, 10) AS BIGINT)"


def _word_shingles_sql_text(col_name: str, n: int) -> str:
    # twin of word_shingles(): same let-bound single-element-array form
    # (the binding is load-bearing — see the Column builder's docstring)
    t = _tokens_sql(f"`{col_name}`")
    return (f"transform(array({t}), "
            f"t -> CASE WHEN size(t) < {n} THEN array(array_join(t, ' ')) "
            f"ELSE transform(sequence(1, size(t) - {n} + 1), "
            f"i -> array_join(slice(t, i, {n}), ' ')) END)[0]")


def hashed_shingles_sql(col_name: str, n: int) -> Column:
    """``array_distinct(transform(word_shingles(col, n), md5_prefix_int))``
    as one JVM-parsed expression — the shared shingle-set form of the
    Jaccard/MinHash/contamination family."""
    sh = _word_shingles_sql_text(col_name, n)
    return F.expr(f"array_distinct(transform({sh}, "
                  f"s -> {_md5_prefix_int_sql('s')}))")


def minhash_signature_sql(arr_name: str, k: int = 16) -> Column:
    """Twin of :func:`minhash_signature` over an array<long> COLUMN."""
    assert k <= len(MINHASH_A)
    A = ", ".join(f"CAST({a} AS BIGINT)" for a in MINHASH_A[:k])
    B = ", ".join(f"CAST({b} AS BIGINT)" for b in MINHASH_B[:k])
    return F.expr(
        f"aggregate(`{arr_name}`, "
        f"array_repeat(CAST({POLY_MOD} AS BIGINT), {k}), "
        f"(acc, h) -> zip_with(acc, zip_with(array({A}), array({B}), "
        f"(a, b) -> ((h % {POLY_MOD}) * a + b) % {POLY_MOD}), "
        f"(x, y) -> least(x, y)))")


def simhash_sql(col_name: str, bits: int = SIMHASH_BITS) -> Column:
    """Twin of :func:`simhash` over a text COLUMN."""
    assert 0 < bits <= 60
    powers = ("array(" + ", ".join(f"CAST({1 << j} AS BIGINT)"
                                   for j in range(bits)) + ")")
    tokh = (f"transform({_tokens_sql(f'`{col_name}`')}, "
            f"t -> {_md5_prefix_int_sql('t')})")
    votes = (f"aggregate({tokh}, array_repeat(CAST(0 AS BIGINT), {bits}), "
             f"(acc, h) -> zip_with(acc, {powers}, "
             f"(a, p) -> a + (CASE WHEN (h & p) != 0 THEN 1 ELSE -1 END)))")
    return F.expr(
        f"aggregate(zip_with({votes}, {powers}, "
        f"(v, p) -> CASE WHEN v > 0 THEN p ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (a, x) -> a + x)")


# ---------------------------------------------------------------------------
# Quality / stats expressions (all arithmetic, oracle-twinned)
# ---------------------------------------------------------------------------

def text_stats_exprs(col: Column) -> dict[str, Column]:
    """Standard quality-signal columns for a text column.

    NULL text propagates NULL through every stat (the module's uniform
    convention, same as :func:`gopher_quality_flags`). The explicit
    NULL gates are load-bearing: without them the ``otherwise(0.0)``
    fallbacks fire on NULL comparisons (NULL > 0 is false, not NULL),
    so a missing document reported the same zero ratios as a real empty
    one — silently indistinguishable instead of honestly NULL (r8
    audit)."""
    notnull = col.isNotNull()
    n_chars = F.length(col)
    toks = tokens(col)
    n_words = (F.when(~notnull, F.lit(None))
               .when(F.trim(col) == "", F.lit(0))
               .otherwise(F.size(toks)))
    n_alpha = F.length(F.regexp_replace(col, r"[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", ""))
    stop_all = tuple(w for ws in LANG_STOPWORDS.values() for w in ws)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop_all)))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_words": n_words.cast("bigint"),
        "n_tokens": F.when(notnull, token_count(col)).cast("bigint"),
        "avg_word_len": F.round(
            F.when(n_words > 0, (n_alpha + n_digit) / n_words)
            .when(notnull, F.lit(0.0)), 6),
        "punct_ratio": F.round(
            F.when(n_chars > 0, n_punct / n_chars)
            .when(notnull, F.lit(0.0)), 6),
        "digit_ratio": F.round(
            F.when(n_chars > 0, n_digit / n_chars)
            .when(notnull, F.lit(0.0)), 6),
        "stopword_ratio": F.round(
            F.when(n_words > 0, n_stop / n_words)
            .when(notnull, F.lit(0.0)), 6),
    }


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]: rewards mid-length docs with low
    punctuation/digit noise and some stopword mass (heuristic,
    deterministic). NULL text scores NULL (module convention) — without
    the gate, NULL-skipping ``least``/``when``-fallback arithmetic
    silently produced a non-NULL score for missing text.
    """
    s = text_stats_exprs(col)
    length_term = F.least(s["n_words"] / F.lit(50.0), F.lit(1.0))
    clean_term = F.lit(1.0) - F.least(s["punct_ratio"] * 4 + s["digit_ratio"] * 2, F.lit(1.0))
    stop_term = F.least(s["stopword_ratio"] * 5, F.lit(1.0))
    return F.when(col.isNotNull(), F.round(
        0.5 * length_term + 0.3 * clean_term + 0.2 * stop_term, 6))


def lang_id(col: Column) -> Column:
    """Stopword-vote language heuristic: argmax of per-language stopword
    counts over whitespace tokens; zero evidence for every language →
    'und' (undetermined). Ties resolve by the fixed precedence en ≻ de ≻
    fr (>= comparisons in that order), keeping the argmax deterministic."""
    toks = tokens(col)

    def _counter(ws):
        # NB: single-arg lambda only — PySpark treats 2-arg lambdas in
        # higher-order functions as (element, index)
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    counts = {lang: _counter(ws) for lang, ws in LANG_STOPWORDS.items()}
    en, de, fr = counts["en"], counts["de"], counts["fr"]
    return (
        # NULL text first: every count is NULL, every when() below would
        # evaluate NULL→false and fall through to the 'fr' fallback —
        # NULL in, NULL out instead
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when((en == 0) & (de == 0) & (fr == 0), F.lit("und"))
        .when((en >= de) & (en >= fr), F.lit("en"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def lang_keep(col: Column, allow: tuple[str, ...]) -> Column:
    """``lang_id(col).isin(*allow)`` with the token split and the three
    stopword counts bound ONCE per row, for use inside a fused FILTER.

    Filter predicates get no subexpression elimination, so the plain
    ``lang_id(col).isin(...)`` predicate inlines the whitespace-split
    subtree into every count reference — the r16 ``clean_corpus`` plan
    shows ~8 ``split(lower(trim(text)))`` evaluations per row for the
    language gate alone. Binding the token array via
    ``transform(array(...))[0]`` (the :func:`gopher_keep` construction)
    and then the three counts via a second bound struct makes it one
    split + one count per language per row. Identical values to
    ``lang_id(col).isin(*allow)`` for every input incl. NULL (NULL in,
    NULL out — asserted in tests/test_text.py)."""
    def from_counts(c: Column) -> Column:
        en, de, fr = c["en"], c["de"], c["fr"]
        lang = (F.when((en == 0) & (de == 0) & (fr == 0), F.lit("und"))
                .when((en >= de) & (en >= fr), F.lit("en"))
                .when(de >= fr, F.lit("de"))
                .otherwise(F.lit("fr")))
        return lang.isin(*allow)

    def _counter(t: Column, ws: tuple[str, ...]) -> Column:
        # NB: single-arg lambda only — PySpark treats 2-arg lambdas in
        # higher-order functions as (element, index), so the usual
        # default-arg capture (lambda x, ws=ws: ...) breaks here
        return F.size(F.filter(t, lambda x: x.isin(*ws)))

    def from_toks(t: Column) -> Column:
        counts = F.struct(*[_counter(t, ws).alias(lang)
                            for lang, ws in LANG_STOPWORDS.items()])
        return F.transform(F.array(counts), from_counts)[0]

    # NULL text first: lang_id yields NULL, NULL.isin(...) is NULL —
    # mirror that instead of letting the counts see a NULL array
    return F.when(col.isNotNull(),
                  F.transform(F.array(tokens(col)), from_toks)[0])


def duplicate_token_fraction(col: Column) -> Column:
    """Share of tokens that are repeats of an earlier token — the
    token-level analogue of Gopher's duplicate-line fraction (Rae et al.
    2021, public quality-filter heuristics). Rounded to 6dp (the ratio is
    a small-denominator rational — identical across engines). Pure per-row
    array math, no shuffle.

    Empty/blank text: ``tokens`` yields the single token ``''`` (never an
    empty array — the DuckDB oracle's split agrees), so the fraction is
    0.0 (one distinct token, no repeats). NULL text propagates NULL."""
    toks = tokens(col)
    return F.round(F.lit(1.0) -
                   F.size(F.array_distinct(toks)) / F.size(toks), 6)


def top_ngram_fraction(col: Column, n: int = 2) -> Column:
    """Fraction of all word n-grams taken by the single most frequent one
    (Gopher's top-n-gram repetition filter). Computed per row in
    O(t log t): sort the shingle array, then ONE ``aggregate`` pass tracks
    the longest equal-run — no per-distinct-gram rescan (the naive
    distinct×filter form is O(t²) per row, which a 100 TB corpus of long
    documents cannot afford).

    Empty/blank text: ``tokens`` yields the single token ``''`` (never an
    empty array — the DuckDB oracle's split agrees), so the single
    ''-shingle IS the top n-gram and the fraction is 1.0 — meaning
    ``q_doc_repetition`` marks empty documents keep=False, the right
    outcome for a quality filter. NULL text propagates NULL."""
    grams = F.sort_array(word_shingles(col, n))

    def _step(acc, g):
        run = (F.when(acc["prev"].isNull() | (acc["prev"] != g), F.lit(1))
               .otherwise(acc["run"] + 1))
        return F.struct(g.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    best = F.aggregate(
        grams,
        F.struct(F.lit(None).cast("string").alias("prev"),
                 F.lit(0).alias("run"), F.lit(0).alias("best")),
        _step,
        lambda acc: acc["best"])
    return F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
        F.round(best / F.size(grams), 6))


# ---------------------------------------------------------------------------
# PII scrubbing (standard pre-training hygiene: redact contact strings
# before anything downstream sees the text). Pure regexp_replace chains —
# JVM expressions with exact DuckDB twins; patterns stay within the
# Java-regex ∩ RE2 subset (character classes, \b, bounded repeats) so both
# engines match identically.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # applied in declaration order: URLs first (they may contain @ or
    # digit runs that the later patterns would otherwise bite into)
    "url": (r"https?://[^\s]+", "[URL]"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    "phone": (r"\+?[0-9][0-9-]{6,}[0-9]", "[PHONE]"),
}


def pii_counts_exprs(col: Column) -> list[Column]:
    """One ``n_{kind}`` count column per PII pattern (counted on the RAW
    text, before any replacement disturbs overlapping matches)."""
    return [F.regexp_count(col, F.lit(pat)).alias(f"n_{kind}")
            for kind, (pat, _) in PII_PATTERNS.items()]


def redact_pii(col: Column) -> Column:
    """Text with every PII match replaced by its ``[KIND]`` token —
    a fixed chain of 4 ``regexp_replace`` (all-occurrence) expressions,
    order as declared in ``PII_PATTERNS``."""
    out = col
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


# Gopher rule-based quality filter (Rae et al. 2021 §A1.1.1, public):
# the canonical pre-training document gate. The stopword rule uses the
# paper's own word list.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(col: Column,
                         min_words: int = 50, max_words: int = 100_000,
                         min_avg_word_len: float = 3.0,
                         max_avg_word_len: float = 10.0,
                         max_symbol_ratio: float = 0.1,
                         max_ellipsis_line_ratio: float = 0.3,
                         max_bullet_line_ratio: float = 0.9,
                         min_alpha_word_ratio: float = 0.8,
                         min_stopword_hits: int = 2) -> dict[str, Column]:
    """Gopher's published rule set as per-row JVM expressions — one
    boolean column per rule plus the conjunction ``keep``. Pure
    projection: at 100 TB this is a map-side filter fused into the scan.

    Rules (Rae et al. 2021, Table A1): word count in [min,max]; mean word
    length in [min,max]; (# + …) symbol-to-word ratio ≤ cap; ≤30% of
    lines ending in an ellipsis; ≤90% of lines starting with a bullet;
    ≥80% of words containing an alphabetic character; at least 2 of the
    paper's 8 stopwords present. Every cap is INCLUSIVE (uniform ``<=``
    boundary convention; floors are inclusive ``>=``). Ratios round at
    6dp so the DuckDB twin in tests/test_text.py compares cell-exact;
    blank text fails the word-count rule (keep=False); NULL text
    propagates NULL through every flag.

    Per-column form: each returned Column computes only ITS metric —
    right for projections that select several flags side by side (one
    split per selected column, same as any projection). For a fused
    FILTER on the conjunction use :func:`gopher_keep`, which binds the
    splits once (filter predicates get no subexpression elimination, so
    ``flags["keep"]`` there would split the text once per rule).
    """
    return _gopher_rules(
        col, tokens(col), F.split(col, "\n"),
        min_words=min_words, max_words=max_words,
        min_avg_word_len=min_avg_word_len,
        max_avg_word_len=max_avg_word_len,
        max_symbol_ratio=max_symbol_ratio,
        max_ellipsis_line_ratio=max_ellipsis_line_ratio,
        max_bullet_line_ratio=max_bullet_line_ratio,
        min_alpha_word_ratio=min_alpha_word_ratio,
        min_stopword_hits=min_stopword_hits)


def _gopher_rules(col: Column, tk: Column, ln: Column,
                  min_words: int = 50, max_words: int = 100_000,
                  min_avg_word_len: float = 3.0,
                  max_avg_word_len: float = 10.0,
                  max_symbol_ratio: float = 0.1,
                  max_ellipsis_line_ratio: float = 0.3,
                  max_bullet_line_ratio: float = 0.9,
                  min_alpha_word_ratio: float = 0.8,
                  min_stopword_hits: int = 2) -> dict[str, Column]:
    """Rule math shared by :func:`gopher_quality_flags` (unbound
    token/line expressions) and :func:`gopher_keep` (lambda-bound
    arrays) — ``tk``/``ln`` may be either."""
    n_words = F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tk))
    avg_wlen = F.round(
        F.when(n_words > 0,
               F.aggregate(tk, F.lit(0).cast("bigint"),
                           lambda acc, t: acc + F.length(t)) / n_words)
        .otherwise(F.lit(0.0)), 6)
    n_hash = F.size(F.regexp_extract_all(col, F.lit(r"#"), 0))
    n_ellipsis = (F.size(F.regexp_extract_all(col, F.lit(r"\.\.\."), 0))
                  + F.size(F.regexp_extract_all(col, F.lit("…"), 0)))
    symbol_ratio = F.round(
        F.when(n_words > 0, (n_hash + n_ellipsis) / n_words)
        .otherwise(F.lit(0.0)), 6)
    n_lines = F.size(ln)
    ellipsis_lines = F.size(F.filter(
        ln, lambda x: x.rlike(r"(\.\.\.|…)\s*$")))
    bullet_lines = F.size(F.filter(
        ln, lambda x: x.rlike(r"^\s*([•‣▪-]\s)")))
    ellipsis_line_ratio = F.round(
        F.when(n_lines > 0, ellipsis_lines / n_lines)
        .otherwise(F.lit(0.0)), 6)
    bullet_line_ratio = F.round(
        F.when(n_lines > 0, bullet_lines / n_lines)
        .otherwise(F.lit(0.0)), 6)
    alpha_words = F.size(F.filter(tk, lambda t: t.rlike("[a-z]")))
    alpha_word_ratio = F.round(
        F.when(n_words > 0, alpha_words / n_words)
        .otherwise(F.lit(0.0)), 6)
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        lambda w: F.array_contains(tk, w)))
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_word_len": (avg_wlen >= min_avg_word_len)
                       & (avg_wlen <= max_avg_word_len),
        "ok_symbols": symbol_ratio <= max_symbol_ratio,
        "ok_ellipsis_lines":
            ellipsis_line_ratio <= max_ellipsis_line_ratio,
        "ok_bullet_lines": bullet_line_ratio <= max_bullet_line_ratio,
        "ok_alpha_words": alpha_word_ratio >= min_alpha_word_ratio,
        "ok_stopwords": stop_hits >= min_stopword_hits,
    }
    keep = None
    for f in flags.values():
        keep = f if keep is None else (keep & f)
    fields = {"n_words": n_words.cast("bigint"),
              "avg_word_len": avg_wlen,
              "symbol_ratio": symbol_ratio,
              "alpha_word_ratio": alpha_word_ratio,
              "stopword_hits": stop_hits.cast("int")}
    fields.update(flags)
    fields["keep"] = keep
    return fields


def gopher_keep(col: Column, **thresholds) -> Column:
    """The :func:`gopher_quality_flags` ``keep`` conjunction with the
    token/line splits bound ONCE per row, for use inside a fused FILTER:
    ``transform(array(struct(toks, lines)), x -> …)[0]`` makes every
    rule reference the same bound arrays instead of re-inlining the
    split subtree (FilterExec predicates get no subexpression
    elimination — measured ~2x on the composed
    ``operators.pipeline.clean_corpus`` gate at sf0.1). Identical values
    to ``gopher_quality_flags(col, **thresholds)["keep"]`` (asserted in
    tests/test_text.py)."""
    def bound_keep(x: Column) -> Column:
        return _gopher_rules(col, x["t"], x["l"], **thresholds)["keep"]

    return F.transform(
        F.array(F.struct(tokens(col).alias("t"),
                         F.split(col, "\n").alias("l"))),
        bound_keep)[0]
