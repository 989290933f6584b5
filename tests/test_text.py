"""Text function layer: stats, lang-id, hashing, shingles — incl. DuckDB
cross-engine determinism for the hash primitives."""

import duckdb
import pytest
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions import text as X


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("Hello  world foo",), ("one",), ("",)], "t string")
    out = df.select(F.size(X.tokens(F.col("t"))).alias("n"),
                    X.token_count(F.col("t")).alias("bpe")).collect()
    assert [r.n for r in out] == [3, 1, 1]   # empty → [''] (size 1, engines agree)
    assert [r.bpe for r in out] == [3, 1, 0]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    out = df.select(X.word_shingles(F.col("t"), 3).alias("s")).collect()
    assert out[0].s == ["a b c", "b c d"]
    assert out[1].s == ["a b"]  # shorter than n → whole text


def test_polyhash_matches_duckdb(spark):
    texts = ["abc", "key agg row scan", "", "Ünïcode test"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    spark_vals = {r.t: r.h for r in df.select("t", X.polyhash(F.col("t")).alias("h")).collect()}
    con = duckdb.connect()
    for t in texts:
        dd = con.execute(
            "SELECT list_reduce(list_concat([CAST(0 AS BIGINT)], "
            "list_transform(string_split(?, ''), x -> CAST(ascii(x) AS BIGINT))), "
            "(a,b) -> (a*31+b) % 1000000007)", [t]).fetchone()[0]
        assert spark_vals[t] == (dd or 0), t


def test_md5_prefix_int_matches_duckdb(spark):
    texts = ["abc", "hello world"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    spark_vals = {r.t: r.h for r in df.select("t", X.md5_prefix_int(F.col("t")).alias("h")).collect()}
    con = duckdb.connect()
    for t in texts:
        dd = con.execute("SELECT CAST(concat('0x', substr(md5(?),1,15)) AS BIGINT)", [t]).fetchone()[0]
        assert spark_vals[t] == dd


def test_text_stats_ranges(docs):
    stats = X.text_stats_exprs(F.col("text"))
    out = docs.select(F.col("doc_id"), *[v.alias(k) for k, v in stats.items()])
    row = out.agg(F.min("punct_ratio"), F.max("punct_ratio"),
                  F.min("n_words"), F.max("avg_word_len")).first()
    assert 0.0 <= row[0] <= row[1] <= 1.0
    assert row[2] >= 1
    assert row[3] < 30
    # n_chars matches the table's own n_chars column
    bad = docs.select((F.length("text") != F.col("n_chars")).alias("x")).filter("x").count()
    assert bad == 0


def test_quality_score_bounded(docs):
    out = docs.select(X.quality_score(F.col("text")).alias("q"))
    row = out.agg(F.min("q"), F.max("q")).first()
    assert 0.0 <= row[0] and row[1] <= 1.0


def test_null_text_propagates_null_stats(spark):
    """Module convention (same as gopher flags): NULL text → NULL for
    every stat, NULL quality, NULL lang. Before the r8 audit, the
    otherwise(0.0) fallbacks fired on NULL comparisons and NULL-skipping
    least() arithmetic gave missing text non-NULL stats and a non-NULL
    quality score — indistinguishable from a real empty document, which
    keeps its honest zeros."""
    df = spark.createDataFrame([(1, None), (2, ""), (3, "the cat")],
                               "id int, text string")
    stats = X.text_stats_exprs(F.col("text"))
    out = {r.id: r for r in df.select(
        "id", *[v.alias(k) for k, v in stats.items()],
        X.quality_score(F.col("text")).alias("q"),
        X.lang_id(F.col("text")).alias("lang")).collect()}
    for field in ("n_chars", "n_words", "n_tokens", "avg_word_len",
                  "punct_ratio", "digit_ratio", "stopword_ratio"):
        assert getattr(out[1], field) is None, field
    assert out[1].q is None and out[1].lang is None
    assert out[2].n_words == 0 and out[2].n_chars == 0    # empty ≠ NULL
    assert out[2].q is not None
    assert out[3].n_words == 2 and out[3].lang == "en"


def test_lang_id_deterministic(spark):
    df = spark.createDataFrame(
        [("the cat and the dog in a house",),
         ("der hund und die katze ist ein tier",),
         ("le chat et la maison dans les champs",),
         ("xyzzy plugh",)], "t string")
    out = [r.l for r in df.select(X.lang_id(F.col("t")).alias("l")).collect()]
    assert out == ["en", "de", "fr", "und"]


def test_simhash_is_stable_and_locality_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different words entirely unrelated text")],
        "id int, t string")
    rows = {r.id: r.s for r in df.select("id", X.simhash32(F.col("t")).alias("s")).collect()}
    # deterministic across invocations
    rows2 = {r.id: r.s for r in df.select("id", X.simhash32(F.col("t")).alias("s")).collect()}
    assert rows == rows2
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(rows[1], rows[2]) < ham(rows[1], rows[3])
    assert all(0 <= v < 2**32 for v in rows.values())


def test_minhash_signature_shape_and_similarity(spark):
    from data_warehouse_migrate_spark.operators.dedup import minhash_signatures
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g x"), (3, "z y x w v u t s")],
        "id int, t string")
    sigs = {r.id: r.sig for r in minhash_signatures(df, "t", "id", n=2, k=16).collect()}
    assert all(len(s) == 16 for s in sigs.values())
    match12 = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    match13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert match12 > match13  # similar docs agree on more minhash slots


def test_redact_pii(spark):
    from data_warehouse_migrate_spark.functions.text import (
        pii_counts_exprs,
        redact_pii,
    )

    rows = [
        (1, "mail a.b-c_d@sub.example.co.uk now"),
        (2, "see https://x.io/p?q=1#f and http://y.org"),
        (3, "host 192.168.0.1 and 10.0.255.7 up"),
        (4, "call +1-555-0100-999 or 5550100123"),
        (5, "clean text with no pii at all"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in df.select(
        "id", *pii_counts_exprs(F.col("text")),
        redact_pii(F.col("text")).alias("clean")).collect()}
    assert out[1].n_email == 1 and out[1].clean == "mail [EMAIL] now"
    assert out[2].n_url == 2 and out[2].clean == "see [URL] and [URL]"
    assert out[3].n_ipv4 == 2 and out[3].clean == "host [IP] and [IP] up"
    assert out[4].n_phone == 2 and out[4].clean == "call [PHONE] or [PHONE]"
    assert out[5].clean == rows[4][1]
    assert sum([out[5].n_url, out[5].n_email, out[5].n_ipv4, out[5].n_phone]) == 0
    assert out[6].clean is None and out[6].n_email is None


def test_lang_id_null_text_is_null(spark):
    from data_warehouse_migrate_spark.functions.text import lang_id

    df = spark.createDataFrame([(1, None), (2, "the and is of")],
                               "id int, text string")
    out = {r.id: r.lang for r in
           df.select("id", lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] is None          # not 'fr' via the when-fallthrough
    assert out[2] == "en"


# ---------------------------------------------------------------------------
# Gopher quality flags (Rae et al. 2021 Table A1)
# ---------------------------------------------------------------------------

def test_gopher_flags_match_registry_oracle(spark, sf_dir):
    """The registry oracle (O_GOPHER_QUALITY, an independent DuckDB
    re-implementation of the rule set) is cell-exact against the Spark
    flags over the real documents table. One source of truth: the same
    pair test_oracle_parity replays — kept here as the text-layer smoke
    so a flags change fails in THIS suite too, next to the rule tests."""
    import pandas as pd

    from data_warehouse_migrate_spark.queries import ORACLES, QUERIES

    sdf = QUERIES["gopher_quality"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    ddf = con.execute(ORACLES["gopher_quality"]).fetchdf()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values("doc_id").reset_index(drop=True)

    a, b = canon(sdf), canon(ddf)
    assert len(a) == len(b) > 0
    assert a.astype(str).equals(b.astype(str))


def test_gopher_flags_edges(spark):
    """Boundary + degenerate inputs: blank text fails word count with
    keep=False; a short all-stopword text passes stopwords but fails word
    count; caps are inclusive (a doc exactly AT the bullet cap passes)."""
    ten_lines = "\n".join(["- item here"] * 9 + ["plain closing line"])
    rows = [(1, ""), (2, "the and of to be that have with"), (3, ten_lines)]
    df = spark.createDataFrame(rows, "id int, text string")
    flags = X.gopher_quality_flags(F.col("text"))
    out = {r.id: r for r in df.select(
        "id", flags["n_words"].alias("n_words"),
        flags["ok_word_count"].alias("okwc"),
        flags["ok_stopwords"].alias("oksw"),
        flags["ok_bullet_lines"].alias("okbl"),
        flags["keep"].alias("keep")).collect()}
    assert out[1].n_words == 0 and out[1].okwc is False and out[1].keep is False
    assert out[2].oksw is True and out[2].okwc is False and out[2].keep is False
    # 9 bullet lines / 10 lines = 0.9 == cap -> inclusive pass
    assert out[3].okbl is True


def test_gopher_keep_is_conjunction(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(F.col("text").isNotNull())
    flags = X.gopher_quality_flags(F.col("text"))
    names = [k for k in flags if k.startswith("ok_")]
    bad = (d.select(flags["keep"].alias("keep"),
                    *[flags[k].alias(k) for k in names])
           .filter(F.col("keep") != F.expr(" AND ".join(names)))
           .count())
    assert bad == 0


def test_clean_corpus_stage_interplay(spark):
    from data_warehouse_migrate_spark.operators.pipeline import clean_corpus

    en = ("the cat and the dog have been to the house of that man "
          "with a big hat and they have seen all of it")
    de = ("der hund und die katze sind nicht mit dem mann "
          "von das haus und auch nicht auf ein berg")
    rows = [
        (1, en),                 # survives everything
        (2, en),                 # exact dup of 1 -> dropped by dedup
        (3, de),                 # german -> dropped by lang filter
        (4, "tiny"),             # fails word-count floor
        (5, None),               # NULL text dropped up front
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_words=5, min_stopword_hits=1, min_alpha_word_ratio=0.5)

    kept = {r.doc_id for r in clean_corpus(df, gopher_kwargs=kw).collect()}
    assert kept == {1}

    # dedup off: both english copies survive
    kept2 = {r.doc_id for r in clean_corpus(
        df, gopher_kwargs=kw, dedup=False).collect()}
    assert kept2 == {1, 2}

    # lang filter off: the german doc still fails the (English) Gopher
    # stopword rule — zeroing that floor lets it through, showing the
    # stages compose independently
    kept3 = {r.doc_id for r in clean_corpus(
        df, gopher_kwargs=dict(kw, min_stopword_hits=0),
        lang_allow=None).collect()}
    assert 3 in kept3 and 5 not in kept3


def test_lang_keep_equals_lang_id_isin(spark, sf_dir):
    """The bound-count lang_keep and the plain lang_id().isin() predicate
    must agree row-for-row (same vote math, different sharing structure)
    — including NULL text (NULL in, NULL out on both sides) and the
    'und' zero-evidence case."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    extra = spark.createDataFrame(
        [(9_000_001, None), (9_000_002, ""), (9_000_003, "zzz qqq xxx"),
         (9_000_004, "der und ist the and of le la"),
         (9_000_005, "le la les et"), (9_000_006, "der die das und")],
        "doc_id long, text string")
    d = d.select("doc_id", "text").unionByName(extra)
    for allow in (("en",), ("en", "de"), ("und",), ("fr",)):
        plain = X.lang_id(F.col("text")).isin(*allow)
        bound = X.lang_keep(F.col("text"), allow)
        # eqNullSafe: both are NULL on NULL text — a plain != would
        # silently skip those rows instead of asserting them equal
        assert d.filter(~plain.eqNullSafe(bound)).count() == 0, allow
    assert d.filter(X.lang_keep(F.col("text"), ("en",))).count() > 0


def test_drop_exact_dups_min_by_matches_join_shape(spark, sf_dir):
    """The one-pass min_by drop_exact_dups must keep exactly the rows the
    r16 groupBy+leftsemi shape kept (same min-id representative per
    normalized text, NULL texts one group) — row-identical on the real
    documents table."""
    from data_warehouse_migrate_spark.functions.text import normalized_text
    from data_warehouse_migrate_spark.operators.dedup import drop_exact_dups

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = F.coalesce(F.md5(normalized_text(F.col("text"))),
                   F.lit("__null_text__"))
    w = d.withColumn("__h", h)
    keep = w.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
    reference = (w.join(keep, ["doc_id", "__h"], "leftsemi").drop("__h")
                 .collect())
    got = drop_exact_dups(d, "text", "doc_id").collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(got, key=key) == sorted(reference, key=key)


def test_gopher_keep_equals_flags_keep(spark, sf_dir):
    """The bound-array gopher_keep and the per-column flags['keep'] must
    agree row-for-row — same rule math, different sharing structure."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(F.col("text").isNotNull())
    flags = X.gopher_quality_flags(F.col("text"), min_words=5,
                                   min_stopword_hits=1)
    bound = X.gopher_keep(F.col("text"), min_words=5, min_stopword_hits=1)
    assert d.filter(flags["keep"] != bound).count() == 0
    assert d.filter(bound).count() > 0   # nonempty keep set at these floors


def test_sql_twins_match_column_builders(spark, sf_dir):
    """r18: the fingerprint operators build their expressions via
    SQL-text twins (one JVM parse) instead of py4j Column builders
    (~180-280 ms of driver round-trips per call). The twins must be
    BIT-IDENTICAL to the Column forms — this pin is what keeps
    signatures/fingerprints computed by either form interchangeable
    (and the DuckDB oracle twins valid) forever. Edge cases: empty
    text, NULL, single word, ragged whitespace, unicode, long text."""
    from data_warehouse_migrate_spark.functions.text import (
        hashed_shingles_sql,
        md5_prefix_int,
        minhash_signature,
        minhash_signature_sql,
        simhash,
        simhash_sql,
        word_shingles,
    )

    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, ""), (3, None), (4, "one"),
            (5, "  padded   whitespace\ttabs  "),
            (6, "Ünïcode tøkens ünïcode agaín mixed CASE Text"),
            (7, "a b"), (8, "x " * 500)]
    df = spark.createDataFrame(rows, "id long, text string")
    col_sh = F.array_distinct(
        F.transform(word_shingles(F.col("text"), 3),
                    lambda s: md5_prefix_int(s)))
    a = df.select("id", col_sh.alias("sh"),
                  simhash(F.col("text"), 60).alias("s60"),
                  simhash(F.col("text"), 7).alias("s7")).collect()
    b = df.select("id", hashed_shingles_sql("text", 3).alias("sh"),
                  simhash_sql("text", 60).alias("s60"),
                  simhash_sql("text", 7).alias("s7")).collect()
    assert a == b

    sets = df.select("id", col_sh.alias("shingles"))
    for k in (16, 5, 1):
        ca = sets.select(
            "id", minhash_signature(F.col("shingles"), k).alias("sig")
        ).collect()
        cb = sets.select(
            "id", minhash_signature_sql("shingles", k).alias("sig")
        ).collect()
        assert ca == cb

    # real corpus: every doc, shingle sizes n=2 and n=3
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for n in (2, 3):
        csh = F.array_distinct(
            F.transform(word_shingles(F.col("text"), n),
                        lambda s: md5_prefix_int(s)))
        ra = d.select("doc_id", csh.alias("sh")).collect()
        rb = d.select("doc_id",
                      hashed_shingles_sql("text", n).alias("sh")).collect()
        key = lambda r: r["doc_id"]  # noqa: E731
        assert sorted(ra, key=key) == sorted(rb, key=key)
