"""Round-4 operators: snapshot delta (incremental migration), corpus
composition (mixture sampling, quality banding), unigram LM scoring,
int8 embedding quantization."""

import math

import pytest
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.operators.delta import (
    apply_delta,
    delta_counts,
    snapshot_delta,
)
from data_warehouse_migrate_spark.operators.quota import (
    mixture_sample,
    quality_band_filter,
)


@pytest.fixture()
def snapshots(spark):
    src = spark.createDataFrame([
        (1, "a", 10.0),   # unchanged
        (2, "b", 20.0),   # update: price changed in dest
        (3, None, 30.0),  # unchanged (null payload both sides — null-safe)
        (4, "d", 40.0),   # insert: missing from dest
        (5, "e", None),   # update: null vs non-null
    ], "k int, tag string, price double")
    dest = spark.createDataFrame([
        (1, "a", 10.0),
        (2, "b", 21.0),
        (3, None, 30.0),
        (5, "e", 5.0),
        (9, "z", 90.0),   # delete: gone from source
    ], "k int, tag string, price double")
    return src, dest


def test_snapshot_delta_classification(snapshots):
    src, dest = snapshots
    out = {r.k: r.change_type
           for r in snapshot_delta(src, dest, ["k"]).collect()}
    assert out == {1: "unchanged", 2: "update", 3: "unchanged",
                   4: "insert", 5: "update", 9: "delete"}


def test_snapshot_delta_payload_and_counts(snapshots):
    src, dest = snapshots
    delta = snapshot_delta(src, dest, ["k"])
    rows = {r.k: r for r in delta.collect()}
    # insert/update rows carry the SOURCE payload; delete rows have the
    # key but NULL payload
    assert rows[4].tag == "d" and rows[4].price == 40.0
    assert rows[5].price is None  # source's value, which is null
    assert rows[9].tag is None and rows[9].price is None
    counts = {r.change_type: r.n_rows for r in delta_counts(delta).collect()}
    assert counts == {"insert": 1, "update": 2, "delete": 1, "unchanged": 2}


def test_apply_delta_reaches_source_state(snapshots):
    src, dest = snapshots
    delta = snapshot_delta(src, dest, ["k"]).filter(
        F.col("change_type") != "unchanged")
    next_dest = apply_delta(dest, delta, ["k"])
    got = sorted(map(tuple, next_dest.collect()))
    want = sorted(map(tuple, src.collect()))
    assert got == want


def test_snapshot_delta_validates(snapshots):
    src, dest = snapshots
    with pytest.raises(ValueError, match="non-empty"):
        snapshot_delta(src, dest, [])
    with pytest.raises(ValueError, match="compare_cols"):
        snapshot_delta(src, dest, ["k"], compare_cols=["nope"])


@pytest.fixture()
def corpus(spark):
    rows = [(i, f"s{i % 4}", "en" if i % 2 else "fr",
             float(i % 100)) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "lang string, score double")


def test_mixture_sample_composition(corpus):
    out = mixture_sample(corpus, "source", "doc_id",
                         weights={"s0": 0.5, "s1": 0.5}, total_rows=60)
    got = {r[0]: r[1] for r in
           out.groupBy("source").count().collect()}
    assert set(got) <= {"s0", "s1"}          # unlisted strata dropped
    # each stratum has 100 rows, target 30 → binomial around 30
    for s in ("s0", "s1"):
        assert 12 <= got.get(s, 0) <= 48
    # deterministic: same call, same rows
    again = mixture_sample(corpus, "source", "doc_id",
                           weights={"s0": 0.5, "s1": 0.5}, total_rows=60)
    assert sorted(r.doc_id for r in out.collect()) == \
           sorted(r.doc_id for r in again.collect())


def test_mixture_sample_small_stratum_keeps_all(corpus):
    # target for s2 = 0.5 * 400 = 200 > its 100 rows → keep everything
    out = mixture_sample(corpus, "source", "doc_id",
                         weights={"s2": 0.5, "s3": 0.5}, total_rows=400)
    got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert got["s2"] == 100 and got["s3"] == 100


def test_mixture_upsample_repeats_undersized_strata(corpus):
    # s0 target = 0.75*400 = 300 over 100 rows → r=3.0: exactly 3 copies
    # of EVERY row (frac 0 → no Bernoulli extras); s1 target 100 = its
    # size → r=1.0, one copy each; downsampled strata unaffected
    out = mixture_sample(corpus, "source", "doc_id",
                         weights={"s0": 0.75, "s1": 0.25}, total_rows=400,
                         upsample=True)
    got = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert got == {"s0": 300, "s1": 100}
    # copy_id enumerates repeats 0..2 per s0 row
    per_doc = {r[0]: sorted(r[1]) for r in
               (out.filter("source = 's0'").groupBy("doc_id")
                .agg(F.collect_list("copy_id")).collect())}
    assert all(v == [0, 1, 2] for v in per_doc.values())
    # fractional ratio: r=1.5 → between 1x and 2x, expectation 150
    frac = mixture_sample(corpus, "source", "doc_id",
                          weights={"s0": 1.0}, total_rows=150,
                          upsample=True)
    n = frac.count()
    assert 100 <= n <= 200 and n != 100 and n != 200
    # without the flag the same recipe caps at the stratum size
    plain = mixture_sample(corpus, "source", "doc_id",
                           weights={"s0": 0.75, "s1": 0.25},
                           total_rows=400)
    assert plain.count() == 200 and "copy_id" not in plain.columns


def test_mixture_sample_validates(corpus):
    with pytest.raises(ValueError):
        mixture_sample(corpus, "source", "doc_id", weights={}, total_rows=10)
    with pytest.raises(ValueError):
        mixture_sample(corpus, "source", "doc_id",
                       weights={"s0": 0.0}, total_rows=10)


def test_quality_band_filter_per_group(corpus):
    out = quality_band_filter(corpus, "score", "lang", keep_top=0.5,
                              id_col="doc_id")
    rows = out.collect()
    n_in = {r[0]: r[1] for r in corpus.groupBy("lang").count().collect()}
    n_out = {}
    for r in rows:
        n_out[r.lang] = n_out.get(r.lang, 0) + 1
        assert 0.5 <= r.q_rank <= 1.0
    # top half per group (±1 for the rank boundary)
    for lang, n in n_in.items():
        assert abs(n_out[lang] - n // 2) <= 1
    # kept rows are the high scorers: min kept score >= max dropped score
    kept = {(r.lang, r.doc_id) for r in rows}
    by_lang: dict = {}
    for r in corpus.collect():
        by_lang.setdefault(r.lang, []).append(r)
    for lang, members in by_lang.items():
        kept_scores = [m.score for m in members if (lang, m.doc_id) in kept]
        drop_scores = [m.score for m in members if (lang, m.doc_id) not in kept]
        assert min(kept_scores) >= max(drop_scores)


def test_quality_band_filter_validates(corpus):
    with pytest.raises(ValueError, match="keep_top"):
        quality_band_filter(corpus, "score", "lang", keep_top=0.0)


def test_unigram_lm_hand_checked(spark):
    from data_warehouse_migrate_spark.functions.lm import (
        doc_unigram_logprob,
        unigram_model,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "")],
        "doc_id long, text string")
    model = {r.token: (r.n, r.logp)
             for r in unigram_model(docs, "text").collect()}
    # corpus tokens: a a b a b -> a:3, b:2, total 5
    assert model["a"][0] == 3 and model["b"][0] == 2
    assert model["a"][1] == round(math.log10(3 / 5), 6)
    assert model["b"][1] == round(math.log10(2 / 5), 6)
    out = {r.id: r for r in
           doc_unigram_logprob(docs, "text", "doc_id").collect()}
    la, lb = model["a"][1], model["b"][1]
    assert out[1].n_tokens == 3
    micro = round(la * 1e6) * 2 + round(lb * 1e6)
    assert out[1].avg_logprob == round(micro / 3e6, 6)
    assert out[3].n_tokens == 0 and out[3].avg_logprob is None


def test_unigram_lm_external_model_oov(spark):
    from data_warehouse_migrate_spark.functions.lm import (
        doc_unigram_logprob,
        unigram_model,
    )

    ref = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    model = unigram_model(ref, "text")
    other = spark.createDataFrame([(7, "a zzz")], "doc_id long, text string")
    # with a penalty: OOV token contributes oov_logp
    out = doc_unigram_logprob(other, "text", "doc_id", model=model,
                              oov_logp=-9.0).collect()[0]
    la = round(math.log10(1 / 2), 6)
    assert out.n_tokens == 2
    assert out.avg_logprob == round((round(la * 1e6) + -9_000_000) / 2e6, 6)
    # without: OOV rows drop from the mean
    out2 = doc_unigram_logprob(other, "text", "doc_id",
                               model=model).collect()[0]
    assert out2.n_tokens == 1 and out2.avg_logprob == la


def test_quantize_int8_roundtrip(spark):
    from data_warehouse_migrate_spark.functions.vectors import (
        quantization_error,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]),
         (2, [0.0, 0.0, 0.0, 0.0]),
         (3, [-2.0, 2.0, 1.0, -1.0])],
        "vec_id long, embedding array<double>")
    quant = quantize_int8(F.col("embedding"))
    out = {r.vec_id: r for r in df.select(
        "vec_id", quant.alias("qz"),
        quantization_error(F.col("embedding"), quant).alias("err")).collect()}
    assert out[1].qz.q == [127, -64, 32, 0]   # round(±x/scale)
    assert abs(out[1].qz.scale - 1.0 / 127) < 1e-12
    assert out[2].qz.scale == 0.0 and out[2].qz.q == [0, 0, 0, 0]
    assert out[2].err == 0.0
    assert out[3].qz.q == [-127, 127, 64, -64]
    for r in out.values():                    # codes stay in int8 range
        assert all(-127 <= q <= 127 for q in r.qz.q)
        assert r.err < 0.01                   # <1% L2 error at these dims


def test_curriculum_buckets_exact_and_approx(spark):
    from data_warehouse_migrate_spark.operators.quota import curriculum_buckets

    df = spark.createDataFrame([(i, float(i)) for i in range(100)],
                               "id long, score double")
    out = {r.id: r.bucket for r in
           curriculum_buckets(df, "score", n_buckets=4).collect()}
    # quartile cuts at 24.75/49.5/74.25 -> 25/25/25/25 split
    assert [sum(1 for b in out.values() if b == k) for k in range(4)] == \
        [25, 25, 25, 25]
    assert out[0] == 0 and out[99] == 3
    # approx path: same monotone structure, equal-width-ish split
    ap = {r.id: r.bucket for r in
          curriculum_buckets(df, "score", n_buckets=4,
                             approx=True).collect()}
    assert all(ap[i] <= ap[j] for i, j in zip(range(99), range(1, 100)))
    assert set(ap.values()) == {0, 1, 2, 3}

    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        curriculum_buckets(df, "score", n_buckets=1)


def test_pmi_collocations_finds_planted_phrase(spark):
    from data_warehouse_migrate_spark.functions.lm import pmi_collocations

    # "neural network" always co-occurs; filler words are independent
    docs = [(i, "neural network " + " ".join(
        ["alpha", "beta", "gamma", "delta"][i % 4] for _ in range(3)))
        for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_collocations(df, "text", min_count=5, k=10).collect()
    top = (out[0].w1, out[0].w2)
    assert top == ("neural", "network")
    assert out[0].c_ab == 20
    # monotone non-increasing pmi, deterministic ordering
    pmis = [r.pmi for r in out]
    assert pmis == sorted(pmis, reverse=True)


def test_snapshot_delta_null_business_keys(spark):
    """NULL keys must classify correctly (presence markers, not key
    nullability) and apply_delta must remove them null-safely — the
    review repro: a NULL-key update previously duplicated on every sync."""
    from data_warehouse_migrate_spark.operators.delta import (
        apply_delta,
        snapshot_delta,
    )

    src = spark.createDataFrame([(None, "x", 9.0), (1, "a", 1.0)],
                                "k int, s string, v double")
    dest = spark.createDataFrame([(None, "x", 1.0), (1, "a", 1.0)],
                                 "k int, s string, v double")
    delta = snapshot_delta(src, dest, ["k"])
    by_key = {r.k: r.change_type for r in delta.collect()}
    assert by_key == {None: "update", 1: "unchanged"}
    nxt = apply_delta(
        dest, delta.filter(F.col("change_type") != "unchanged"), ["k"])
    rows = sorted(((r.k, r.v) for r in nxt.collect()),
                  key=lambda t: (t[0] is None, t[0]))
    assert rows == [(1, 1.0), (None, 9.0)]   # exactly one NULL-key row


def test_token_budget_sample_semantics(spark):
    from pyspark.sql import functions as F

    from data_warehouse_migrate_spark.operators.quota import (
        token_budget_sample,
    )

    rows = [(i, "a" if i < 6 else "b", 100) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")

    # budget 250 for 'a': hash-ordered docs keep until cum_before < 250 —
    # exactly 3 docs (0, 100, 200 before-counts), crossing once
    out = token_budget_sample(df, "source", "doc_id", "n_tok",
                              budgets={"a": 250})
    kept = out.collect()
    assert all(r.source == "a" for r in kept)      # 'b' has no budget -> dropped
    assert len(kept) == 3
    # determinism: same set every run
    again = {r.doc_id for r in token_budget_sample(
        df, "source", "doc_id", "n_tok", budgets={"a": 250}).collect()}
    assert {r.doc_id for r in kept} == again

    # default budget applies to strata missing from the dict
    out2 = token_budget_sample(df, "source", "doc_id", "n_tok",
                               budgets={"a": 250}, default_budget=100)
    by_src = {}
    for r in out2.collect():
        by_src.setdefault(r.source, 0)
        by_src[r.source] += 1
    assert by_src == {"a": 3, "b": 1}   # b keeps exactly one 100-token doc

    # zero budget keeps nothing; oversized budget keeps everything
    assert token_budget_sample(df, "source", "doc_id", "n_tok",
                               default_budget=0).count() == 0
    assert token_budget_sample(df, "source", "doc_id", "n_tok",
                               default_budget=10_000).count() == 10

    # missing both budget sources raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        token_budget_sample(df, "source", "doc_id", "n_tok")

    # NULL token counts don't poison the running sum
    df2 = spark.createDataFrame(
        [(1, "a", None), (2, "a", 100), (3, "a", 100)],
        "doc_id long, source string, n_tok long")
    n = token_budget_sample(df2, "source", "doc_id", "n_tok",
                            default_budget=150).count()
    assert n >= 2   # the NULL doc contributes 0 tokens wherever it sorts
