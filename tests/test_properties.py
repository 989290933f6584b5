"""Property-based semantics checks (hypothesis): the cast layer's
reference-exact rules hold for arbitrary inputs, not just fixtures.

One shared SparkSession; each property materializes a small DataFrame, so
examples are capped for runtime.
"""

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.functions.casts import (
    boolean_token_expr,
    inf_nan_to_null,
    string_preserve_expr,
)

_SETTINGS = dict(max_examples=15, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

TRUE_TOKENS = {"true", "1", "yes", "y"}
FALSE_TOKENS = {"false", "0", "no", "n", ""}


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet=st.characters(codec="ascii"), max_size=8),
                min_size=1, max_size=8))
def test_boolean_token_parse_matches_reference_rules(spark, tokens):
    df = spark.createDataFrame([(t,) for t in tokens], "s string")
    got = [r.b for r in df.select(boolean_token_expr(F.col("s")).alias("b")).collect()]
    for t, b in zip(tokens, got):
        norm = t.strip().lower()
        if norm in TRUE_TOKENS:
            assert b is True, (t, b)
        elif norm in FALSE_TOKENS:
            assert b is False, (t, b)
        else:
            assert b is None, (t, b)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(
    st.none(),
    st.sampled_from(["nan", "None", "null", "<NA>", "NaN", "NAN"]),
    st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            max_size=10)),
    min_size=1, max_size=8))
def test_string_preservation_is_identity_and_token_nulling(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out = df.select(
        string_preserve_expr(F.col("s")).alias("keep"),
        string_preserve_expr(F.col("s"), preserve_null_tokens=False).alias("drop"),
    ).collect()
    for v, r in zip(vals, out):
        # default mode: values pass through untouched (reference
        # preserve_string_null_tokens=true)
        assert r.keep == v
        if v is not None and v.strip().lower() in {"nan", "none", "null", "<na>"}:
            assert r.drop is None
        else:
            assert r.drop == v


@settings(**_SETTINGS)
@given(st.lists(st.one_of(
    st.floats(allow_nan=True, allow_infinity=True),
    st.none()),
    min_size=1, max_size=8))
def test_inf_nan_cleanup(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.c for r in df.select(inf_nan_to_null(F.col("x")).alias("c")).collect()]
    for v, c in zip(vals, got):
        if v is None or math.isnan(v) or math.isinf(v):
            assert c is None
        else:
            assert c == v


@settings(**_SETTINGS)
@given(st.lists(st.one_of(st.none(), st.integers(-10**9, 10**9)),
                min_size=1, max_size=6),
       st.integers(1, 8))
def test_format_int_zero_pad_matches_python(spark, vals, width):
    """format('{v:0Nd}') must equal Python str.format with the
    reference's None→0 coercion (migrator.py:923-936)."""
    from data_warehouse_migrate_spark.functions.computed import format_expr

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    expr = format_expr(f"{{v:0{width}d}}", [], ["v"])
    got = [r.s for r in df.select(expr.alias("s")).collect()]
    for v, s in zip(vals, got):
        expected = ("{:0%dd}" % width).format(0 if v is None else v)
        assert s == expected, (v, width, s, expected)


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet=st.characters(codec="ascii",
                                               exclude_characters="\x00"),
                        max_size=12),
                min_size=1, max_size=6),
       st.integers(0, 10), st.integers(0, 10))
def test_substr_is_zero_based_like_reference(spark, vals, start, length):
    """computed substr uses the reference's 0-based str.slice semantics
    (migrator.py:900-905), not SQL's 1-based substring."""
    from data_warehouse_migrate_spark.functions.computed import computed_expr

    df = spark.createDataFrame([(v,) for v in vals], "s string")
    expr = computed_expr(f"substr(s, {start}, {length})", ["s"])
    got = [r.o for r in df.select(expr.alias("o")).collect()]
    for v, o in zip(vals, got):
        assert o == v[start:start + length], (v, start, length, o)


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                max_size=24),
       st.integers(min_value=1, max_value=16),
       st.integers(min_value=1, max_value=3))
def test_pack_sequences_roundtrip_reconstruction(spark, token_counts,
                                                 budget, n_groups):
    """Concat-and-chunk invariant: every document's token interval,
    reconstructed from (seq_id, start_offset, n_tokens) alone, tiles each
    group's token stream exactly — contiguous, non-overlapping, in id
    order from offset 0 — including documents spanning chunk boundaries.
    """
    from data_warehouse_migrate_spark.operators.packing import (
        _MAX_CHUNKS_PER_GROUP,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, "w " * n) for i, n in enumerate(token_counts)],
        "id long, text string")
    rows = pack_sequences(docs, "text", "id", budget=budget,
                          n_groups=n_groups).collect()
    assert len(rows) == len(token_counts)
    by_group: dict = {}
    for r in rows:
        # reconstruct the document's global token start from its slot
        chunk = r.seq_id - r.pack_group * _MAX_CHUNKS_PER_GROUP
        assert 0 <= r.start_offset < budget or (r.start_offset == 0)
        global_start = chunk * budget + r.start_offset
        by_group.setdefault(r.pack_group, []).append(
            (r.id, global_start, r.n_tokens))
    for grp, members in by_group.items():
        members.sort()  # id order
        cursor = 0
        for _id, start, n in members:
            assert start == cursor, (grp, _id, start, cursor)
            cursor += n


@settings(**_SETTINGS)
@given(st.lists(st.lists(st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "omega", "sigma"]),
    max_size=30), min_size=1, max_size=5),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=7))
def test_chunking_covers_every_token_in_order(spark, docs, chunk, overlap):
    """Every token appears in ≥1 chunk; concatenating each chunk's
    NON-overlapped prefix tokens reconstructs the document exactly; no
    chunk is a strict suffix of its predecessor."""
    from data_warehouse_migrate_spark.operators.packing import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id",
                          chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.id, []).append(r)
    for i, words in enumerate(docs):
        rows = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert rows[0].start_token == 0
        rebuilt = []
        for j, r in enumerate(rows):
            toks = r.chunk_text.split(" ") if r.chunk_text else []
            assert len(toks) == r.n_tokens <= chunk
            assert toks == words[r.start_token:r.start_token + chunk]
            # non-overlapped contribution: tokens past the previous end
            prev_end = rows[j - 1].start_token + rows[j - 1].n_tokens if j else 0
            rebuilt.extend(words[max(r.start_token, prev_end):
                                 r.start_token + r.n_tokens])
            if j:
                assert r.start_token + overlap < len(words)  # adds new tokens
        assert rebuilt == words


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=50),
                          st.one_of(st.none(), st.text(
                              alphabet=st.characters(codec="ascii",
                                                     exclude_characters="\x00"),
                              max_size=6))),
                min_size=1, max_size=12),
       st.randoms())
def test_group_checksum_permutation_invariant(spark, rows, rnd):
    """Any permutation + any partitioning yields the identical checksum;
    changing one row's payload changes it."""
    from data_warehouse_migrate_spark.operators.validate import group_checksum

    df = spark.createDataFrame(rows, "k int, v string")
    base = group_checksum(df, [], ["k", "v"]).first()
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled, "k int, v string").repartition(5)
    again = group_checksum(df2, [], ["k", "v"]).first()
    assert (base.n_rows, base.checksum) == (again.n_rows, again.checksum)
