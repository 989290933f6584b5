"""Degenerate-input sweep: every registry query runs against an EMPTY
(schema-preserving, zero-row) copy of the testdata tables.

Contract: empty in → empty (or zero-row aggregate) out, EXCEPT the two
operators whose semantics genuinely cannot be defined on an empty
corpus — they must raise their documented typed error, not an opaque
internal one. The r8 sweep that introduced this test caught three
opaque crashes (mixture upsample's unresolved copy_id, semantic_dedup's
VOID argmax over zero centroids, the stream-dedup horizon's
int(None)).

Runtime note: ~5 min — one pass over all 125 queries on empty inputs
(the JDBC/streaming queries dominate; everything else is sub-second).
Marked ``seal`` (r13 verdict item 6): deselect with ``-m "not seal"``
for the development fast lane; the full suite remains the commit gate.
"""

import pytest

pytestmark = pytest.mark.seal


# queries whose EMPTY-corpus contract is a documented, typed refusal
EXPECTED_TYPED_ERRORS = {
    # percentile cut points over zero non-null scores are undefined
    "curriculum_buckets": (ValueError, "no non-null"),
    # k-means over an empty corpus has no centroids to train
    "embedding_ivf": (ValueError, "empty corpus"),
}


def _tiny_sf_dir(spark, tmp_path_factory, n_rows: int) -> str:
    src = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp(f"sf_{n_rows}row"))
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        (spark.read.parquet(f"{src}/{t}.parquet")
         .limit(n_rows).coalesce(1).write.parquet(f"{d}/{t}.parquet"))
    return d


def _sweep(spark, sf_dir, typed_errors):
    from data_warehouse_migrate_spark.queries import QUERIES

    failures = {}
    for name, fn in QUERIES.items():
        expected = typed_errors.get(name)
        try:
            n = fn(spark, sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — classifying failures
            if expected and isinstance(ex, expected[0]) \
                    and expected[1] in str(ex):
                continue  # the documented typed refusal
            failures[name] = f"{type(ex).__name__}: {str(ex)[:160]}"
        else:
            if expected:
                failures[name] = ("expected the documented typed error, "
                                  f"got {n} rows")
    return failures


def test_every_query_survives_an_empty_corpus(spark, tmp_path_factory):
    d = _tiny_sf_dir(spark, tmp_path_factory, 0)
    assert not (f := _sweep(spark, d, EXPECTED_TYPED_ERRORS)), f


def test_every_query_survives_a_one_row_corpus(spark, tmp_path_factory):
    """One row per table: degenerate windows, splits of 1, top-k with
    k > n, and — the r8 catch — spread partitions that are mostly EMPTY
    feeding Arrow workers (embedding_pca's empty moment partial)."""
    d = _tiny_sf_dir(spark, tmp_path_factory, 1)
    assert not (f := _sweep(spark, d, {})), f
