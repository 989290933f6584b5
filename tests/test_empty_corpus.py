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
"""

import pytest


# queries whose EMPTY-corpus contract is a documented, typed refusal
EXPECTED_TYPED_ERRORS = {
    # percentile cut points over zero non-null scores are undefined
    "curriculum_buckets": (ValueError, "no non-null"),
    # k-means over an empty corpus has no centroids to train
    "embedding_ivf": (ValueError, "empty corpus"),
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("sf_empty"))
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        (spark.read.parquet(f"{src}/{t}.parquet")
         .limit(0).coalesce(1).write.parquet(f"{d}/{t}.parquet"))
    return d


def test_every_query_survives_an_empty_corpus(spark, empty_sf_dir):
    from data_warehouse_migrate_spark.queries import QUERIES

    failures = {}
    for name, fn in QUERIES.items():
        expected = EXPECTED_TYPED_ERRORS.get(name)
        try:
            n = fn(spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — classifying failures
            if expected and isinstance(ex, expected[0]) \
                    and expected[1] in str(ex):
                continue  # the documented typed refusal
            failures[name] = f"{type(ex).__name__}: {str(ex)[:160]}"
        else:
            if expected:
                failures[name] = ("expected the documented typed error, "
                                  f"got {n} rows")
    assert not failures, failures
