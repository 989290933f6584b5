"""Sketch accuracy: HLL approx distinct vs exact twin."""

from data_warehouse_migrate_spark.queries import QUERIES


def test_approx_distinct_within_rsd(spark, sf_dir):
    exact = {r.event_type: r.n_users
             for r in QUERIES["distinct_users_exact"](spark, sf_dir).collect()}
    approx = {r.event_type: r.n_users_approx
              for r in QUERIES["approx_distinct_users"](spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.05 * n, 2), (k, n, approx[k])
