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


def test_approx_percentiles_bound_error_vs_exact(spark, sf_dir):
    """The sketch returns an ACTUAL value whose RANK is within epsilon of
    the requested quantile (exact percentile instead interpolates, so a
    value-space comparison would conflate interpolation with sketch
    error — bound by rank window against the group's sorted values)."""
    import math

    from data_warehouse_migrate_spark.queries import QUERIES

    approx = {r.event_type: r for r in
              QUERIES["approx_value_percentiles"](spark, sf_dir).collect()}
    vals: dict = {}
    for r in (spark.read.parquet(f"{sf_dir}/events.parquet")
              .select("event_type", "value").collect()):
        vals.setdefault(r.event_type, []).append(r.value)
    assert set(vals) == set(approx)
    eps = 0.01  # generous vs the sketch's 1/10000 accuracy
    for et, a in approx.items():
        v = sorted(vals[et])
        n = len(v)
        for q, fld in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            lo = v[max(0, math.floor((q - eps) * (n - 1)))]
            hi = v[min(n - 1, math.ceil((q + eps) * (n - 1)))]
            got = getattr(a, fld)
            assert lo - 1e-6 <= got <= hi + 1e-6, (et, fld, lo, got, hi)
