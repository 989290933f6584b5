"""Vector expressions over array<float|double> embedding columns.

Built-in ``zip_with``/``aggregate`` array math — JVM-side, no UDFs — with
exact DuckDB SQL twins (list_transform/list_reduce) for the oracle.
Results are rounded where they feed hash-compared query outputs (float
summation order is engine-defined past ~1e-12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_signature(vec: Column, n_planes: int = 8) -> Column:
    """Deterministic random-hyperplane LSH signature (int bucket id).

    Plane weights are a fixed pseudo-random pattern drawn from {-2,-1,1,2}
    (never 0 — zero weights make sparse vectors knife-edge on a plane)
    derived from (dimension_index * 31 + plane_index * 17) mod 4 — no
    runtime randomness, so signatures are stable across runs and engines.
    Vectors with the same signature land in the same ANN bucket.
    """
    def _proj(j):
        def _w(d):
            m = (d * 31 + F.lit(j * 17)) % 4
            return F.when(m < 2, m - 2).otherwise(m - 1).cast("double")

        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, d: x.cast("double") * _w(d),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    sig = F.lit(0).cast("long")
    for j in range(n_planes):
        sig = sig + F.when(_proj(j) > 0,
                           F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0))
    return sig
