"""Fuzzy entity resolution: approximate-key joins for dimension
matching across systems (beyond-reference surface).

A warehouse migration constantly reconciles dimension records whose
business keys drifted — a typo'd customer name, an ID re-keyed with a
dropped character. The reference joins only on exact keys; real
cutovers need a bounded-edit-distance match that still scales.

The naive approach is a cross join with an edit-distance predicate —
O(n·m) distance evaluations, dead at any scale. Classic q-gram blocking
collapses on exactly the data dimension tables have (shared prefixes:
``Customer#00000…`` — every key shares almost every q-gram, so blocking
degenerates to all-pairs). The scalable shape here is the deletion
neighborhood (the SymSpell spelling-correction construction): for edit
distance 1, two strings s, t with lev(s, t) ≤ 1 ALWAYS share a member
of their deletion neighborhoods {s} ∪ {s minus one char} — a pigeonhole
fact, independent of how similar the corpus' keys are to each other.

Plan shape: each side explodes into |s|+1 variant hashes (JVM
``transform``/``posexplode``, no UDF), the equi-join on the 64-bit
variant hash produces candidates (distance-≤2 sharers at worst), a
DISTINCT collapses multi-variant hits, and ``F.levenshtein`` verifies
exactly. Linear in corpus × key length, one well-keyed shuffle, robust
to common prefixes. Verification cost is per CANDIDATE, never per
pair of the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col: F.Column) -> F.Column:
    """Array of xxhash64 over {s} ∪ {s with char i deleted}: the
    distance-1 deletion neighborhood, hashed so the join key is 8 bytes
    regardless of key length. Position i=0 keeps s itself; i=1..len
    deletes the i-th character (1-based)."""
    return F.transform(
        F.sequence(F.lit(0), F.length(col)),
        lambda i: F.xxhash64(
            F.when(i == F.lit(0), col)
            .otherwise(F.concat(col.substr(F.lit(1), i - 1),
                                col.substr(i + 1, F.length(col))))))


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_key: str, right_key: str,
               max_distance: int = 1) -> DataFrame:
    """All (left row, right row) pairs with
    ``levenshtein(left_key, right_key) <= max_distance``, exactly.

    Returns the left columns + right columns (caller ensures disjoint
    names) + ``edit_distance``. ``max_distance`` must be 1 — the
    deletion-neighborhood generation implemented here is the d=1
    construction (d=2 needs the |s|²-variant neighborhood; at that
    point prefer pre-normalizing keys, which a migration pipeline
    controls). Exact-match pairs (distance 0) are included.

    Completeness: lev(s,t) ≤ 1 means t is s, s minus a char, s plus a
    char, or s with one substitution — in every case del(s,1) ∩
    del(t,1) ≠ ∅, so the variant-hash join finds the pair; the
    ``levenshtein`` verify then removes the distance-2 pairs the
    neighborhood also admits (two different deletions meeting at the
    same string) and any 64-bit hash-collision strays. NULL keys never
    match (their neighborhoods are empty by construction).
    """
    if max_distance != 1:
        raise ValueError(
            "fuzzy_join implements the d=1 deletion neighborhood; got "
            f"max_distance={max_distance} (normalize keys upstream or "
            "add the |s|^2 d=2 neighborhood deliberately)")

    lv = (left
          .withColumn("__vh", F.explode(
              _deletion_variants(F.col(left_key)))))
    rv = (right
          .withColumn("__vh", F.explode(
              _deletion_variants(F.col(right_key)))))
    cand = (lv.join(rv, "__vh")
            .drop("__vh")
            .distinct())
    return (cand
            .withColumn("edit_distance",
                        F.levenshtein(F.col(left_key), F.col(right_key)))
            .filter(F.col("edit_distance") <= max_distance))


def entity_clusters(df: DataFrame, id_col: str, key_col: str) -> DataFrame:
    """Canonical entity resolution: cluster records whose keys sit
    within edit distance 1 of each other (transitively) and label each
    record with its cluster's MIN record id — the master-data step after
    a migration lands several systems' dimension rows in one table.

    Composition of the engine's existing parts: :func:`fuzzy_join` on
    the table against itself (deletion-neighborhood candidates, exact
    levenshtein verify, id_a < id_b halves the pairs) feeds
    ``operators.dedup.connected_components`` (scale-adaptive: measured
    edge volume picks driver union-find vs checkpointed label
    propagation). Returns (``id_col``, ``cluster_id``). Transitivity is
    deliberate — A~B and B~C cluster together even when lev(A, C) = 2,
    the standard entity-resolution semantics; records with NULL keys
    form singleton clusters (they match nothing, including each other).
    """
    from data_warehouse_migrate_spark.operators.dedup import (
        connected_components,
    )

    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(key_col).alias("__ka"))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(key_col).alias("__kb"))
    edges = (fuzzy_join(a, b, "__ka", "__kb")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b"))
    nodes = df.select(F.col(id_col).alias("id"))
    return (connected_components(nodes, edges)
            .withColumnRenamed("id", id_col))
