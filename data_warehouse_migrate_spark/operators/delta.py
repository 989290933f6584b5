"""Incremental migration: snapshot delta (CDC-style diff) between a
source table and the destination's current contents.

Beyond-reference surface (SURVEY.md §7.3 spirit): the reference moves a
table ONCE, append or overwrite-everything (``migrator.py:210-224``) —
re-running it re-ships every row. A real warehouse sync ships only the
delta: rows to INSERT (new keys), UPDATE (same key, changed payload),
and DELETE (keys gone from the source). This operator computes that
delta as a DataFrame so the engine's existing sinks apply it (append the
inserts, JDBC-update/merge the updates, anti-delete the deletes).

100 TB shape: ONE full-outer sort-merge join keyed on the business key —
both sides shuffle once on the key; with both snapshots bucketed on the
key (``sources.sinks.write_bucketed``) the exchange disappears entirely.
Change detection is a null-safe struct comparison (JVM expression, no
UDF), so the join output is filtered map-side before anything else moves.
The delta is typically a small fraction of the corpus — downstream
stages (sink writes) see delta-sized, not corpus-sized, inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_delta(source: DataFrame, dest: DataFrame,
                   key_cols: list[str],
                   compare_cols: list[str] | None = None) -> DataFrame:
    """Classify every key across two snapshots.

    Returns one row per key present in either snapshot, with
    ``change_type`` ∈ {'insert','update','delete','unchanged'} and the
    SOURCE payload for insert/update rows (NULLs for delete — the key
    columns always carry the key from whichever side has it).

    ``compare_cols`` defaults to all non-key columns the two snapshots
    share; comparison is null-safe (NULL == NULL is unchanged — SQL
    ``IS NOT DISTINCT FROM``). Key collisions within a snapshot are the
    caller's contract (business keys are unique by definition); the join
    would otherwise multiply rows, as in any engine.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    shared = [c for c in source.columns
              if c in set(dest.columns) and c not in set(key_cols)]
    if compare_cols is None:
        compare_cols = shared
    missing = [c for c in compare_cols if c not in shared]
    if missing:
        raise ValueError(f"compare_cols not in both snapshots: {missing}")

    # explicit presence markers: inferring existence from key nullability
    # misclassifies NULL business keys (a NULL-key source row would look
    # "absent from source" and come out as delete/update noise)
    s = source.withColumn("__in_s", F.lit(1)).alias("s")
    d = dest.withColumn("__in_d", F.lit(1)).alias("d")
    cond = None
    for k in key_cols:
        eq = F.col(f"s.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = eq if cond is None else cond & eq
    joined = s.join(d, cond, "full_outer")

    in_s = F.col("s.__in_s").isNotNull()
    in_d = F.col("d.__in_d").isNotNull()
    changed = None
    for c in compare_cols:
        ne = ~F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}"))
        changed = ne if changed is None else changed | ne
    if changed is None:
        changed = F.lit(False)

    change = (F.when(in_s & ~in_d, F.lit("insert"))
              .when(~in_s & in_d, F.lit("delete"))
              .when(changed, F.lit("update"))
              .otherwise(F.lit("unchanged")))

    out_cols = [F.coalesce(F.col(f"s.{k}"), F.col(f"d.{k}")).alias(k)
                for k in key_cols]
    out_cols += [F.col(f"s.{c}").alias(c) for c in source.columns
                 if c not in key_cols]
    out_cols.append(change.alias("change_type"))
    return joined.select(*out_cols)


def delta_counts(delta: DataFrame) -> DataFrame:
    """Per-change-type row counts — the dry-run summary an operator
    checks before applying a delta (one narrow aggregate)."""
    return (delta.groupBy("change_type")
            .agg(F.count("*").alias("n_rows")))


def apply_delta(dest: DataFrame, delta: DataFrame,
                key_cols: list[str]) -> DataFrame:
    """Materialize the next destination snapshot from the current one
    plus a delta: drop deleted/updated keys, append inserts/updates.
    (For JDBC sinks the same delta drives MERGE/DELETE statements; this
    DataFrame form is the file-sink / snapshot-table path.)

    One shuffle: the anti-join on the key; the union is free. The anti
    join is NULL-SAFE on the key columns — a column-list join uses
    null-unsafe equality, under which a NULL-key delete/update never
    matches and the stale destination row survives (duplicating on every
    sync).
    """
    moves = delta.filter(F.col("change_type").isin("delete", "update"))
    dd, mm = dest.alias("dd"), moves.select(*key_cols).alias("mm")
    cond = None
    for k in key_cols:
        eq = F.col(f"dd.{k}").eqNullSafe(F.col(f"mm.{k}"))
        cond = eq if cond is None else cond & eq
    keep = dd.join(mm, cond, "left_anti")
    add = (delta.filter(F.col("change_type").isin("insert", "update"))
           .select(*dest.columns))
    return keep.unionByName(add)
