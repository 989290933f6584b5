"""Event-sequence analytics: funnels and cohort retention
(beyond-reference surface).

The warehouse queries a migrated events table exists FOR: how many
users progressed through an ordered step sequence (funnel), and how do
weekly signup cohorts retain over time. Both are pure DataFrame
aggregation shapes — no sessionization state, no UDFs.

100 TB shape: every join and aggregate in this module is keyed on the
user column (or user+week), so the whole funnel chain rides ONE
partitioning — AQE reuses the exchange across the per-step joins, and
each step's aggregate combines map-side. No per-user event arrays are
ever collected (a whale user with 10⁸ events costs nothing beyond his
row count), which is why the funnel is computed as iterated
conditional MIN-aggregates instead of a collect-and-walk fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(df: DataFrame, user_col: str, ts_col: str,
                 type_col: str, steps: list[str]) -> DataFrame:
    """Per-user strict-order funnel timestamps: (user, t_1 … t_k) where
    ``t_i`` is the EARLIEST event of ``steps[i-1]`` occurring strictly
    after ``t_{i-1}`` (t_1 = first occurrence of the first step). A
    NULL ``t_i`` means the user never reached step i; later columns
    are then NULL too. Only users who reached step 1 appear.

    The strict-progression semantics (each step must follow the
    previous step's FIRST qualifying time) is the standard product
    funnel; a same-timestamp step does not count as progression
    (strictly-after comparison, disclosed).
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    u, ts, et = F.col(user_col), F.col(ts_col), F.col(type_col)
    out = (df.filter(et == steps[0])
           .groupBy(user_col)
           .agg(F.min(ts).alias("t_1")))
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t_{i - 1}"
        nxt = (df.filter(et == step)
               .join(out.select(user_col, prev), user_col)
               .filter(ts > F.col(prev))
               .groupBy(user_col)
               .agg(F.min(ts).alias(f"t_{i}")))
        out = out.join(nxt, user_col, "left")
    return out


def funnel_counts(df: DataFrame, user_col: str, ts_col: str,
                  type_col: str, steps: list[str]) -> DataFrame:
    """(step, step_order, users): how many users reached each funnel
    step under :func:`funnel_times` semantics. One tiny k-row result;
    the heavy lifting is the user-keyed chain above."""
    times = funnel_times(df, user_col, ts_col, type_col, steps)
    counts = times.agg(*[
        F.count(F.col(f"t_{i}")).alias(f"n_{i}")
        for i in range(1, len(steps) + 1)])
    rows = None
    for i, step in enumerate(steps, start=1):
        r = counts.select(F.lit(step).alias("step"),
                          F.lit(i).alias("step_order"),
                          F.col(f"n_{i}").alias("users"))
        rows = r if rows is None else rows.unionByName(r)
    return rows


def cohort_retention(df: DataFrame, user_col: str,
                     ts_col: str) -> DataFrame:
    """Weekly cohort retention: (cohort, week_offset, active_users)
    where ``cohort`` is the Monday-truncated week of each user's FIRST
    event and ``week_offset`` counts weeks since (offset 0 = the cohort
    week itself — every cohort member is active there by definition).

    Two user-keyed aggregates + one user-keyed join: first-seen week
    per user, distinct (user, week) activity, then a (cohort, offset)
    count. Both engines truncate weeks to Monday, so the day delta is
    an exact multiple of 7 and the integer offset is engine-exact.
    """
    u, ts = F.col(user_col), F.col(ts_col)
    first = (df.groupBy(user_col)
             .agg(F.date_trunc("week", F.min(ts)).alias("cohort")))
    weekly = (df.select(user_col, F.date_trunc("week", ts).alias("wk"))
              .distinct())
    return (weekly.join(first, user_col)
            .select("cohort",
                    (F.datediff(F.col("wk"), F.col("cohort")) / 7)
                    .cast("int").alias("week_offset"),
                    user_col)
            .groupBy("cohort", "week_offset")
            .agg(F.count_distinct(u).alias("active_users")))
