"""Robust numeric cleaning: winsorization and MAD outlier flags
(beyond-reference surface).

A migrated metrics table almost always carries corrupt magnitudes — a
sensor stuck at 1e12, a currency landed in the wrong unit. Mean/stddev
clipping is itself dragged by the outliers it should remove; the
robust pair here is the standard remedy:

  * ``winsorize``  — clip to exact percentile bounds (the feature-
    engineering standard before scaling).
  * ``mad_outliers`` — modified z-score 0.6745·(x − median)/MAD
    (Iglewicz–Hoaglin): median and MAD have a 50% breakdown point, so
    the flags stay meaningful even when a large fraction of the data
    is corrupt.

100 TB shape: each operator is one grouped EXACT-percentile aggregate
(two for MAD — the deviation median needs the median joined back),
whose result is #groups-sized and broadcast back onto the corpus; the
clip/score itself is a narrow JVM expression. Exact percentiles pay a
per-group sort internally — at extreme scale pass ``approx=True`` to
route the same call shape through ``F.percentile_approx`` (bounded
relative rank error 1/``accuracy``, same pattern as the engine's
value_percentiles / approx_value_percentiles twin pair; the exact
path stays the oracle).

Bounds join back onto the corpus NULL-SAFELY (``eqNullSafe``): rows
whose ``group_col`` is NULL form their own group and are clipped /
scored against that group's bounds, never dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grouped(df: DataFrame, group_col: str | None):
    """Group key handling: ``group_col=None`` computes one global bound
    set via a constant key (still a single tiny aggregate)."""
    if group_col is None:
        return df.withColumn("__g", F.lit(0)), "__g"
    return df, group_col


def _pct(col: F.Column, p, approx: bool, accuracy: int) -> F.Column:
    """Exact or approx percentile with one call shape. ``p`` is a
    Column (literal fraction or array of fractions)."""
    if approx:
        return F.percentile_approx(col, p, F.lit(accuracy))
    return F.percentile(col, p)


def _join_bounds(work: DataFrame, bounds: DataFrame, g: str) -> DataFrame:
    """Broadcast the #groups-sized ``bounds`` back onto ``work``,
    null-safely on the group key: a NULL group key matches the NULL
    group's bounds row (plain name-equi-join would silently drop those
    rows). Left join so a row can never vanish here by construction."""
    bounds = bounds.withColumnRenamed(g, "__gk")
    return (work.join(F.broadcast(bounds),
                      F.col(g).eqNullSafe(F.col("__gk")), "left")
            .drop("__gk"))


def winsorize(df: DataFrame, value_col: str,
              group_col: str | None = None,
              lower: float = 0.01, upper: float = 0.99,
              out_col: str | None = None,
              approx: bool = False, accuracy: int = 10000) -> DataFrame:
    """Clip ``value_col`` into its [``lower``, ``upper``] percentile
    band (per ``group_col`` when given), writing the result to
    ``out_col`` (default ``<value_col>_w``). NULL values stay NULL;
    original columns pass through untouched — including rows whose
    ``group_col`` is NULL (null-safe bounds join; they clip against the
    NULL group's own bounds). ``approx=True`` swaps the exact per-group
    percentile for ``percentile_approx`` (relative rank error bounded
    by 1/``accuracy``) — the extreme-scale path; the exact default is
    the oracle-checked contract.
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1 "
                         f"(got {lower}, {upper})")
    out_col = out_col or f"{value_col}_w"
    work, g = _grouped(df, group_col)
    pct = _pct(F.col(value_col), F.array(F.lit(lower), F.lit(upper)),
               approx, accuracy)
    bounds = (work.groupBy(g)
              .agg(pct[0].alias("__lo"), pct[1].alias("__hi")))
    # the NULL guard is load-bearing: least/greatest SKIP nulls, so a
    # bare least(greatest(NULL, lo), hi) silently clips NULL to lo —
    # caught by the r8 property test, violating the stay-NULL contract
    clipped = (_join_bounds(work, bounds, g)
               .withColumn(out_col,
                           F.when(F.col(value_col).isNotNull(),
                                  F.least(F.greatest(F.col(value_col),
                                                     F.col("__lo")),
                                          F.col("__hi"))))
               .drop("__lo", "__hi"))
    return clipped.drop("__g") if group_col is None else clipped


def mad_outliers(df: DataFrame, value_col: str,
                 group_col: str | None = None,
                 threshold: float = 3.5,
                 score_col: str = "robust_z",
                 flag_col: str = "is_outlier",
                 approx: bool = False, accuracy: int = 10000) -> DataFrame:
    """Iglewicz–Hoaglin modified z-score per row:

      robust_z = 0.6745 · (x − median) / MAD,   MAD = median(|x − median|)

    rounded 6dp; ``flag_col`` = |robust_z| > ``threshold`` (3.5 is the
    published cutoff). A zero MAD (>50% of the group identical) leaves
    the score NULL and the flag false — the statistic is undefined
    there, and flagging everything unequal to the median would be the
    wrong failure mode (disclosed). NULL values keep NULL score/false
    flag; NULL-``group_col`` rows score against their own group
    (null-safe join — never dropped). ``approx=True`` routes both
    medians through ``percentile_approx`` (the extreme-scale path;
    exact stays the oracle).
    """
    work, g = _grouped(df, group_col)
    med = (work.groupBy(g)
           .agg(_pct(F.col(value_col), F.lit(0.5), approx, accuracy)
                .alias("__med")))
    with_med = _join_bounds(work, med, g)
    mad = (with_med
           .groupBy(g)
           .agg(_pct(F.abs(F.col(value_col) - F.col("__med")),
                     F.lit(0.5), approx, accuracy).alias("__mad")))
    score = F.round(F.lit(0.6745) * (F.col(value_col) - F.col("__med"))
                    / F.col("__mad"), 6)
    scored = (_join_bounds(with_med, mad, g)
              .withColumn(score_col,
                          F.when(F.col("__mad") > 0, score))
              .withColumn(flag_col,
                          F.coalesce(F.abs(F.col(score_col))
                                     > threshold, F.lit(False)))
              .drop("__med", "__mad"))
    return scored.drop("__g") if group_col is None else scored
