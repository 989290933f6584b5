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
per-group sort internally — at extreme scale swap ``F.percentile`` for
``F.percentile_approx`` (same call shape, documented accuracy bound,
same pattern as the engine's value_percentiles / approx twin pair).
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


def winsorize(df: DataFrame, value_col: str,
              group_col: str | None = None,
              lower: float = 0.01, upper: float = 0.99,
              out_col: str | None = None) -> DataFrame:
    """Clip ``value_col`` into its exact [``lower``, ``upper``]
    percentile band (per ``group_col`` when given), writing the result
    to ``out_col`` (default ``<value_col>_w``). NULL values stay NULL;
    original columns pass through untouched.
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1 "
                         f"(got {lower}, {upper})")
    out_col = out_col or f"{value_col}_w"
    work, g = _grouped(df, group_col)
    pct = F.percentile(F.col(value_col),
                       F.array(F.lit(lower), F.lit(upper)))
    bounds = (work.groupBy(g)
              .agg(pct[0].alias("__lo"), pct[1].alias("__hi")))
    clipped = (work.join(F.broadcast(bounds), g)
               .withColumn(out_col,
                           F.least(F.greatest(F.col(value_col),
                                              F.col("__lo")),
                                   F.col("__hi")))
               .drop("__lo", "__hi"))
    return clipped.drop("__g") if group_col is None else clipped


def mad_outliers(df: DataFrame, value_col: str,
                 group_col: str | None = None,
                 threshold: float = 3.5,
                 score_col: str = "robust_z",
                 flag_col: str = "is_outlier") -> DataFrame:
    """Iglewicz–Hoaglin modified z-score per row:

      robust_z = 0.6745 · (x − median) / MAD,   MAD = median(|x − median|)

    rounded 6dp; ``flag_col`` = |robust_z| > ``threshold`` (3.5 is the
    published cutoff). A zero MAD (>50% of the group identical) leaves
    the score NULL and the flag false — the statistic is undefined
    there, and flagging everything unequal to the median would be the
    wrong failure mode (disclosed). NULL values keep NULL score/false
    flag.
    """
    work, g = _grouped(df, group_col)
    med = (work.groupBy(g)
           .agg(F.percentile(F.col(value_col), F.lit(0.5))
                .alias("__med")))
    with_med = work.join(F.broadcast(med), g)
    mad = (with_med
           .groupBy(g)
           .agg(F.percentile(F.abs(F.col(value_col) - F.col("__med")),
                             F.lit(0.5)).alias("__mad")))
    score = F.round(F.lit(0.6745) * (F.col(value_col) - F.col("__med"))
                    / F.col("__mad"), 6)
    scored = (with_med.join(F.broadcast(mad), g)
              .withColumn(score_col,
                          F.when(F.col("__mad") > 0, score))
              .withColumn(flag_col,
                          F.coalesce(F.abs(F.col(score_col))
                                     > threshold, F.lit(False)))
              .drop("__med", "__mad"))
    return scored.drop("__g") if group_col is None else scored
