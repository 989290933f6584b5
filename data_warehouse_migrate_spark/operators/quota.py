"""Corpus composition operators: mixture weighting and quality banding.

Beyond-reference LLM-pipeline surface (the reference has no sampling of
any kind): a pre-training corpus is not just deduped — it is COMPOSED.
Two standard moves:

  * mixture_sample — hit target per-source mixture weights (the
    Pile/RedPajama-style "20% web, 10% code, ..." recipe) by downsampling
    each source deterministically.
  * quality_band_filter — keep documents above a per-group quality
    percentile (C4/CCNet-style quality gating, but rank-based so the
    threshold adapts per language instead of one global magic number).

Both are built on the deterministic integer-hash draw from
``operators.sampling`` (no RNG, reproducible across engines and runs,
and expressible in ANSI SQL for the oracle).

100 TB shape: mixture_sample is ONE tiny aggregate (per-source counts —
rows = #sources) + a narrow scan-predicate filter (no shuffle of the
corpus); quality_band_filter is one window shuffle keyed by the group
column — inherent to exact ranks; per-row window state is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_migrate_spark.operators.sampling import HASH_SPACE, _draw


def mixture_sample(df: DataFrame, strata_col: str, id_col: str,
                   weights: dict[str, float],
                   total_rows: int,
                   upsample: bool = False,
                   copy_col: str = "copy_id") -> DataFrame:
    """Deterministic mixture sampling: resample each stratum so the
    kept corpus approximates ``total_rows`` distributed by ``weights``
    (weights are normalized; strata absent from ``weights`` are dropped).

    Per-stratum target ratio r = weight·total / stratum_rows. With the
    default ``upsample=False`` the keep fraction is min(1, r): a stratum
    smaller than its target keeps everything and the output schema is
    unchanged. With ``upsample=True`` (the full Pile-style recipe —
    epochs > 1 on scarce sources) an undersized stratum REPEATS rows:
    each row yields ``floor(r)`` copies plus one more when its hash draw
    falls under the fractional remainder, so expected copies per row is
    exactly r; the output gains ``copy_col`` (0-based repeat index) to
    keep repeated rows distinguishable downstream. Selection/repetition
    is the integer-hash draw keyed on the row id: adding rows to one
    stratum never changes another stratum's outcome, and reruns are
    reproducible.

    One aggregate over #strata rows (collected — bounded by the number
    of sources, never corpus size), then one narrow filter (plus, when
    upsampling, a generator expression — still narrow, no shuffle):
    per-stratum base copies and fractional thresholds are inlined as
    integer literals, so the filter pushes down to the scan. Expected
    kept counts are binomial around the target (exact-N per stratum
    would cost a window shuffle; see ``sampling.stratified_sample``
    when exactness matters more than a shuffle).
    """
    if not weights or total_rows < 0:
        raise ValueError("weights must be non-empty and total_rows >= 0")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to > 0")

    counts = {r[0]: r[1] for r in
              (df.filter(F.col(strata_col).isin(list(weights)))
               .groupBy(strata_col).agg(F.count("*")).collect())}
    # per stratum: (base copies, fractional-part draw threshold); with
    # upsample=False the ratio is capped at 1 so base+Bernoulli(frac)
    # degenerates to the plain keep/drop draw
    plan: dict[str, tuple[int, int]] = {}
    for stratum, w in weights.items():
        n = counts.get(stratum, 0)
        if n == 0:
            continue
        r = (w / wsum) * total_rows / n
        if not upsample:
            r = min(1.0, r)
        base = int(r)
        plan[stratum] = (base, int((r - base) * HASH_SPACE))
    if not plan:
        # no weighted stratum has any rows (e.g. an empty corpus): empty
        # OUT, but with the upsample path's schema — the bare filter(false)
        # lacked copy_col and made downstream selects fail with an
        # unresolved-column error instead of returning zero rows (r8
        # empty-corpus sweep)
        out = df.filter(F.lit(False))
        return out.withColumn(copy_col, F.lit(0)) if upsample else out

    draw = _draw(id_col)
    if not upsample:
        cond = None
        for stratum, (base, thr) in plan.items():
            keep = (F.col(strata_col) == stratum) & (
                F.lit(base == 1) | (draw < F.lit(thr)))
            cond = keep if cond is None else cond | keep
        return df.filter(cond)

    copies = None
    for stratum, (base, thr) in plan.items():
        expr = F.lit(base) + (draw < F.lit(thr)).cast("int")
        branch = (copies if copies is not None else F)
        copies = branch.when(F.col(strata_col) == stratum, expr)
    copies = copies.otherwise(F.lit(0))
    return (df.withColumn("__copies", copies)
            .filter(F.col("__copies") > 0)
            .withColumn(copy_col,
                        F.explode(F.sequence(F.lit(0),
                                             F.col("__copies") - 1)))
            .drop("__copies"))


def temperature_sample(df: DataFrame, strata_col: str, id_col: str,
                       total_rows: int, alpha: float = 0.3,
                       upsample: bool = False,
                       copy_col: str = "copy_id") -> DataFrame:
    """Temperature-smoothed mixture sampling: target per-stratum shares
    proportional to ``count^alpha`` — the multilingual-corpus recipe
    (mBERT/XLM-R exponential smoothing): ``alpha=1`` keeps the natural
    distribution, ``alpha=0`` equalizes strata, between values lift
    low-resource strata without letting the head dominate.

    Delegates to ``mixture_sample`` with the smoothed weights, so
    selection inherits its deterministic hash-draw semantics (and
    ``upsample=True`` repeats undersized strata — the usual companion:
    smoothing only helps low-resource languages if they can run extra
    epochs). Costs one extra #strata-sized aggregate over
    ``mixture_sample``'s own (two tiny collects total — both bounded by
    stratum cardinality, never corpus size).

    Cross-engine determinism: weights are ``round(n^alpha * 1e6)``
    INTEGERS — a raw ``pow`` weight would make the downstream ratio
    arithmetic depend on libm ulp agreement between engines, while
    integer weights make every later op (one division, two multiplies)
    bit-identical IEEE double steps an ANSI-SQL oracle can mirror.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1] (got {alpha})")
    counts = (df.groupBy(strata_col).agg(F.count("*").alias("n"))
              .collect())
    weights = {r[0]: int(round(r[1] ** alpha * 1e6))
               for r in counts if r[0] is not None}
    if not weights:
        return df.filter(F.lit(False))
    return mixture_sample(df, strata_col, id_col, weights, total_rows,
                          upsample=upsample, copy_col=copy_col)


def quality_band_filter(df: DataFrame, score_col, group_col: str,
                        keep_top: float = 0.5,
                        id_col: str = "doc_id") -> DataFrame:
    """Keep the top ``keep_top`` fraction of each group by score rank.

    Rank-based gating: ``percent_rank`` within the group (ties broken by
    id so the cut is deterministic), keep rows with
    percent_rank >= 1 - keep_top — the highest-scoring fraction. The
    threshold adapts per group: a language whose scores run low still
    keeps its best half, where a global score cutoff would delete it
    wholesale.

    ``score_col`` may be a Column expression (computed on the fly) or a
    column name. Adds ``q_rank`` (the percent_rank, rounded 6dp) to the
    output — downstream curriculum stages weight by it.
    """
    if not 0.0 < keep_top <= 1.0:
        raise ValueError(f"keep_top must be in (0, 1] (got {keep_top})")
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    w = Window.partitionBy(group_col).orderBy(
        score.asc(), F.col(id_col).asc())
    return (df.withColumn("q_rank", F.round(F.percent_rank().over(w), 6))
            .filter(F.col("q_rank") >= F.round(F.lit(1.0 - keep_top), 6)))


def curriculum_buckets(df: DataFrame, score_col, n_buckets: int = 4,
                       approx: bool = False,
                       out_col: str = "bucket") -> DataFrame:
    """Difficulty-curriculum assignment: ``out_col`` ∈ [0, n_buckets) by
    percentile cuts of ``score_col`` (bucket 0 = lowest scores). The
    training loop then schedules buckets easy→hard without any global
    sort of the corpus.

    Plan: ONE aggregate computes the n_buckets−1 interior percentile
    cuts (collected — n_buckets-sized, never corpus-sized), then a
    narrow comparison projection assigns buckets: bucket = #cuts the
    score EXCEEDS (ties bucket downward, deterministic). No window, no
    shuffle of the data — the scale-correct alternative to ntile, whose
    global ORDER BY ranks the entire corpus through one sort.

    ``approx=True`` uses percentile_approx (mergeable sketch, the 100 TB
    default); exact percentile is itself a single aggregate (not a
    sort), so the choice trades memory on the agg for cut exactness —
    the exact form is what the SQL oracle pins.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2 (got {n_buckets})")
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    qs = [i / n_buckets for i in range(1, n_buckets)]
    pct = (F.percentile_approx(score, F.array(*[F.lit(q) for q in qs]),
                               F.lit(10000))
           if approx else
           F.percentile(score, F.array(*[F.lit(q) for q in qs])))
    cuts = df.agg(pct.alias("c")).first()["c"]
    if cuts is None:
        # percentile over zero non-null scores returns NULL — surface a
        # real error instead of a TypeError three lines down
        raise ValueError(
            f"curriculum_buckets: no non-null {score_col!r} scores to cut on")
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (score > F.lit(float(c))).cast("int")
    return df.withColumn(out_col, bucket)


def token_budget_sample(df: DataFrame, strata_col: str, id_col: str,
                        tokens, budgets: dict[str, int] | None = None,
                        default_budget: int | None = None) -> DataFrame:
    """Token-budget corpus composition: per stratum (source), keep
    documents in deterministic hash order until the stratum's TOKEN
    budget is reached — the mixing primitive when a training recipe is
    written in tokens ("50B web, 10B code"), not row counts
    (``mixture_sample``'s unit).

    ``tokens``: Column expression (or column name) giving each document's
    token count. Selection order is the shared integer-hash draw with
    ``id_col`` as tie-break — reproducible, engine-independent, and
    independent of input partitioning. A document is kept iff the
    cumulative token count BEFORE it is below the budget, so the budget
    is crossed by at most one document per stratum (never undershot while
    data remains). Strata without a budget (and no ``default_budget``)
    are dropped, mirroring ``mixture_sample``'s weights contract.

    Plan: ONE window shuffle keyed by the stratum for the exclusive
    running sum — exact budgets need a global order per stratum, so each
    stratum's rows meet on one reducer (same disclosed cost as
    ``sampling.stratified_sample``'s exact-N window; at 100 TB with few
    large strata, pre-aggregating per hash-range bucket and prefix-
    summing the bucket totals bounds the sequential scan, at the price of
    approximate boundary handling — not implemented here).
    """
    budgets = dict(budgets or {})
    if not budgets and default_budget is None:
        raise ValueError("provide a non-empty budgets dict and/or "
                         "default_budget")
    tok = F.col(tokens) if isinstance(tokens, str) else tokens
    if default_budget is None:
        df = df.filter(F.col(strata_col).isin(list(budgets)))
    budget_expr = None
    for stratum, b in budgets.items():
        base = F if budget_expr is None else budget_expr
        budget_expr = base.when(F.col(strata_col) == stratum, F.lit(int(b)))
    if budget_expr is None:
        budget_expr = F.lit(int(default_budget))
    elif default_budget is not None:
        budget_expr = budget_expr.otherwise(F.lit(int(default_budget)))

    draw = _draw(id_col)
    w = (Window.partitionBy(strata_col)
         .orderBy(draw.asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum(tok.cast("long")).over(w), F.lit(0))
    return (df.withColumn("__cum_before", cum_before)
            .filter(F.col("__cum_before") < budget_expr)
            .drop("__cum_before"))
