"""Classifier calibration: precision/recall/F1 over a threshold grid.

The north-rule acceptance criterion is F1 ≥ 0.99 of the pipeline's
keep/drop decision against reference labels — which makes "where do I
put the score threshold, and how sharp is the cliff around it?" a
first-class pipeline query, not an offline notebook step (CCNet and
FineWeb both publish exactly this sweep when they pick an operating
point). soda-core's metric checks evaluate ONE number against ONE
threshold (reference: soda-core/src/soda_core/contracts/impl/
check_types/metric_check.py); this operator evaluates the whole
threshold axis in a single pass so the contract threshold can be
*chosen* from evidence.

Scale shape — the corpus is touched exactly once:

1. one partial-aggregated groupBy over ``floor(round(score, 6) *
   n_bins)`` → at most ``n_bins + 1`` rows of (bucket, positives,
   total) counts, whatever the corpus size;
2. the threshold grid joins that tiny aggregate with a ``bucket >=
   threshold_idx`` range condition (a broadcast nested-loop over two
   ≤ (n_bins+1)-row frames — deliberately chosen: at this size a
   nested loop is cheaper than any shuffle) and sums;
3. confusion cells and P/R/F1 are pure arithmetic on the grid rows.

``pred(t_i) = score >= i/n_bins`` is evaluated as ``bucket >= i``,
exact because ``floor(x*n) >= i  <=>  x >= i/n`` for integer ``i``.
The score is rounded to 6 dp BEFORE bucketing so both engines bucket
identical values (last-ULP ``exp`` drift between JVM and C libm could
otherwise straddle a bucket boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def threshold_sweep(
    df: DataFrame,
    score: Column,
    label: Column,
    n_bins: int = 20,
) -> DataFrame:
    """Confusion matrix + precision/recall/F1 of ``score >= t`` against
    boolean/0-1 ``label`` for every threshold ``t = i/n_bins``,
    ``i = 0..n_bins``. Returns one row per threshold: (threshold, tp,
    fp, fn, tn, precision, recall, f1) — ratio columns are NULL where
    their denominator is zero, rounded to 6 dp.

    ``score`` must lie in [0, 1] (a probability); rows with NULL score
    or NULL label are excluded (they have no ground truth to count).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    spark = df.sparkSession
    s = F.round(score.cast("double"), 6)
    y = label.cast("int")
    # NULL guard must wrap least(): Spark's (and DuckDB's) least() SKIPS
    # NULL arguments, so least(floor(NULL*n), n) would be n, silently
    # counting score-less rows in the top bucket
    bucket = F.when(
        s.isNotNull(),
        F.least(
            F.floor(s * F.lit(int(n_bins))).cast("long"), F.lit(int(n_bins))
        ),
    )
    agg = (
        df.select(bucket.alias("__cal_bucket"), y.alias("__cal_y"))
        .where(F.col("__cal_bucket").isNotNull() & F.col("__cal_y").isNotNull())
        .groupBy("__cal_bucket")
        .agg(
            F.sum("__cal_y").cast("long").alias("__cal_pos"),
            F.count(F.lit(1)).cast("long").alias("__cal_n"),
        )
    )
    grid = spark.range(0, n_bins + 1).select(
        F.col("id").alias("__cal_t")
    )
    # per-threshold predicted-positive mass: every bucket >= the grid
    # index counts as predicted-keep at that threshold
    per = (
        grid.join(
            F.broadcast(agg),
            agg["__cal_bucket"] >= F.col("__cal_t"),
            "left",
        )
        .groupBy("__cal_t")
        .agg(
            F.coalesce(F.sum("__cal_pos"), F.lit(0)).cast("long").alias("tp"),
            F.coalesce(F.sum("__cal_n"), F.lit(0)).cast("long").alias("__cal_pp"),
        )
    )
    totals = agg.agg(
        F.coalesce(F.sum("__cal_pos"), F.lit(0)).cast("long").alias("__cal_tot_pos"),
        F.coalesce(F.sum("__cal_n"), F.lit(0)).cast("long").alias("__cal_tot_n"),
    )
    tp = F.col("tp")
    pp = F.col("__cal_pp")
    fp = pp - tp
    fn = F.col("__cal_tot_pos") - tp
    tn = F.col("__cal_tot_n") - pp - fn
    ratio = lambda num, den: F.when(den > 0, F.round(num / den, 6))  # noqa: E731
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            F.round(F.col("__cal_t") / F.lit(float(n_bins)), 6).alias("threshold"),
            tp,
            fp.cast("long").alias("fp"),
            fn.cast("long").alias("fn"),
            tn.cast("long").alias("tn"),
            ratio(tp.cast("double"), pp.cast("double")).alias("precision"),
            ratio(tp.cast("double"), F.col("__cal_tot_pos").cast("double")).alias(
                "recall"
            ),
            ratio(
                (2 * tp).cast("double"),
                (2 * tp + fp + fn).cast("double"),
            ).alias("f1"),
        )
    )


def calibrate_drop_thresholds(
    df: DataFrame,
    signals: dict[str, tuple[str, str]],
    target_drop: float = 0.05,
) -> DataFrame:
    """Set each rule's knob from the data: per signal, the exact
    quantile threshold that would drop ``target_drop`` of the corpus,
    plus the REALIZED drop at that threshold (ties and discreteness make
    realized ≠ target — publishing both is the point: FineWeb/CCNet-style
    pipelines pick operating points as corpus quantiles, then must report
    what the cut actually removes).

    ``signals`` maps signal column → (direction, rule_name) where
    direction is ``"low"`` (small values are bad: drop < threshold —
    e.g. alnum_ratio) or ``"high"`` (large values are bad: drop >
    threshold — e.g. repetition). Returns one row per signal:
    ``(rule_name, signal, direction, threshold, n_dropped, realized_drop)``
    with threshold at 6 dp and realized_drop at 6 dp.

    Shape for scale: ONE aggregate pass computes every signal's exact
    interpolated percentile (Spark SQL ``percentile`` — a partial-agg
    sort-free sketch-merge per signal), then ONE more fused aggregate
    counts all realized drops — two corpus scans total for any number of
    signals, no window, no collect of data rows. NULL signal values are
    ignored by the percentile and never dropped by the count (a missing
    signal must not silently delete a document)."""
    if not signals:
        raise ValueError("signals must be non-empty")
    if not 0.0 < target_drop < 1.0:
        raise ValueError(f"target_drop must be in (0,1), got {target_drop}")
    for col, (direction, _name) in signals.items():
        if direction not in ("low", "high"):
            raise ValueError(f"{col}: direction must be 'low'|'high'")
    # count(*) rides the percentile aggregate — keeps this a true
    # two-scan operator (percentile pass + realized-drop pass)
    pct_aggs = [F.count(F.lit(1)).cast("long").alias("__total")]
    for col, (direction, _name) in signals.items():
        p = target_drop if direction == "low" else 1.0 - target_drop
        pct_aggs.append(
            F.round(
                F.percentile(F.col(col).cast("double"), F.lit(p)), 6
            ).alias(f"__t_{col}")
        )
    thresholds = df.agg(*pct_aggs).collect()[0].asDict()
    total = int(thresholds.pop("__total"))
    cnt_aggs = []
    for col, (direction, _name) in signals.items():
        t = thresholds[f"__t_{col}"]
        cond = (
            F.col(col).cast("double") < F.lit(t)
            if direction == "low"
            else F.col(col).cast("double") > F.lit(t)
        )
        cnt_aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"__n_{col}")
        )
    counts = df.agg(*cnt_aggs).collect()[0].asDict()
    spark = df.sparkSession
    rows = [
        (
            name,
            col,
            direction,
            float(thresholds[f"__t_{col}"])
            if thresholds[f"__t_{col}"] is not None
            else None,
            int(counts[f"__n_{col}"] or 0),
            round((counts[f"__n_{col}"] or 0) / total, 6) if total else 0.0,
        )
        for col, (direction, name) in signals.items()
    ]
    return spark.createDataFrame(
        rows,
        "rule_name string, signal string, direction string, "
        "threshold double, n_dropped long, realized_drop double",
    )


def classifier_reliability(
    df: DataFrame,
    score: Column,
    label: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error for a
    probability-score column against a boolean label — the QA step
    between :func:`~soda_core_spark.operators.training.
    distill_quality_classifier` and using its scores as sampling
    weights: a distilled quality model that says 0.9 must be RIGHT
    ~90 % of the time, or temperature sampling on its scores silently
    reweights the corpus (Guo et al. 2017, arXiv:1706.04599).

    Scores are rounded to 6 dp then bucketed into ``n_bins`` equal-width
    bins (``floor(score·n)``, top edge clamped into the last bin — the
    ``threshold_sweep`` exact-bucketing rule). Returns one row per
    non-empty bin plus the scalar ECE repeated on each row (so the
    report stays ONE frame)::

        bin, n, mean_score, positive_rate, abs_gap, ece

    with ``ece = Σ_b (n_b/N)·|positive_rate_b − mean_score_b|`` at 6 dp.

    Shape for scale: one partial-aggregated groupBy to ≤ ``n_bins``
    rows, one 1-row fold broadcast back — the corpus shuffles only to
    the bin table."""
    s6 = F.round(score.cast("double"), 6)
    b = F.least(F.floor(s6 * n_bins).cast("int"), F.lit(n_bins - 1))
    y = label.cast("boolean").cast("int")
    bins = (
        df.select(b.alias("bin"), s6.alias("__s"), y.alias("__y"))
        .where(F.col("__s").isNotNull() & F.col("__y").isNotNull())
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum("__s") / F.count(F.lit(1))).alias("__ms"),
            (F.sum("__y") / F.count(F.lit(1))).alias("__pr"),
        )
    )
    tot = bins.agg(
        F.sum("n").cast("double").alias("__N"),
        F.sum(
            F.col("n").cast("double")
            * F.abs(F.col("__pr") - F.col("__ms"))
        ).alias("__gap"),
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            F.round(F.col("__ms"), 6).alias("mean_score"),
            F.round(F.col("__pr"), 6).alias("positive_rate"),
            F.round(F.abs(F.col("__pr") - F.col("__ms")), 6).alias("abs_gap"),
            F.round(F.col("__gap") / F.col("__N"), 6).alias("ece"),
        )
        .orderBy("bin")
    )

def classifier_auc(
    df: DataFrame,
    score: Column,
    label: Column,
) -> DataFrame:
    """ROC-AUC of a quality score against a boolean reference label via
    the Mann-Whitney U statistic — the rank-based companion to
    :func:`classifier_reliability`: ECE asks "are the probabilities
    honest?", AUC asks "does the score ORDER documents correctly?"
    (the property that matters when the score is only used to pick a
    keep threshold or as a sampling temperature, where any monotone
    recalibration is free). CCNet/FineWeb-style pipelines report
    exactly this number when validating a distilled filter against
    reference keep decisions.

    AUC = P(score(pos) > score(neg)) + ½·P(tie), computed WITHOUT a
    per-row global rank:

    1. one partial-aggregated groupBy over ``round(score, 6)`` →
       one (score, n_pos, n_neg) row per DISTINCT score value — for a
       6-dp probability score that is ≤ 10^6 + 1 rows whatever the
       corpus size;
    2. a cumulative-negatives window over that bounded distinct-score
       frame (ascending score; the single-partition window holds ≤
       10^6 rows, never the corpus — same bounded-window rule as
       ``zipf_fit``'s top-k rank);
    3. ``U = Σ_s n_pos_s·(cum_neg_below_s + n_neg_s/2)`` folded in ONE
       1-row aggregate; ``auc = U / (N_pos·N_neg)``.

    All accumulation is integer (counts) in ``decimal(38,0)`` — exact
    past the bigint overflow point of ``N_pos·N_neg`` (a 10^12-doc
    corpus squares to ~10^23; long saturates at 9.2·10^18) — with ONE
    double division at the end, so both engines agree bit-for-bit at
    the 6-dp rounding. Rows where either side is NULL are excluded
    from every count (the ``decision_kappa`` NULL policy). Returns one
    row ``(n_pos, n_neg, n_distinct_scores, auc)``; ``auc`` is NULL
    when either class is empty.
    """
    from pyspark.sql import Window

    s6 = F.round(score.cast("double"), 6)
    y = label.cast("boolean")
    per_score = (
        df.select(s6.alias("__s"), y.alias("__y"))
        .where(F.col("__s").isNotNull() & F.col("__y").isNotNull())
        .groupBy("__s")
        .agg(
            F.sum(F.col("__y").cast("int")).cast("long").alias("__np"),
            F.sum((~F.col("__y")).cast("int")).cast("long").alias("__nn"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    dec = "decimal(38,0)"
    contrib = per_score.select(
        F.col("__np"),
        F.col("__nn"),
        (
            F.col("__np").cast(dec)
            * (
                F.coalesce(F.sum("__nn").over(w), F.lit(0)).cast(dec)
                * F.lit(2).cast(dec)
                + F.col("__nn").cast(dec)
            )
        ).alias("__u2"),  # 2·U per score group (×2 keeps ties integral)
    )
    fold = contrib.agg(
        F.sum("__np").cast("long").alias("n_pos"),
        F.sum("__nn").cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_scores"),
        F.sum("__u2").alias("__u2"),
    )
    denom = (
        F.col("n_pos").cast(dec) * F.col("n_neg").cast(dec) * F.lit(2).cast(dec)
    )
    return fold.select(
        "n_pos",
        "n_neg",
        "n_distinct_scores",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("__u2").cast("double") / denom.cast("double"), 6
            ),
        ).alias("auc"),
    )


def calibrate_group_thresholds(
    df: DataFrame,
    group_col: str,
    signal_col: str,
    direction: str = "low",
    target_drop: float = 0.05,
) -> DataFrame:
    """Language-fair (per-group) threshold calibration: the per-GROUP
    exact quantile cut that targets ``target_drop`` within each group,
    plus each group's realized drop. A single global threshold on a
    length/quality signal silently deletes whole languages whose signal
    distribution sits lower (CJK character counts, agglutinative word
    counts) — C4/FineWeb-style pipelines condition thresholds on
    language for exactly this reason; this derives those per-language
    operating points from the corpus itself.

    Same two-scan shape as :func:`calibrate_drop_thresholds`, grouped:
    pass 1 is ONE partial-aggregated groupBy computing each group's
    exact interpolated percentile (Spark SQL ``percentile``) and row
    count; pass 2 broadcast-joins that |groups|-row threshold table
    back and counts realized drops in ONE more grouped aggregate. NULL
    signal values are ignored by the percentile and never dropped by
    the count.

    ``direction``: ``"low"`` drops values strictly below the
    ``target_drop`` quantile; ``"high"`` drops values strictly above
    the ``1 - target_drop`` quantile. Returns
    ``(group, threshold, n, n_dropped, realized_drop)`` with threshold
    and realized_drop at 6 dp.
    """
    if direction not in ("low", "high"):
        raise ValueError(f"direction must be 'low'|'high', got {direction!r}")
    if not 0.0 < target_drop < 1.0:
        raise ValueError(f"target_drop must be in (0,1), got {target_drop}")
    p = target_drop if direction == "low" else 1.0 - target_drop
    s = df.select(
        F.col(group_col).alias("group"),
        F.col(signal_col).cast("double").alias("__v"),
    )
    t = s.groupBy("group").agg(
        F.round(F.percentile(F.col("__v"), F.lit(p)), 6).alias("threshold"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    bad = (
        F.col("__v") < F.col("threshold")
        if direction == "low"
        else F.col("__v") > F.col("threshold")
    )
    # null-safe: a NULL group is a real group (groupBy kept it in the
    # threshold table; a plain equi-join would drop its rows here and
    # lose the whole group from the report)
    sj, tj = s.alias("__cg_s"), F.broadcast(t).alias("__cg_t")
    d = (
        sj.join(
            tj, F.col("__cg_s.group").eqNullSafe(F.col("__cg_t.group"))
        )
        .select(
            F.col("__cg_s.group").alias("group"),
            F.col("__cg_s.__v").alias("__v"),
            F.col("__cg_t.threshold").alias("threshold"),
            F.col("__cg_t.n").alias("n"),
        )
        .groupBy("group", "threshold", "n")
        .agg(F.sum(bad.cast("long")).cast("long").alias("n_dropped"))
    )
    return d.select(
        "group",
        "threshold",
        "n",
        F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long").alias("n_dropped"),
        F.round(
            F.coalesce(F.col("n_dropped"), F.lit(0)).cast("double")
            / F.col("n").cast("double"),
            6,
        ).alias("realized_drop"),
    ).orderBy("group")


def token_budget_curve(
    df: DataFrame,
    score: Column,
    tokens: Column,
    budget: int,
    precision: int = 3,
) -> DataFrame:
    """The token-budget Pareto curve: collapse the corpus to score
    grains (``round(score, precision)``), then walk the grains from
    best score down, accumulating documents and tokens. A training-mix
    planner reads off "keeping everything scoring ≥ s costs T tokens";
    ``within_budget`` marks the prefix affordable under ``budget`` —
    the largest threshold whose cumulative token cost fits. The
    budget-first dual of :func:`calibrate_drop_thresholds` (which is
    drop-rate-first): FineWeb-style pipelines pick operating points
    both ways depending on whether compute or corpus size binds.

    Scale shape: ONE partial-aggregated groupBy collapses the corpus
    to ≤ 10^precision + 1 grain rows; the descending cumsum window
    runs un-partitioned but only over that bounded grain frame (the
    same trick as the ECDF/Gini operators — never a global window
    over raw rows). NULL scores are excluded (they can't be ranked);
    NULL token counts count as 0 cost.

    Returns ``(score, docs, tokens, cum_docs, cum_tokens,
    within_budget)`` ordered by score descending.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if not 0 <= precision <= 6:
        raise ValueError(f"precision must be in [0,6], got {precision}")
    from pyspark.sql import Window

    g = (
        df.where(score.isNotNull())
        .select(
            F.round(score, precision).alias("score"),
            F.coalesce(tokens.cast("long"), F.lit(0)).alias("__t"),
        )
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("__t").cast("long").alias("tokens"),
        )
    )
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return g.select(
        "score",
        "docs",
        "tokens",
        F.sum("docs").over(w).cast("long").alias("cum_docs"),
        F.sum("tokens").over(w).cast("long").alias("cum_tokens"),
        (F.sum("tokens").over(w) <= F.lit(int(budget))).alias(
            "within_budget"
        ),
    ).orderBy(F.col("score").desc())
