"""Document-quality classifier: a logistic model over the heuristic text
signals, evaluated entirely as a JVM-side Column expression.

The production pattern this stands in for is a fastText/logreg quality
classifier (weights trained offline, inference in the pipeline). Here the
*weights are data* (a frozen dict) and inference is pure arithmetic over
the already-oracled signal columns — so scoring stays inside whole-stage
codegen (zero Python, fuses with the other signals in one projection) and
the DuckDB oracle can reproduce it term for term. Swap ``WEIGHTS`` for a
trained vector without touching the plan.

soda-core has no model scoring; this is the training-pipeline extension
the north rule's "quality scoring" asks for, shaped so a real classifier
drops in: linear-over-features is exactly fastText's classifier head with
pre-pooled features.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from soda_core_spark.functions.text import (
    alnum_ratio,
    bigram_repetition,
    stopword_density,
    words_col,
)

#: frozen model weights (feature name → weight) + intercept. Signs follow
#: the Gopher-rule intuition: longer docs with prose-like stopword density
#: and alphanumeric content score high; heavy repetition scores low.
WEIGHTS: dict[str, float] = {
    "log_chars": 0.9,
    "stopword_density": 6.0,
    "alnum_ratio": 3.0,
    "bigram_repetition": -5.0,
}
INTERCEPT: float = -7.5

#: keep threshold on the sigmoid score (documented operating point)
DEFAULT_THRESHOLD: float = 0.5


def quality_features(text: Column) -> dict[str, Column]:
    """The model's feature map. ``log_chars`` is ln(1+n_chars) capped at
    ln(1+20000) — length rewards saturate, like real quality classifiers'
    length buckets."""
    w = words_col(text)
    n = F.length(F.coalesce(text, F.lit("")))
    log_chars = F.least(F.log1p(n.cast("double")), F.log1p(F.lit(20000.0)))
    return {
        "log_chars": log_chars,
        "stopword_density": stopword_density(w),
        "alnum_ratio": alnum_ratio(text),
        "bigram_repetition": bigram_repetition(w),
    }


def quality_logit(text: Column) -> Column:
    feats = quality_features(text)
    z: Column = F.lit(float(INTERCEPT))
    for name, weight in WEIGHTS.items():
        z = z + F.lit(float(weight)) * feats[name]
    return z


def quality_score(text: Column) -> Column:
    """P(high quality) = sigmoid(w·x + b), all codegen arithmetic."""
    z = quality_logit(text)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def ccnet_quality_buckets(
    df,
    score: Column,
    lang_col: str = "lang",
    lower_q: float = 0.25,
    upper_q: float = 0.75,
    score_col: str = "quality_score",
    bucket_col: str = "quality_bucket",
):
    """CCNet-style per-language quality tiers (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): within each language, split documents into head / middle /
    tail by that language's own score quantiles instead of one global
    threshold — a global cutoff would keep mostly-English and starve
    low-resource languages whose score distributions sit lower.

    head: score > per-lang ``upper_q`` quantile; tail: score <
    ``lower_q`` quantile; middle otherwise (boundary values are middle,
    matching CCNet's closed middle band).

    Scale shape: the cutoffs are ONE tiny aggregate (|languages| rows —
    exact ``percentile`` here for oracle parity; swap ``percentile_approx``
    at the 10^12-doc regime, its t-digest merges partial-agg style so no
    language concentrates on one reducer) broadcast-joined back, then the
    bucket label is pure codegen CASE — the corpus itself is scanned
    once and never shuffled. Scores are rounded to 6dp BEFORE the
    quantile so the cutoff comparison is stable across engines'
    float-summation orders.

    Quantile positions use linear interpolation at rank p*(n-1) — the
    same definition as DuckDB's quantile_cont, so an oracle can replay
    the cutoffs. Engines may still disagree on a cutoff's LAST BIT
    (interpolation arithmetic order), so the comparison carries a 1e-9
    margin: with quarter quantiles over 6dp-rounded scores a cutoff is
    either exactly a score value or ≥ 2.5e-7 away from every score, so
    the margin absorbs ulp drift without ever flipping a true decision.
    """
    if not 0.0 <= lower_q < upper_q <= 1.0:
        raise ValueError(
            f"need 0 <= lower_q < upper_q <= 1, got {lower_q}, {upper_q}"
        )
    eps = 1e-9
    s6 = F.round(score, 6)
    scored = df.withColumn(score_col, s6)
    cuts = scored.groupBy(lang_col).agg(
        F.expr(f"percentile({score_col}, {lower_q!r})").alias("__q_lo"),
        F.expr(f"percentile({score_col}, {upper_q!r})").alias("__q_hi"),
    )
    bucket = (
        F.when(F.col(score_col) > F.col("__q_hi") + eps, F.lit("head"))
        .when(F.col(score_col) < F.col("__q_lo") - eps, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return (
        scored.join(F.broadcast(cuts), lang_col)
        .withColumn(bucket_col, bucket)
        .drop("__q_lo", "__q_hi")
    )
