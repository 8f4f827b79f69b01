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
