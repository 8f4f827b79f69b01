"""Distributed classifier training — batch gradient descent for the
quality classifier, the training half of ``functions/classifier.py``
(which ships frozen weights for inference).

The production pattern (CCNet, RefinedWeb, FineWeb-Edu): label a corpus
slice with cheap heuristics or an expensive teacher, then *distill* the
labels into a fast linear classifier whose inference is pure column
arithmetic. Training at corpus scale is embarrassingly aggregative:
logistic-regression batch GD needs only ``avg((σ(w·x) − y) · x)`` per
iteration — ONE whole-corpus aggregation with map-side partial combine,
no shuffle of rows, no parameter server. Weights (a handful of doubles)
live on the driver exactly like ``semdedup``'s k-means centroids, are
folded into the next iteration's projection as literals, and are rounded
to 12 dp per step so the training trajectory is bit-reproducible across
engines and partitionings (the ``linkgraph.host_pagerank`` pin — the
DuckDB oracle replays every iteration).

MLlib's LogisticRegression does the same dataflow (treeAggregate of
gradients) with L-BFGS; this deterministic fixed-step form exists so the
result is *oracle-checkable* and engine-portable — swap in MLlib when you
want line search over reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LR = 1.0
DEFAULT_ITERATIONS = 20
ROUND_DP = 12


def standardize_stats(
    df: DataFrame, feature_cols: list[str]
) -> tuple[list[float], list[float]]:
    """Per-feature (mean, population stddev) in ONE aggregation, rounded
    to 12 dp in-engine; zero/NULL stddev → 1.0 (constant feature passes
    through centered). Standardizing first is what lets plain fixed-step
    GD converge in ~20 steps on features of very different scales."""
    aggs = []
    for j, c in enumerate(feature_cols):
        aggs.append(F.round(F.avg(c), ROUND_DP).alias(f"m{j}"))
        aggs.append(F.round(F.stddev_pop(c), ROUND_DP).alias(f"s{j}"))
    row = df.agg(*aggs).collect()[0]
    mu = [float(row[f"m{j}"] or 0.0) for j in range(len(feature_cols))]
    sd = []
    for j in range(len(feature_cols)):
        s = row[f"s{j}"]
        sd.append(float(s) if s is not None and s > 0 else 1.0)
    return mu, sd


def _logit(features: list[Column], weights: list[float], bias: float) -> Column:
    z = F.lit(float(bias))
    for c, w in zip(features, weights):
        z = z + F.lit(float(w)) * c
    return z


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(
    df: DataFrame,
    feature_cols: list,
    label_col: str,
    lr: float = DEFAULT_LR,
    iterations: int = DEFAULT_ITERATIONS,
) -> tuple[list[float], float]:
    """Batch-GD logistic regression; returns ``(weights, bias)``.
    ``feature_cols`` may be column names or Column expressions.

    Each iteration is one ``df.agg`` of d+1 averages — the only cluster
    communication is that aggregation's tree reduction. Deterministic:
    fixed zero init, fixed step, weights rounded to 12 dp per iteration.
    """
    feats = [F.col(c) if isinstance(c, str) else c for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * len(feature_cols)
    b = 0.0
    for _ in range(iterations):
        p = _sigmoid(_logit(feats, w, b))
        err = p - y
        aggs = [F.avg(err * c).alias(f"g{j}") for j, c in enumerate(feats)]
        aggs.append(F.avg(err).alias("g_bias"))
        g = df.agg(*aggs).collect()[0]
        w = [
            round(w[j] - lr * g[f"g{j}"], ROUND_DP)
            for j in range(len(w))
        ]
        b = round(b - lr * g["g_bias"], ROUND_DP)
    return w, b


def logreg_score(
    features: list[Column], weights: list[float], bias: float
) -> Column:
    """σ(w·x + b) with driver-held weights as literals — inference stays
    inside whole-stage codegen."""
    return _sigmoid(_logit(features, weights, bias))


def distill_quality_classifier(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = DEFAULT_LR,
    iterations: int = DEFAULT_ITERATIONS,
    threshold: float = 0.5,
    standardize: bool = True,
) -> DataFrame:
    """Fit on the heuristic labels, then score the same frame:
    ``(… input cols …, score, pred_keep)``."""
    if standardize:
        mu, sd = standardize_stats(df, feature_cols)
        feats = [
            (F.col(c) - F.lit(mu[j])) / F.lit(sd[j])
            for j, c in enumerate(feature_cols)
        ]
    else:
        feats = [F.col(c) for c in feature_cols]
    w, b = logreg_fit(df, feats, label_col, lr=lr, iterations=iterations)
    score = logreg_score(feats, w, b)
    return df.withColumn("score", score).withColumn(
        "pred_keep", score >= threshold
    )
