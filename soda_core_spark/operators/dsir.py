"""Data Selection via Importance Resampling (DSIR) — hashed-n-gram
likelihood-ratio data selection (Xie et al., NeurIPS 2023,
arXiv:2302.03169), re-expressed as three DataFrame aggregations.

The production shape: given a small *target* corpus (e.g. Wikipedia +
books) and the raw crawl, fit two bag-of-hashed-ngrams unigram models
``p`` (target) and ``q`` (raw), score every raw document with the
importance log-weight ``log w(x) = Σ_tokens [log p(b(t)) − log q(b(t))]``
over hash buckets ``b``, and keep the top slice.  At 10^12 documents the
whole computation is:

* one tokenize+explode pass → ``groupBy(doc_id, bucket)`` integer counts
  (map-side partial aggregation collapses the explode before the
  shuffle; cardinality ≤ docs × distinct-buckets-per-doc);
* a re-aggregation of those counts to the global per-bucket table
  (``buckets`` rows — thousands, not billions);
* one **broadcast** join of the tiny log-ratio table back onto the
  per-doc counts and a final ``groupBy(doc_id).sum`` — no all-to-all
  shuffle of raw text ever happens after the first pass.

Selection is a global top-k: Spark's ``orderBy(...).limit(k)`` compiles
to TakeOrdered (per-partition heap top-k, merge-k on the driver), which
is O(n log k) with no full sort — scale-safe for the k ≪ n regime DSIR
targets.  The paper samples with Gumbel noise ∝ w(x); this implementation
is the deterministic top-k variant (noise-free) so a DuckDB oracle can
pin every survivor — swap the ordering column for
``score + gumbel(seed_hash(doc_id))`` to recover sampled DSIR.

Engine-portability: token→bucket uses the 60-bit md5 hash
(``dedup.portable_token_hash``) mod ``buckets``; the per-bucket log-ratio
is rounded to 12 dp *before* scoring (same trajectory-pinning trick as
``linkgraph.host_pagerank``) so double drift can't flip the top-k
boundary across engines or partitionings.

soda-core has no data-selection operator; this extends the quality-filter
family (SURVEY §2 training-pipeline additions) with the standard
importance-resampling selector used for LLM pre-training mixes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from soda_core_spark.functions.text import words_col
from soda_core_spark.operators.dedup import portable_token_hash

#: default bucket count for the hashed vocabulary. The paper uses 10k
#: buckets over uni+bigrams at web scale; tests use fewer so every bucket
#: is well-populated at tiny SF.
DEFAULT_BUCKETS = 256

#: Laplace smoothing mass added to every bucket in both models.
DEFAULT_ALPHA = 1.0


def token_bucket(col: Column, buckets: int = DEFAULT_BUCKETS) -> Column:
    """Engine-portable hash bucket for one token (md5-based, so the DuckDB
    oracle reproduces it digit for digit)."""
    return portable_token_hash(col) % buckets


def hashed_token_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "is_target",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """One pass over the corpus → integer counts per (doc, bucket).

    ``(id, bucket, is_target, n)`` — the only frame whose size is
    O(corpus); everything downstream is O(buckets) or O(docs).  The
    explode is collapsed by map-side partial aggregation before the
    (id, bucket) shuffle.
    """
    w = F.explode(words_col(F.coalesce(F.col(text_col), F.lit("")))).alias("w")
    tok = docs.select(F.col(id_col).alias("id"), F.col(target_col), w)
    return (
        tok.withColumn("bucket", token_bucket(F.col("w"), buckets))
        .groupBy("id", "bucket", target_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bucket_log_ratios(
    counts: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
    target_col: str = "is_target",
) -> DataFrame:
    """Fit both unigram models and return ``(bucket, lr)`` where
    ``lr = log p_target(bucket) − log q_raw(bucket)``, Laplace-smoothed,
    rounded to 12 dp (trajectory pin).

    ``q_raw`` is fit on the FULL corpus (target ∪ candidates), matching
    the paper's raw-distribution definition.  Output is ≤ ``buckets``
    rows — always broadcastable.
    """
    per_bucket = counts.groupBy("bucket").agg(
        F.sum("n").alias("raw_c"),
        F.sum(F.when(F.col(target_col), F.col("n")).otherwise(F.lit(0))).alias(
            "tgt_c"
        ),
    )
    totals = per_bucket.agg(
        F.sum("raw_c").alias("raw_t"), F.sum("tgt_c").alias("tgt_t")
    )
    a = float(alpha)
    b = float(buckets)
    j = per_bucket.crossJoin(F.broadcast(totals))
    lr = F.log(
        (F.col("tgt_c").cast("double") + F.lit(a))
        / (F.col("tgt_t").cast("double") + F.lit(a) * F.lit(b))
    ) - F.log(
        (F.col("raw_c").cast("double") + F.lit(a))
        / (F.col("raw_t").cast("double") + F.lit(a) * F.lit(b))
    )
    return j.select("bucket", F.round(lr, 12).alias("lr"))


def dsir_scores(
    counts: DataFrame,
    log_ratios: DataFrame,
    target_col: str = "is_target",
) -> DataFrame:
    """Importance log-weight per candidate document (non-target rows of
    ``counts``): broadcast-join the tiny log-ratio table, weight by the
    integer token count, sum per doc.  Rounded to 6 dp — terms are
    12 dp-pinned, so only the per-doc summation order can drift, at
    ~1e-12 ≪ the rounding grain."""
    cand = counts.where(~F.col(target_col))
    scored = cand.join(F.broadcast(log_ratios), "bucket").groupBy("id").agg(
        F.round(F.sum(F.col("n").cast("double") * F.col("lr")), 6).alias(
            "dsir_score"
        )
    )
    return scored


def dsir_select(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "is_target",
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """End-to-end deterministic DSIR: fit on (target vs raw), score the
    candidate pool, return the k highest-weight candidates as
    ``(doc_id, dsir_score)`` with ties broken by doc id (so the survivor
    *set* is reproducible across engines and partitionings)."""
    counts = hashed_token_counts(
        docs, text_col=text_col, id_col=id_col, target_col=target_col,
        buckets=buckets,
    )
    lrs = bucket_log_ratios(
        counts, buckets=buckets, alpha=alpha, target_col=target_col
    )
    scores = dsir_scores(counts, lrs, target_col=target_col)
    return (
        scores.orderBy(F.col("dsir_score").desc(), F.col("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "dsir_score")
    )
