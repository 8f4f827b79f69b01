"""Corpus retrieval operators: BM25 keyword search over the document
table — the inspect-your-training-data tool (find documents matching an
investigation query at corpus scale) and a ranking-quality signal.

Spark-first shape: the inverted index is never materialized — the
explode is filtered to the QUERY terms before any shuffle (predicate on
the exploded value pushes into the generator), so the shuffled relation
is |query terms| × matching docs, not corpus tokens. Per-term document
frequencies and the corpus length stats are broadcast; the final top-k
is orderBy+limit (TakeOrdered — no full sort at any scale).

soda-core has no retrieval surface (SURVEY §2.5); this is a
training-pipeline extension like operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from soda_core_spark.functions.text import words_col


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 for a bag-of-words query.

    idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the non-negative "plus-1"
    form), score = Σ_terms idf · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)).
    Tokenization is the engine contract: lowercased, ASCII-whitespace
    split. Deterministic output: ties break on ascending id; the score
    is rounded to 6 places for cross-engine comparison (raw ordering
    uses the unrounded double).
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    t = F.coalesce(F.col(text_col), F.lit(""))
    # THE engine tokenization contract (functions/text.py words_col) —
    # never re-derived inline, so BM25 can't drift from the signal stack
    words = words_col(F.lower(t))
    base = df.select(F.col(id_col).alias("id"), words.alias("w"))
    lens = base.select("id", F.size("w").cast("double").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select("id", F.explode("w").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df_"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, "id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df_") + 0.5) / (F.col("df_") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    return (
        scored.withColumn("contrib", contrib)
        .groupBy("id")
        .agg(
            F.sum("contrib").alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        )
        .orderBy(F.desc("score"), F.col("id"))
        .limit(k)
        .select(
            F.col("id").alias(id_col),
            F.round("score", 6).alias("bm25"),
            "n_terms_matched",
        )
    )
