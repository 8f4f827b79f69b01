"""Per-document TF-IDF keyword extraction.

A training-data pipeline uses this for corpus exploration, topic
balancing, and lightweight doc labeling. The reference has no analogue
(its extensibility stops at string-SQL metrics, SURVEY §2.5); this is a
first-class corpus operator in the engine.

Scale shape: one (doc, term) partial aggregate (map-side combined), one
tiny per-term document-frequency aggregate off the first one's output,
a term-keyed join (AQE broadcasts the df side when the vocabulary fits;
stopword-class skew is AQE skew-join territory), and a per-doc window
for the top-k — each document's candidate set is bounded by its own
vocabulary, so no reducer sees more than one document's terms. The
corpus size N enters as a broadcast 1-row aggregate, not a driver
action: the whole thing is a single lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from soda_core_spark.functions.text import words_col


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    Definitions (mirrored exactly by the DuckDB oracle): tokens are the
    lowered whitespace-split non-empty words; tf = raw in-document term
    count; idf = ln((1+N)/(1+df)) + 1 (smoothed, strictly positive, so
    corpus-wide terms still rank below rarer ones); score = tf·idf.
    Ties break on term ascending (binary UTF-8 in both engines), making
    the selection deterministic cross-engine. Documents with no tokens
    yield no rows.

    Returns (id, term, tf, score, rank) with rank in 1..k.
    """
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    pairs = df.select(
        F.col(id_col),
        F.explode(words_col(F.lower(text))).alias("term"),
    )
    tf = pairs.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(docfreq, "term")
        .join(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf")
            * (
                F.log((1 + F.col("__n")) / (1 + F.col("df")))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )
