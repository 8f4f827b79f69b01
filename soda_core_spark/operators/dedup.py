"""Deduplication operators for web-scale training corpora.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup, each designed
around Spark's shuffle model:

* exact: hash-groupBy on a normalized fingerprint — one shuffle on a
  64-bit key; survivor chosen with ``min_by`` (no window sort),
* MinHash+LSH: signatures are pure column expressions (xxhash64 over
  shingles — JVM-side, no UDF); banding turns near-dup search into an
  equi-join on band keys (shuffle on small keys, never all-pairs),
* SimHash: 64-bit fingerprint via bitwise majority over token hashes,
  computed with higher-order functions; near-dups bucket by rotated
  prefixes,
* verification: exact Jaccard over shingle sets for candidate pairs only.

soda-core's duplicate machinery is count-only (duplicate_check.py:58-343);
these operators materialize the dedup decision per row, which is the
training-pipeline extension the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed, lowercased text — the exact-dedup identity."""
    return F.lower(F.regexp_replace(F.trim(text), "[ \\t\\n\\r]+", " "))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per normalized-text fingerprint: the one with the
    smallest id (deterministic survivor). ``min_by`` aggregation — a single
    hash-shuffle, no row_number window (no per-group sort, no skew from a
    giant duplicate class beyond the agg combiner)."""
    fp = F.md5(normalized_text(F.col(text_col))).alias("__fp")
    surviv = (
        df.select(fp, F.col(id_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
    )
    # semi join back to recover full rows; broadcast not assumed (survivors
    # can be nearly the full table)
    return df.join(surviv, on=id_col, how="left_semi")


def duplicate_classes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(fingerprint, n_copies, min_id) per duplicate class with >1 member —
    the audit view of exact dedup."""
    fp = F.md5(normalized_text(F.col(text_col))).alias("fp")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("min_id"))
        .where(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram array (default 3-shingles), lowercased."""
    words = F.filter(
        F.split(F.lower(text), "[ \\t\\n\\r]+"), lambda w: w != ""
    )
    k = F.size(words)
    cols = [F.slice(words, i + 1, k - (n - 1)) for i in range(n)]
    grams = cols[0]
    for c in cols[1:]:
        grams = F.zip_with(grams, c, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", words))
    )


def _salted_hash(i: int):
    # NB: must be a single-param lambda via closure — a default-arg lambda
    # (lambda s, i=i: ...) is seen by pyspark as the two-param
    # (element, index) form and the salt silently becomes the array index
    return lambda s: F.xxhash64(F.lit(i), s)


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for hash i, min over xxhash64(i, shingle).
    Pure column expressions — each hash family member is the same xxhash64
    salted by a literal, evaluated JVM-side over the shingle array."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, _salted_hash(i)))
            for i in range(num_hashes)
        ]
    )


def lsh_band_keys(signature: Column, bands: int, rows: int) -> Column:
    """Array of ``bands`` band keys; docs sharing ANY band key are
    candidates. Key = hash of (band index, the band's signature slice)."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(b), F.concat_ws(",", *[
                    F.element_at(signature, b * rows + r + 1).cast("string")
                    for r in range(rows)
                ])
            )
            for b in range(bands)
        ]
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) with exact shingle-Jaccard
    verification.

    Scale path, stage by stage:
    1. signatures + band keys are per-row column expressions — no shuffle;
    2. the band self-join runs over bare ``(id, band)`` pairs (16 bytes a
       row) — NOT over the shingle arrays, which would be duplicated
       ``bands``× through the shuffle;
    3. candidate (id_a, id_b) pairs are deduped, then shingle arrays are
       re-attached by two id-joins, so each doc's shingles cross the wire
       once per side;
    4. exact Jaccard verifies candidates only.
    A giant duplicate cluster makes a hot band key; AQE skew-join splits
    it (spark.sql.adaptive.skewJoin)."""
    rows = num_hashes // bands
    sh = shingles_col(F.col(text_col), shingle_n)
    base = df.select(F.col(id_col).alias("id"), sh.alias("sh"))
    banded = base.withColumn(
        "sig", minhash_signature(F.col("sh"), num_hashes)
    ).select(
        "id", F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("band")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    enriched = pairs.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        enriched.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    join_key: Column | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs grouped by ``join_key``
    (default: equal word count bucket — a cheap blocking key). For true
    all-pairs use minhash_near_duplicates instead; this exists as the
    exact oracle-able variant."""
    sh = shingles_col(F.col(text_col), n)
    key = join_key if join_key is not None else F.md5(normalized_text(F.col(text_col)))
    base = df.select(F.col(id_col).alias("id"), sh.alias("sh"), key.alias("k"))
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b, (F.col("a.k") == F.col("b.k")) & (F.col("a.id") < F.col("b.id"))
    )
    inter = F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
    union = F.size(F.array_union("a.sh", "b.sh")).cast("double")
    return pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (inter / union).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: Column) -> Column:
    """64-bit SimHash over word tokens, entirely with built-in functions:
    per bit, majority vote of token-hash bits (+1/−1), sign → bit. The
    per-bit fold is ``aggregate`` over the token-hash array — interpreted
    but JVM-side; for the hot path prefer minhash (cheaper per row)."""
    words = F.filter(F.split(F.lower(text), "[ \\t\\n\\r]+"), lambda w: w != "")
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    def _vote_fn(b: int):
        # two-param closure, NOT a default-arg lambda (see _salted_hash)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for bit in range(64):
        vote = F.aggregate(hashes, F.lit(0), _vote_fn(bit))
        bit_cols.append(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), bit)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out
