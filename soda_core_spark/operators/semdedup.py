"""SemDeDup — semantic deduplication over embeddings (Abbas et al.,
arXiv:2303.09540): k-means-cluster the corpus embeddings, then search for
near-duplicate pairs ONLY within each cluster, so the O(n²) cosine
all-pairs cost becomes Σ_c O(|c|²) — the trick that makes embedding dedup
feasible at 10^12 documents.

Spark-first shape:

* **Assignment is a pure projection.** Centroids live on the driver
  (k × dim doubles — a few KB), embedded as literal arrays; every row
  computes its k distances inside one projected expression and takes the
  arg-min via ``array_position(d, array_min(d))`` (first-minimum ⇒
  deterministic lowest-cluster tie-break). No join, no shuffle — the same
  shape MLlib's KMeans uses, minus its RDD API.
* **Update is one partial-aggregated groupBy.** ``posexplode`` the dim
  values → ``groupBy(cluster, dim).agg(sum, count)`` (k·dim groups —
  hundreds, map-side combine collapses nearly everything) → means back to
  the driver for the next round's literals.
* **The pair search joins each cluster only with itself** — the join key
  IS the cluster id, so Catalyst shuffles both sides once on a key whose
  cardinality k was chosen to bound |c|; skewed clusters are AQE's
  skew-join case.

Determinism across engines and partitionings (the DuckDB oracle replays
every step):

* distances fold dims strictly left-to-right (``F.aggregate`` over
  ``zip_with`` ⇔ DuckDB ``list_reduce``/``list_transform``) from a 0.0
  accumulator — bit-identical doubles, so arg-min can compare exactly;
* per-iteration centroid means are rounded to 12 dp (the
  ``linkgraph.host_pagerank`` trajectory pin) before re-broadcast;
* fixed iteration count, seeds = the k lowest vec_ids.

The number of iterations is small and fixed (SemDeDup's clustering only
needs to be *good enough* to co-locate near-duplicates, not converged).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 8
DEFAULT_ITERATIONS = 3
DEFAULT_THRESHOLD = 0.3


def _as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _sq_dist(e: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a driver-held centroid, dims folded in index
    order from 0.0 so every engine/partitioning produces the same double."""
    c = F.array(*[F.lit(float(v)) for v in centroid])
    diffs = F.zip_with(e, c, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(
    points: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "e",
) -> DataFrame:
    """Add ``cluster`` = arg-min distance (ties → lowest cluster index),
    as a shuffle-free projection."""
    e = F.col(vec_col)
    dists = F.array(*[_sq_dist(e, c) for c in centroids])
    # materialize the distance array once — HOF expressions are interpreted
    # with no common-subexpression elimination, so referencing it twice
    # (min + position) without a projection boundary would fold k·dim twice
    with_d = points.withColumn("__dists", dists)
    cluster = (
        F.array_position(F.col("__dists"), F.array_min(F.col("__dists"))) - 1
    ).cast("int")
    return with_d.withColumn("cluster", cluster).drop("__dists")


def update_centroids(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "e",
) -> list[list[float]]:
    """New centroid = per-dim mean of members, rounded to 12 dp in-engine;
    empty clusters keep their previous centroid."""
    dims = (
        assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("j", "v"))
        .groupBy("cluster", "j")
        .agg(
            F.round(F.sum("v") / F.count(F.lit(1)), 12).alias("m")
        )
    )
    rows = dims.collect()
    out = [list(c) for c in centroids]
    by_cluster: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], {})[r["j"]] = r["m"]
    for cl, dims_map in by_cluster.items():
        for j, m in dims_map.items():
            out[cl][j] = m
    return out


def kmeans_fit_assign(
    embeddings: DataFrame,
    k: int = DEFAULT_K,
    iterations: int = DEFAULT_ITERATIONS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-iteration deterministic k-means; returns
    ``(id, e: array<double>, cluster)`` under the FINAL centroids."""
    pts = embeddings.select(
        F.col(id_col).alias("id"), _as_double_array(F.col(vec_col)).alias("e")
    )
    seeds = (
        pts.orderBy("id").limit(k).collect()
    )
    centroids = [list(r["e"]) for r in seeds]
    assigned = assign_clusters(pts, centroids)
    for _ in range(iterations):
        centroids = update_centroids(assigned, centroids)
        assigned = assign_clusters(pts, centroids)
    return assigned


def semdedup(
    embeddings: DataFrame,
    k: int = DEFAULT_K,
    iterations: int = DEFAULT_ITERATIONS,
    threshold: float = DEFAULT_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, cluster, is_semdup)`` — a vector is a semantic duplicate
    iff some LOWER-id member of its own cluster has cosine ≥ threshold
    (keep-lowest-id representative rule, reproducible everywhere).
    Cosines are rounded to 4 dp before the threshold compare so both
    engines flip on the same boundary."""
    assigned = kmeans_fit_assign(
        embeddings, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.e"), F.col("b.e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(f"{side}.e"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn("__cs", F.round(dot / (norm("a") * norm("b")), 4))
        .where(F.col("__cs") >= threshold)
        .select(F.col("b.id").alias("dup_id"))
        .distinct()
    )
    return assigned.join(
        pairs, assigned["id"] == pairs["dup_id"], "left"
    ).select(
        F.col("id").alias(id_col),
        F.col("cluster").cast("long").alias("cluster"),
        F.col("dup_id").isNotNull().alias("is_semdup"),
    )
