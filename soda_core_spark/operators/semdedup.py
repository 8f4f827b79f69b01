"""SemDeDup — semantic deduplication over embeddings (Abbas et al.,
arXiv:2303.09540): k-means-cluster the corpus embeddings, then search for
near-duplicate pairs ONLY within each cluster, so the O(n²) cosine
all-pairs cost becomes Σ_c O(|c|²) — the trick that makes embedding dedup
feasible at 10^12 documents.

Spark-first shape:

* **Assignment is shuffle-free, with two physical forms.** For small k
  the centroids are embedded as literal arrays in one projected
  expression (arg-min via ``array_position(d, array_min(d))`` —
  first-minimum ⇒ deterministic lowest-cluster tie-break): zero Python,
  whole-stage codegen. Published SemDeDup at 10^12 docs needs
  k ≈ 10^4–10^5 to bound |c|, and a 100k × dim literal expression tree
  is a Catalyst plan-size/codegen blowup — so above
  ``BROADCAST_K_THRESHOLD`` assignment switches to an Arrow-batched
  ``mapInPandas`` reading a BROADCAST numpy centroid matrix (the MLlib
  KMeans shape): plan size is O(1) in k, the distance loop accumulates
  dims strictly left-to-right in float64 exactly like the literal
  fold, and ``np.argmin`` takes the first minimum exactly like
  ``array_position`` — the two paths are pinned bit-identical by
  ``tests/test_semdedup.py``.
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

import math
from typing import Iterator, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Test-scale fallbacks for EXPLICIT small runs; ``semdedup``/
#: ``kmeans_fit_assign`` called without ``k`` derive it from the corpus
#: size instead (see ``derive_k``) — k must scale with n to bound |c|.
DEFAULT_K = 8
DEFAULT_ITERATIONS = 3
DEFAULT_THRESHOLD = 0.3

#: Mean cluster size the derived k targets: SemDeDup's cost is
#: Σ_c |c|² ≈ n·mean(|c|), so holding mean |c| ≈ 1k keeps the pair
#: search ~1000× the corpus size — flat per-document work at any scale.
DEFAULT_TARGET_CLUSTER_SIZE = 1024

#: Above this k, centroid-literal assignment is replaced by the
#: broadcast-matrix pandas path: k·dim literal expressions stress
#: Catalyst planning/codegen (measured: plan text grows linearly with
#: k·dim), while the broadcast path is O(1) plan size.
BROADCAST_K_THRESHOLD = 256


def derive_k(n: int, target_cluster_size: int = DEFAULT_TARGET_CLUSTER_SIZE) -> int:
    """k for a corpus of ``n`` vectors: enough clusters that the mean
    cluster holds ~``target_cluster_size`` members (min 2, max n)."""
    if n < 1:
        return 1
    return min(n, max(2, math.ceil(n / target_cluster_size)))


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
    method: str = "auto",
) -> DataFrame:
    """Add ``cluster`` = arg-min distance (ties → lowest cluster index),
    shuffle-free. ``method``: ``"literal"`` (codegen projection, plan
    size O(k·dim) — small k), ``"broadcast"`` (Arrow-batched pandas over
    a broadcast numpy matrix, plan size O(1) — large k), or ``"auto"``
    (broadcast iff ``len(centroids) > BROADCAST_K_THRESHOLD``). Both
    paths accumulate dims strictly left-to-right in float64 and break
    ties to the FIRST minimum, so assignments are bit-identical."""
    if method == "auto":
        method = (
            "broadcast" if len(centroids) > BROADCAST_K_THRESHOLD else "literal"
        )
    if method == "broadcast":
        return _assign_clusters_broadcast(points, centroids, vec_col)
    if method != "literal":
        raise ValueError(f"method must be auto|literal|broadcast: {method}")
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


def _assign_clusters_broadcast(
    points: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "e",
) -> DataFrame:
    """Broadcast-matrix assignment: the k × dim centroid matrix ships to
    executors ONCE as a Spark broadcast (not k·dim plan literals);
    distances are computed per Arrow batch with numpy, vectorized over
    rows but accumulated dim-by-dim in index order — the identical
    float64 add sequence as the literal fold, so arg-min compares the
    same doubles. ``np.argmin`` = first minimum = the literal path's
    ``array_position(d, array_min(d))`` tie-break."""
    import numpy as np

    sc = points.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(centroids, dtype=np.float64))
    from pyspark.sql import types as T

    # fresh StructType — StructType.add mutates in place, and mutating
    # the frame's cached schema desyncs it from the JVM plan
    out_schema = T.StructType(
        list(points.schema.fields) + [T.StructField("cluster", T.IntegerType())]
    )
    cols = list(points.columns)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        M = bc.value  # (k, dim)
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(cluster=pd.Series([], dtype="int32"))
                continue
            E = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])  # (n, dim)
            acc = np.zeros((len(pdf), M.shape[0]), dtype=np.float64)
            for j in range(M.shape[1]):  # strict left-to-right over dims
                diff = E[:, j, None] - M[None, :, j]
                acc += diff * diff
            pdf = pdf[cols].copy()
            pdf["cluster"] = np.argmin(acc, axis=1).astype("int32")
            yield pdf

    return points.mapInPandas(run, out_schema)


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
    k: Optional[int] = None,
    iterations: int = DEFAULT_ITERATIONS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_method: str = "auto",
) -> DataFrame:
    """Fixed-iteration deterministic k-means; returns
    ``(id, e: array<double>, cluster)`` under the FINAL centroids.
    ``k=None`` derives k from the corpus size via :func:`derive_k`
    (mean cluster ≈ ``DEFAULT_TARGET_CLUSTER_SIZE``) — k MUST grow with
    n for the in-cluster pair search to stay bounded, so a fixed
    default would be a scale footgun. Assignment switches to the
    broadcast-matrix path above ``BROADCAST_K_THRESHOLD`` (see
    :func:`assign_clusters`)."""
    pts = embeddings.select(
        F.col(id_col).alias("id"), _as_double_array(F.col(vec_col)).alias("e")
    )
    if k is None:
        k = derive_k(pts.count())
    seeds = (
        pts.orderBy("id").limit(k).collect()
    )
    centroids = [list(r["e"]) for r in seeds]
    assigned = assign_clusters(pts, centroids, method=assign_method)
    for _ in range(iterations):
        centroids = update_centroids(assigned, centroids)
        assigned = assign_clusters(pts, centroids, method=assign_method)
    return assigned


def semdedup(
    embeddings: DataFrame,
    k: Optional[int] = None,
    iterations: int = DEFAULT_ITERATIONS,
    threshold: float = DEFAULT_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_factor: int = 1,
) -> DataFrame:
    """``(vec_id, cluster, is_semdup)`` — a vector is a semantic duplicate
    iff some LOWER-id member of its own cluster has cosine ≥ threshold
    (keep-lowest-id representative rule, reproducible everywhere).
    Cosines are rounded to 4 dp before the threshold compare so both
    engines flip on the same boundary. ``k=None`` derives k from the
    corpus size (:func:`derive_k`) so mean |c| stays bounded.

    Skew: the pair join keys on the cluster id, whose member counts are
    data-dependent — a pathological giant cluster makes a hot key. The
    first defense is AQE skew-join (splits oversized shuffle partitions
    at runtime; enabled in the engine session defaults). When one
    cluster dwarfs AQE's splitting (it can split a partition but every
    pair of the giant cluster still meets in SOME task), pass
    ``block_factor=B > 1``: members are hashed into B blocks and the
    self-join runs per block-PAIR key ``(cluster, p, q), p ≤ q`` —
    triangle blocking, the same bounded-key move as the per-host salted
    repartition in ``operators/dedup.py``. Each side replicates ≤ B×,
    but the largest single join key shrinks from |c|² pair work to
    (|c|/B)² — B ≈ 8–32 tames any real cluster. Every unordered pair
    still meets exactly once (proof in the block construction below),
    so the result is IDENTICAL to ``block_factor=1`` — pinned by
    tests/test_semdedup.py on a pathological one-cluster corpus."""
    if block_factor < 1:
        raise ValueError(f"block_factor must be >= 1, got {block_factor}")
    # NULL/empty vectors cannot cluster or score a cosine — they are
    # excluded from the report entirely (embedding sanity checks own
    # them); left in, they poison the k-means init and the two engines'
    # NULL-distance orderings disagree row by row
    embeddings = embeddings.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    )
    assigned = kmeans_fit_assign(
        embeddings, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    )
    if block_factor > 1:
        B = int(block_factor)
        # block = uniform hash of id into [0, B); the join key is the
        # unordered block PAIR (p ≤ q): the a-side holds block p's
        # members (replicated for q in [p, B)), the b-side block q's
        # (replicated for p in [0, q]). A cross-block pair (bx < by)
        # meets exactly once — as (a from bx, b from by); its id order
        # is arbitrary, so the duplicate is greatest(id), not b.id.
        # A same-block pair (p == q) meets in both orderings; the
        # a.id < b.id guard (applied only when p == q) keeps one.
        blk = F.pmod(F.xxhash64(F.col("id")), F.lit(B)).cast("int")
        based = assigned.withColumn("__blk", blk)
        left = based.withColumn(
            "__q", F.explode(F.sequence(F.col("__blk"), F.lit(B - 1)))
        ).withColumnRenamed("__blk", "__p")
        right = based.withColumn(
            "__p", F.explode(F.sequence(F.lit(0), F.col("__blk")))
        ).withColumnRenamed("__blk", "__q")
        a = left.alias("a")
        b = right.alias("b")
        join_cond = (
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.__p") == F.col("b.__p"))
            & (F.col("a.__q") == F.col("b.__q"))
            & (
                (F.col("a.__p") < F.col("a.__q"))
                | (F.col("a.id") < F.col("b.id"))
            )
        )
    else:
        a = assigned.alias("a")
        b = assigned.alias("b")
        join_cond = (F.col("a.cluster") == F.col("b.cluster")) & (
            F.col("a.id") < F.col("b.id")
        )
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
        a.join(b, join_cond)
        .withColumn("__cs", F.round(dot / (norm("a") * norm("b")), 4))
        .where(F.col("__cs") >= threshold)
        # the duplicate is the HIGHER id of the pair: under the plain
        # join a.id < b.id so this is b.id; under the blocked join a
        # cross-block pair arrives in arbitrary id order
        .select(F.greatest(F.col("a.id"), F.col("b.id")).alias("dup_id"))
        .distinct()
    )
    return assigned.join(
        pairs, assigned["id"] == pairs["dup_id"], "left"
    ).select(
        F.col("id").alias(id_col),
        F.col("cluster").cast("long").alias("cluster"),
        F.col("dup_id").isNotNull().alias("is_semdup"),
    )
