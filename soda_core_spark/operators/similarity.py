"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine top-k: exact baseline — broadcast the (small) query
  set, JVM-side dot products via ``aggregate``/``zip_with``, per-query
  top-k with a window over partial results,
* LSH-bucketed (random hyperplane / SRP) variant: the scale path — each
  vector hashes to a ``n_planes``-bit bucket; candidates share a bucket,
  so the join is an equi-join on bucket id instead of a cross join.

The reference has no vector operations at all (soda-core is metrics-only);
these are the training-pipeline extension operators. Built-ins only — the
dot product is ``F.aggregate(F.zip_with(a, b, *), 0d, +)``, no UDF.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a.cast("array<double>"), b.cast("array<double>")) / (
        l2_norm(a) * l2_norm(b)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` is broadcast (it must be small — the corpus is the big
    side and streams through one partition-local pass; no corpus shuffle).
    Result: (query_id, neighbor_id, cos_sim, rank), excluding self-pairs.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _random_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — dependency-free,
    stable across workers; shipped as literals into the plan)."""
    state = seed * 6364136223846793005 + 1442695040888963407
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1) via Box-Muller-free triangular-ish transform
            u = (state >> 11) / float(1 << 53)
            row.append(math.sqrt(-2.0 * math.log(max(u, 1e-12))) * math.cos(
                2.0 * math.pi * ((state >> 1) % (1 << 30)) / float(1 << 30)
            ))
        planes.append(row)
    return planes


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: bit b = sign(vec · plane_b).
    Pure column arithmetic; ``planes`` become literal arrays in the plan."""
    bits = []
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot(vec.cast("array<double>"), p) >= 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for c in bits[1:]:
        out = out.bitwiseOR(c)
    return out


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    ``n_planes=0`` is the exact all-pairs baseline (only for small/test
    corpora — O(n²)). With ``n_planes>0`` candidates come from SRP
    buckets: the join shuffles on bucket id and only intra-bucket pairs
    are scored — the scale path (recall < 1, tunable via n_planes).

    The exact path repartitions its stream side to the session's
    default parallelism first: the non-equi self-join is a
    BroadcastNestedLoopJoin whose task count is otherwise the SCAN
    split count — a corpus in one parquet file would grind the O(n²)
    pair work through 1-2 tasks while the rest of the cluster idles
    (measured: the sf1.0 sweep's one straggler)."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if n_planes <= 0:
        base = base.repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )
    if n_planes > 0:
        planes = _random_planes(dim, n_planes, seed)
        base = base.withColumn("bucket", srp_bucket(F.col("v"), planes))
        join_cond = (F.col("a.bucket") == F.col("b.bucket")) & (
            F.col("a.id") < F.col("b.id")
        )
    else:
        join_cond = F.col("a.id") < F.col("b.id")
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, join_cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors in the query's SRP
    bucket; exact cosine re-rank within candidates. At 16 planes the
    bucket count (65k) divides a 10^9-vector corpus into ~15k-vector
    buckets — the join shuffles on bucket id, never cross-joins. Recall
    tunes with ``n_planes`` (fewer planes → bigger buckets → higher
    recall, more compute)."""
    planes = _random_planes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
    ).withColumn("bucket", srp_bucket(F.col("__cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("bucket", srp_bucket(F.col("__qv"), planes))
    scored = c.join(F.broadcast(q), on="bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed codes + asymmetric-distance search
# ---------------------------------------------------------------------------


def _l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 between two double arrays — sequential left-to-right
    fold (reproducible cross-engine)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _codebook_df(spark, codebooks: list[list[list[float]]]):
    return spark.createDataFrame(
        [
            (s, c, [float(x) for x in cent])
            for s, cb in enumerate(codebooks)
            for c, cent in enumerate(cb)
        ],
        "s int, code int, cent array<double>",
    )


def _pq_subvectors(df: DataFrame, n_subspaces: int, sub: int,
                   id_col: str, vec_col: str) -> DataFrame:
    """(id, s, sv): one row per vector per subspace. Explode is per-row
    (no shuffle); the subvector arrays are small (``sub`` doubles)."""
    v = F.col(vec_col).cast("array<double>")
    blocks = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"), F.slice(v, s * sub + 1, sub).alias("sv")
            )
            for s in range(n_subspaces)
        ]
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(blocks).alias("b")
    ).select("id", F.col("b.s").alias("s"), F.col("b.sv").alias("sv"))


def _pq_assignments(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, s, code): nearest code per (vector, subspace) — explode to
    subvectors, broadcast-join the codebook table, ONE distance fold per
    candidate row, struct-min argmin (ties to the lower code). This join
    form keeps the expression tree tiny (vs n_subspaces × n_codes inline
    literal branches, which cost more to analyze than to run) and is the
    shape that scales: the shuffle-free explode fans out ×n_subspaces,
    the broadcast fans each row ×n_codes inside the task, and the
    groupBy's map-side partial min collapses it all before any wire."""
    sub = len(codebooks[0][0])
    subs = _pq_subvectors(df, len(codebooks), sub, id_col, vec_col)
    cb = _codebook_df(df.sparkSession, codebooks)
    scored = subs.join(F.broadcast(cb), "s").select(
        "id", "s", "code", _l2_sq(F.col("sv"), F.col("cent")).alias("d")
    )
    return scored.groupBy("id", "s").agg(
        F.min(F.struct(F.col("d"), F.col("code"))).alias("m")
    ).select("id", "s", F.col("m.code").alias("code"))


def pq_train(
    df: DataFrame,
    dim: int,
    n_subspaces: int = 8,
    n_codes: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_rows: Optional[int] = 100_000,
) -> list[list[list[float]]]:
    """Per-subspace L2 k-means codebooks (the PQ quantizer, Jégou et al.
    2011): the vector splits into ``n_subspaces`` contiguous blocks; each
    block gets its own ``n_codes``-centroid codebook, so a vector stores
    as ``n_subspaces`` small ints (e.g. 8 bytes for 64-dim float32 — a
    32× compression) and a 10^12-vector index fits where raw vectors
    cannot. Deterministic like :func:`kmeans_centroids`: md5-threshold
    sample, md5-ordered init, Lloyd means via posexplode+groupBy.
    Returns ``codebooks[s][c] = centroid vector of code c in subspace s``
    (plain lists — they ship into the encode/search plans)."""
    if dim % n_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    # NULL/empty vectors cannot train a quantizer — and a single NULL
    # reaching the init collect would crash the float() materialization
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).where(F.col("v").isNotNull() & (F.size("v") > 0))
    if max_train_rows is not None:
        n = base.count()
        if n > max_train_rows:
            frac = max_train_rows / n
            h = F.conv(
                F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
            ).cast("double")
            base = base.where(h < frac * float(1 << 60))
    init = (
        base.orderBy(F.md5(F.col("id").cast("string")))
        .limit(n_codes)
        .select("v")
        .collect()
    )
    if not init:
        raise ValueError("pq_train: input has no rows")
    codebooks = [
        [[float(x) for x in r["v"][s * sub : (s + 1) * sub]] for r in init]
        for s in range(n_subspaces)
    ]
    for _ in range(n_iters):
        assign = _pq_assignments(base, codebooks, "id", "v")
        subs = _pq_subvectors(base, n_subspaces, sub, "id", "v")
        means = (
            subs.join(assign, ["id", "s"])
            .select("s", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("s", "code", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_key: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_key.setdefault((r["s"], r["code"]), {})[r["pos"]] = r["m"]
        codebooks = [
            [
                [by_key[(s, c)][p] for p in sorted(by_key[(s, c)])]
                if (s, c) in by_key
                else codebooks[s][c]  # empty code keeps its centroid
                for c in range(len(codebooks[s]))
            ]
            for s in range(n_subspaces)
        ]
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes) — the compressed corpus representation. One explode +
    broadcast join + partial-agg argmin + one regroup; at scale this is
    the single full-vector pass after which the raw embeddings never
    need to be scanned again for search."""
    assign = _pq_assignments(df, codebooks, id_col, vec_col)
    return assign.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("s"), F.col("code")))),
            lambda x: x["code"],
        ).alias("codes")
    ).withColumnRenamed("id", id_col)


def pq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by asymmetric distance (ADC): the query stays a
    full vector, each corpus vector is its decoded centroid chain, so
    distance ≈ Σ_s ||q_s − codebook[s][code_s]||². Shape: corpus codes
    explode to (id, s, code) and join the broadcast (query × codebook)
    distance TABLE on (query, s, code) — the classic precomputed-ADC
    lookup — then one groupBy sums the n_subspaces partial distances.
    The corpus side carries only code ints; raw embeddings are never
    touched at search time. Returns (query_id, neighbor_id, approx_dist,
    rank)."""
    sub = len(codebooks[0][0])
    nsub = len(codebooks)
    # per-query distance table: (query_id, s, code, qd) — tiny
    # (n_queries × n_subspaces × n_codes), built once and broadcast
    qsubs = _pq_subvectors(queries, nsub, sub, id_col, vec_col).withColumnRenamed(
        "id", "query_id"
    )
    cb = _codebook_df(corpus_codes.sparkSession, codebooks)
    qtable = qsubs.join(F.broadcast(cb), "s").select(
        "query_id", "s", "code", _l2_sq(F.col("sv"), F.col("cent")).alias("qd")
    )
    c = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("s", "code"),
    )
    scored = (
        c.join(F.broadcast(qtable), ["s", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd").alias("approx_dist"), F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") == nsub)  # guard: all subspaces matched
        .drop("__n")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + probed cell search
# ---------------------------------------------------------------------------


def kmeans_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_rows: Optional[int] = 100_000,
) -> list[list[float]]:
    """Deterministic spherical k-means (Lloyd) for the IVF coarse
    quantizer, returned as plain driver-side lists (they are broadcast as
    literals into the assignment expression).

    The trainer operates on a deterministic md5-threshold SAMPLE of at
    most ~``max_train_rows`` vectors (standard IVF practice: the
    quantizer needs thousands of vectors, not 10^12 — one count job picks
    the keep fraction, then init and every Lloyd iteration scan only the
    sample); the FULL corpus is later assigned with the fitted centroids
    by :func:`ivf_topk`. ``max_train_rows=None`` trains on everything.

    Initialization is md5-ordered row selection — same centroids
    regardless of partitioning; if the (sampled) input has fewer rows
    than ``n_centroids`` the centroid count clamps to the row count.
    Each iteration: assign (argmax cosine, pure column expressions) →
    per-cluster element-wise mean via posexplode + groupBy(cluster, dim)
    — a shuffle of n·dim scalar rows with full map-side partial
    aggregation.
    """
    # NULL/empty vectors cannot train a quantizer — and a single NULL
    # reaching the init collect would crash the float() materialization
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).where(F.col("v").isNotNull() & (F.size("v") > 0))
    if max_train_rows is not None:
        n = base.count()
        if n > max_train_rows:
            # deterministic hash sample: keep rows whose 60-bit md5 prefix
            # falls under the keep fraction — portable, partition-stable
            frac = max_train_rows / n
            h = F.conv(
                F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
            ).cast("double")
            base = base.where(h < frac * float(1 << 60))
    init = (
        base.orderBy(F.md5(F.col("id").cast("string")))
        .limit(n_centroids)
        .select("v")
        .collect()
    )
    centroids = [[float(x) for x in r["v"]] for r in init]
    n_centroids = len(centroids)  # clamp: input may have fewer rows
    if not centroids:
        raise ValueError("kmeans_centroids: input has no rows")
    for _ in range(n_iters):
        assign = _argmax_centroid(F.col("v"), centroids)
        means = (
            base.withColumn("c", assign)
            .select("c", F.posexplode(F.col("v").cast("array<double>")))
            .groupBy("c", "pos")
            .agg(F.avg("col").alias("m"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(r["c"], {})[r["pos"]] = r["m"]
        # empty cells keep their previous centroid (standard Lloyd)
        centroids = [
            [by_c[c][p] for p in sorted(by_c[c])] if c in by_c else centroids[c]
            for c in range(n_centroids)
        ]
    return centroids


def _argmax_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the max-cosine centroid as a column expression: array_max
    over (similarity, index) structs — struct ordering compares fields
    left-to-right, so ties break to the higher index deterministically."""
    v = vec.cast("array<double>")
    nv = l2_norm(vec)
    scored = [
        F.struct(
            (
                dot(v, F.array(*[F.lit(float(x)) for x in c]))
                / (nv * F.lit(math.sqrt(sum(x * x for x in c)) or 1.0))
            ).alias("s"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.array_max(F.array(*scored))["i"]


def _topn_centroids(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest centroid indexes (descending sim)."""
    v = vec.cast("array<double>")
    nv = l2_norm(vec)
    scored = [
        F.struct(
            (
                dot(v, F.array(*[F.lit(float(x)) for x in c]))
                / (nv * F.lit(math.sqrt(sum(x * x for x in c)) or 1.0))
            ).alias("s"),
            F.lit(i).alias("i"),
        )
        for i, c in enumerate(centroids)
    ]
    ranked = F.reverse(F.array_sort(F.array(*scored)))
    return F.transform(F.slice(ranked, 1, nprobe), lambda x: x["i"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors live in their nearest
    centroid's cell; each query probes its ``nprobe`` nearest cells and
    re-ranks exactly (cosine) within them.

    Scale shape: the corpus is assigned once (pure column expressions, no
    shuffle) and joined to the exploded (query, probed-cell) pairs on the
    cell id with the query side broadcast — per query only ~nprobe/K of
    the corpus is scored, vs 100% for brute force. Recall tunes with
    nprobe (nprobe = K ⇒ exact). Cell skew follows the data distribution;
    AQE skew-join handles hot cells.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("cell", _argmax_centroid(F.col("__cv"), centroids))
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
        .withColumn("cell", F.explode(_topn_centroids(F.col("__qv"), centroids, nprobe)))
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


#: above this benchmark size the join path's corpus-sized shuffle and
#: |c|·|b| intermediate rows dominate; the Arrow path computes each
#: row's max in-batch with zero shuffle
def decontaminate_embeddings(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: Optional[str] = None,
    bench_vec_col: Optional[str] = None,
    method: str = "arrow",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    complement of the n-gram path (``operators/dedup.py``
    decontaminate): a training document is contaminated when its
    embedding's cosine to ANY benchmark/eval embedding reaches
    ``threshold``, catching paraphrased or reformatted eval leakage that
    exact n-grams miss (the Phi/GPT-4 technical-report methodology).

    Returns one row per corpus vector: ``(vec_id, max_bench_cosine,
    nearest_bench_id, contaminated)``. Cosines are rounded to 4 dp
    before the threshold compare (the SemDeDup boundary-pinning rule);
    ``nearest_bench_id`` ties break to the LOWEST benchmark id, so the
    report is reproducible across engines and partitionings.

    Two physical forms, identical results (pinned by
    tests/test_r5_operators.py):

    * ``method="arrow"`` (default): the benchmark ships to executors
      ONCE as a Spark broadcast of a normalized numpy matrix; each Arrow
      batch computes its rows' max cosine + argmax with one matmul —
      ZERO shuffle, no |c|·|b| intermediate rows. At 10^12 corpus rows
      this is the only shape that works: the join form below would
      shuffle a corpus-sized aggregate (~tens of TB).
    * ``method="join"``: broadcast-join + map-side-combined groupBy —
      pure JVM (no Python workers), the DuckDB-oracle twin, right for
      modest corpora or Python-less clusters.

    For benchmark sets too big to broadcast, pre-bucket both sides with
    ``srp_bucket`` and run per bucket — the ``lsh_topk`` escalation."""
    b = benchmark.select(
        F.col(bench_id_col or id_col).alias("__bid"),
        F.col(bench_vec_col or vec_col).alias("__bv"),
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cv")
    )
    if method == "arrow":
        return _decontaminate_arrow(c, b, threshold, id_col)
    if method != "join":
        raise ValueError(f"method must be arrow|join: {method}")
    scored = c.join(F.broadcast(b)).select(
        id_col,
        F.round(cosine(F.col("__cv"), F.col("__bv")), 4).alias("__cs"),
        F.col("__bid"),
    )
    # max_by struct: highest cosine first, then LOWEST bench id — one
    # fused aggregate, deterministic under any partitioning
    best = scored.groupBy(id_col).agg(
        F.max("__cs").alias("max_bench_cosine"),
        F.max(
            F.struct(F.col("__cs").alias("s"), (-F.col("__bid")).alias("nb"))
        ).alias("__best"),
    )
    # a corpus vector that could not be scored (NULL embedding → every
    # cosine NULL) reports NULL across the board — the struct max would
    # otherwise still pick a bench id (NULL s sorts lowest, nb decides)
    return best.select(
        id_col,
        "max_bench_cosine",
        F.when(
            F.col("max_bench_cosine").isNotNull(),
            (-F.col("__best.nb")).cast("long"),
        ).alias("nearest_bench_id"),
        (F.col("max_bench_cosine") >= F.lit(float(threshold))).alias(
            "contaminated"
        ),
    )


def _decontaminate_arrow(
    c: DataFrame, b: DataFrame, threshold: float, id_col: str
) -> DataFrame:
    """Zero-shuffle decontamination: benchmark as a broadcast numpy
    matrix, per-batch max-cosine + argmax via one matmul. The cosine is
    rounded to 4 dp BEFORE the max/argmax (like the join path rounds
    before its aggregate), and the argmax scans rounded values for the
    FIRST maximum over benchmark rows sorted by id — the same
    lowest-bench-id tie-break as the join path\'s max_by struct."""
    import numpy as np

    rows = b.orderBy("__bid").collect()  # eval suites: thousands of rows
    if not rows:
        raise ValueError("benchmark must be non-empty")
    bids = np.asarray([r["__bid"] for r in rows], dtype=np.int64)
    M = np.asarray([r["__bv"] for r in rows], dtype=np.float64)
    norms = np.sqrt((M * M).sum(axis=1))
    norms[norms == 0] = 1.0  # zero bench vector → cosine 0, not NaN
    Mn = M / norms[:, None]
    sc = c.sparkSession.sparkContext
    bc = sc.broadcast((bids, Mn))
    from pyspark.sql import types as T

    id_field = c.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("max_bench_cosine", T.DoubleType()),
            T.StructField("nearest_bench_id", T.LongType()),
            T.StructField("contaminated", T.BooleanType()),
        ]
    )
    tau = float(threshold)

    def run(batches):
        import pandas as pd

        ids, mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["__cv"]]
            )
            en = np.sqrt((E * E).sum(axis=1))
            en[en == 0] = 1.0
            cs = np.round((E / en[:, None]) @ mat.T, 4)  # (n, |b|)
            best = np.argmax(cs, axis=1)  # first max = lowest bench id
            mx = cs[np.arange(len(pdf)), best]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "max_bench_cosine": mx,
                    "nearest_bench_id": ids[best],
                    "contaminated": mx >= tau,
                }
            )

    return c.mapInPandas(run, out_schema)


def knn_hubness(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-occurrence (hubness) audit of an embedding space: how often
    each vector appears in other vectors' exact top-k — the classic
    high-dimensional pathology detector (Radovanović et al., JMLR
    2010). A healthy space has k-occurrence concentrated near k;
    hubs (≥ 2k appearances) distort ANN recall and nearest-neighbor
    dedup, anti-hubs (0 appearances) are unreachable islands. Rising
    skewness is the canonical symptom.

    ONE summary row::

        n_vectors: bigint, k: bigint, sum_occ: bigint,
        max_occ: bigint, n_antihubs: bigint,
        antihub_share: double (6 dp), n_hubs: bigint,
        hub_share: double (6 dp), occ_skewness: double (4 dp)

    sum_occ == n_vectors·k by construction (every vector emits k
    votes when n > k) — a built-in self-check. Skewness is the
    population form m₃/m₂^1.5 from exact integer power sums, so both
    engines agree bit-for-bit before rounding.

    Scale shape: the caller bounds the audit set (hubness is a
    diagnostic over a deterministic sample, not the full corpus —
    pass e.g. ``vec_id % m == 0``); within the set the exact top-k
    reuses :func:`brute_force_topk`'s broadcast-queries one-pass
    shape and the k-occurrence reduce is a single groupBy.

    KNOWN NULL-vector asymmetry (deliberately NOT changed in the r6
    optimization round): unlike pq_train / kmeans_centroids /
    semdedup, NULL/empty embedding vectors are NOT excluded — they
    count in n_vectors and can occupy top-k slots via NULL cosines
    when a query has fewer than k scorable neighbors, weakening the
    sum_occ == n·k self-check on dirty data. The q228 oracle SQL
    (frozen this round) pins exactly these semantics — the NULL-fuzz
    sweep confirms engine/oracle agree on the mutant corpus — so the
    exclusion guard must land together with an oracle update in a
    build round (adding ``.where(isNotNull & size > 0)`` here alone
    breaks cross-engine parity on NULL-bearing corpora)."""
    ids = emb.select(F.col(id_col).alias("__id"))
    occ_counts = (
        brute_force_topk(emb, emb, k=k, id_col=id_col, vec_col=vec_col)
        .groupBy("neighbor_id")
        .agg(F.count(F.lit(1)).alias("__occ"))
    )
    occ = ids.join(
        occ_counts, ids["__id"] == F.col("neighbor_id"), "left"
    ).select(
        "__id", F.coalesce(F.col("__occ"), F.lit(0)).alias("__occ")
    )
    agg = occ.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("__occ").cast("long").alias("sum_occ"),
        F.max("__occ").cast("long").alias("max_occ"),
        F.sum(F.when(F.col("__occ") == 0, 1).otherwise(0))
        .cast("long").alias("n_antihubs"),
        F.sum(F.when(F.col("__occ") >= 2 * k, 1).otherwise(0))
        .cast("long").alias("n_hubs"),
        F.sum(F.col("__occ") * F.col("__occ")).cast("long").alias("__s2"),
        F.sum(F.col("__occ") * F.col("__occ") * F.col("__occ"))
        .cast("long").alias("__s3"),
    )
    n = F.col("n_vectors").cast("double")
    mean = F.col("sum_occ") / n
    m2 = F.col("__s2") / n - mean * mean
    m3 = (
        F.col("__s3") / n
        - 3 * mean * (F.col("__s2") / n)
        + 2 * mean * mean * mean
    )
    return agg.select(
        "n_vectors",
        F.lit(int(k)).cast("long").alias("k"),
        "sum_occ",
        "max_occ",
        "n_antihubs",
        F.round(F.col("n_antihubs") / n, 6).alias("antihub_share"),
        "n_hubs",
        F.round(F.col("n_hubs") / n, 6).alias("hub_share"),
        F.round(
            F.when(m2 > 0, m3 / F.pow(m2, F.lit(1.5))), 4
        ).alias("occ_skewness"),
    )
