"""Embedding-column sanity checks — the vector twin of the scalar
contract checks.

An embedding pipeline fails in characteristic ways long before any ANN
index notices: NULL vectors (upstream encoder skipped a row), dimension
drift (model swap mid-corpus), NaN/Inf components (fp16 overflow), and
zero vectors (padding rows that poison cosine similarity with 0/0).
soda-core's check vocabulary stops at scalars (SURVEY §1.2); this module
extends missing/invalid semantics to ``array<float>`` columns so the
declarative layer can gate an embedding table the way it gates text.

All diagnostics are row-local column algebra over the array — one
projection, zero shuffle, zero Python: ``aggregate`` left-fold for the
norm (deterministic summation order, so the 6 dp-rounded value is
engine-reproducible), ``exists`` for NaN scanning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_norm(vec: Column) -> Column:
    """Euclidean norm as a deterministic left fold, 6 dp."""
    s = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return F.round(F.sqrt(s), 6)


def embedding_diagnostics(
    vec: Column, expected_dim: int
) -> dict[str, Column]:
    """Per-row flags: ``dim`` (0 for NULL), ``dim_ok``, ``has_nan``,
    ``is_zero`` (norm exactly 0 — includes NULL/empty), ``l2_norm``
    (NULL when any component is NaN: a poisoned norm must not look like
    a valid magnitude)."""
    v = F.coalesce(vec, F.array().cast("array<float>"))
    dim = F.size(v)
    has_nan = F.exists(v, lambda x: F.isnan(x))
    norm = F.when(~has_nan, l2_norm(v))
    return {
        "dim": dim.cast("long"),
        "dim_ok": dim == F.lit(int(expected_dim)),
        "has_nan": has_nan,
        "is_zero": F.coalesce(norm == 0.0, F.lit(True)),
        "l2_norm": norm,
    }


def with_embedding_diagnostics(
    df: DataFrame,
    vec_col: str = "embedding",
    expected_dim: int = 64,
) -> DataFrame:
    """Attach the diagnostic columns plus an overall ``vec_valid``
    (right dimension, no NaN, non-zero) — the predicate an embedding
    contract check thresholds on."""
    d = embedding_diagnostics(F.col(vec_col), expected_dim)
    out = df.withColumns(d)
    return out.withColumn(
        "vec_valid",
        F.col("dim_ok") & ~F.col("has_nan") & ~F.col("is_zero"),
    )


def group_coherence(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Per-group embedding coherence: mean and min cosine of each vector
    to its group centroid. The corpus-curation read: a source/cluster
    whose documents embed incoherently (low mean, very low min) is mixed
    or mislabeled — scraped garbage, concatenated feeds, a broken
    encoder for one shard — and per-scalar checks can't see it.

    Returns ``(group, n_vecs, coherence, min_cos)`` with cosines at 6 dp.

    Shape for scale, and the determinism contract:

    * centroids via posexplode → groupBy(group, dim) avg — map-side
      partial aggregation; the (groups × dims) frame is tiny and each
      component rounds to 12 dp so the cross-engine trajectory is pinned
      (the PageRank discipline);
    * centroid arrays rebuilt in dim order and BROADCAST back — the dot
      product runs as a per-row zip_with fold (no dims×rows shuffle);
    * per-row cosine rounds to 6 dp, then aggregates as the EXACT
      integer ``round(cos · 10⁶)``: a mean of 6 dp-quantized doubles
      lands exactly on half-boundaries often enough that 1-ulp
      summation-order drift flips the rounded digit cross-engine
      (observed on real data); summing integers makes the group
      aggregate exact, and the single final division is the same double
      op on both engines.

    Zero-norm vectors and zero-norm centroids yield NULL cosine (0/0 is
    undefined, not coherent) and drop from the aggregate via avg/min
    NULL-skipping on both engines."""
    g = F.col(group_col)
    v = F.col(vec_col)
    ex = df.where(v.isNotNull()).select(
        g.alias("__g"), F.posexplode(v).alias("__pos", "__x")
    )
    cent = (
        ex.groupBy("__g", "__pos")
        .agg(F.round(F.avg(F.col("__x").cast("double")), 12).alias("__c"))
        .groupBy("__g")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__c"))
                ),
                lambda s: s["__c"],
            ).alias("__cent")
        )
    )
    joined = df.where(v.isNotNull()).join(
        F.broadcast(cent), g == F.col("__g")
    )
    prod = F.zip_with(
        v, F.col("__cent"), lambda a, b: a.cast("double") * b
    )
    dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(
        F.aggregate(
            v, F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    nc = F.sqrt(
        F.aggregate(
            F.col("__cent"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    cos = F.when((nv > 0) & (nc > 0), F.round(dot / (nv * nc), 6))
    ic = F.round(cos * F.lit(1000000.0)).cast("long")
    agg = (
        joined.select(g.alias("group"), ic.alias("__ic"))
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.count("__ic").cast("long").alias("__n_cos"),
            F.sum("__ic").alias("__sum_ic"),
            F.min("__ic").alias("__min_ic"),
        )
    )
    return agg.select(
        "group",
        "n_vecs",
        F.round(
            F.col("__sum_ic").cast("double")
            / F.col("__n_cos").cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("coherence"),
        F.round(
            F.col("__min_ic").cast("double") / F.lit(1000000.0), 6
        ).alias("min_cos"),
    )


def centroid_separation(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairwise cosine between GROUP CENTROIDS — the between-group dual
    of :func:`group_coherence`. Two labels whose centroids embed almost
    identically (cos ≥ ``threshold``) are confusable: a taxonomy that
    should be merged, a labeling pipeline that split one topic, or a
    near-duplicate source pair — the audit SemDeDup's cluster step
    silently depends on.

    Scale shape: the corpus collapses ONCE via posexplode →
    groupBy(group, dim) avg (map-side partial agg, components rounded
    12 dp — the cross-engine trajectory pin) to a |groups|·dims frame;
    norms and all pairwise dots are self-joins on that tiny frame, so
    corpus size never touches the quadratic part. The pair count is
    |groups|²/2 — at web scale group this by label taxonomy (dozens to
    thousands), never by host; for thousands of groups the frame is
    still ≤ 10⁷ tiny rows.

    Zero-norm centroids yield NULL cosine and NULL ``confusable``
    (undefined, not false). Returns ``(g1, g2, cos, confusable)`` for
    g1 < g2, cosine at 6 dp, ordered by (g1, g2).
    """
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [-1,1], got {threshold}")
    g = F.col(group_col)
    v = F.col(vec_col)
    ex = df.where(v.isNotNull()).select(
        g.alias("__g"), F.posexplode(v).alias("__pos", "__x")
    )
    cent = ex.groupBy("__g", "__pos").agg(
        F.round(F.avg(F.col("__x").cast("double")), 12).alias("__c")
    )
    norms = cent.groupBy("__g").agg(
        F.sqrt(F.sum(F.col("__c") * F.col("__c"))).alias("__n")
    )
    a, b = cent.alias("a"), cent.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.__pos") == F.col("b.__pos"))
            & (F.col("a.__g") < F.col("b.__g")),
        )
        .groupBy(
            F.col("a.__g").alias("g1"), F.col("b.__g").alias("g2")
        )
        .agg(F.sum(F.col("a.__c") * F.col("b.__c")).alias("__dot"))
    )
    n1 = norms.select(
        F.col("__g").alias("g1"), F.col("__n").alias("__n1")
    )
    n2 = norms.select(
        F.col("__g").alias("g2"), F.col("__n").alias("__n2")
    )
    cos = F.when(
        (F.col("__n1") > 0) & (F.col("__n2") > 0),
        F.round(F.col("__dot") / (F.col("__n1") * F.col("__n2")), 6),
    )
    return (
        dots.join(F.broadcast(n1), "g1")
        .join(F.broadcast(n2), "g2")
        .select(
            "g1",
            "g2",
            cos.alias("cos"),
            (cos >= F.lit(float(threshold))).alias("confusable"),
        )
        .orderBy("g1", "g2")
    )


def embedding_anisotropy(
    df: DataFrame, vec_col: str = "embedding", scale: int = 10**9
) -> DataFrame:
    """Corpus-level embedding anisotropy: the mean pairwise cosine
    between ALL unit-normalized vectors (Ethayarajh, EMNLP 2019 — a
    healthy contextual-embedding space is near-isotropic; mean cosine
    drifting toward 1 means the encoder collapsed directions and every
    downstream cosine threshold, SemDeDup cluster, and ANN recall
    number silently degrades).

    The n² pairwise sum needs NO pairwise join: with v̂ unit vectors,
    ``sum_{i != j} v̂_i · v̂_j = ||S||² - sum_i ||v̂_i||²`` where
    ``S = sum_i v̂_i``. One row::

        n_vectors: bigint       -- usable (non-NULL, norm > 0) vectors
        dim: int
        n_degenerate: bigint    -- NULL or zero-norm rows, excluded
        mean_norm: double       -- of usable raw vectors, 6 dp
        anisotropy: double      -- mean pairwise cosine, 6 dp;
                                   NULL when n_vectors < 2

    Determinism contract (the q114/group_coherence discipline): each
    normalized component quantizes to ``round(v̂_j · scale)`` as BIGINT
    — per-row double ops are bit-identical on any engine — so the
    per-dimension vector sum S is an EXACT integer aggregate, immune to
    summation order. The statistic is then defined ON the quantized
    vectors: ``(||S||² - sum_i ||q_i||²) / (n(n-1) · scale²)``; the only
    floating sums left are over ``dim`` squares of exact integers,
    ulp-noise ~1e-20 of the result, invisible at 6 dp.

    Scale shape: posexplode → groupBy(dim) sum — map-side combine
    collapses each partition to ``dim`` partial rows, so the shuffle
    carries partitions × dim integers, never n × dim; everything else
    is a one-row reduce. soda-core analogue: none (vector extension of
    the scalar aggregate checks, SURVEY §1.2)."""
    v = F.col(vec_col)
    nrm_raw = F.aggregate(
        v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    base = df.select(
        v.alias("__v"),
        F.when(v.isNotNull(), F.sqrt(nrm_raw)).alias("__nrm"),
    )
    # scan 1: scalar stats — usable count, degenerate count, mean norm,
    # dim — ONE fused aggregate
    ok = F.col("__nrm") > 0
    stats = base.agg(
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("n_vectors"),
        F.max(F.when(ok, F.size("__v"))).cast("int").alias("dim"),
        F.sum(F.when(ok, 0).otherwise(1)).cast("long").alias("n_degenerate"),
        F.round(F.avg(F.when(ok, F.col("__nrm"))), 6).alias("mean_norm"),
    )
    # scan 2: exact integer per-dimension sums of the quantized unit
    # vectors; map-side combine collapses each partition to dim rows
    qv = F.transform(
        F.col("__v"),
        lambda x: F.round(
            x.cast("double") / F.col("__nrm") * F.lit(float(scale)), 0
        ).cast("long"),
    )
    per_row = base.where(ok).select(
        F.posexplode(qv).alias("__pos", "__x")
    )
    dims = per_row.groupBy("__pos").agg(
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x").cast("double") * F.col("__x")).alias("__qq"),
    )
    tot = dims.agg(
        F.sum(F.col("__s").cast("double") * F.col("__s")).alias("__s2"),
        F.sum("__qq").alias("__qsum"),
    )
    n = F.col("n_vectors")
    aniso = F.when(
        n >= 2,
        (F.col("__s2") - F.col("__qsum"))
        / (n * (n - 1)).cast("double")
        / F.lit(float(scale) ** 2),
    )
    return stats.crossJoin(tot).select(
        "n_vectors",
        "dim",
        "n_degenerate",
        "mean_norm",
        F.round(aniso, 6).alias("anisotropy"),
    )


def participation_ratio(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    scale: int = 10**6,
) -> DataFrame:
    """Effective dimensionality of the embedding cloud: the
    participation ratio PR = (tr C)² / tr(C²) of the covariance matrix
    C (Gao et al. 2017; equals (Σλ)²/Σλ² over C's eigenvalues WITHOUT
    computing any eigenvalue — both traces are plain sums over C's
    entries since tr(C²) = ‖C‖²_F for symmetric C). An encoder that
    "uses" all ``dim`` directions equally scores PR ≈ dim; a collapsed
    one (anisotropy's failure mode made quantitative) concentrates
    variance in a few directions and PR crashes — the single number to
    watch before trusting SemDeDup clusters, PQ codebooks, or ANN
    recall, because all of them assume the space has the rank it
    claims.

    One row::

        n: bigint                     -- usable vectors (non-NULL, len == dim)
        dim: int
        n_degenerate: bigint          -- NULL / wrong-length rows, excluded
        tr_cov: double (6 dp)         -- total variance, raw units
        participation_ratio: double (6 dp)   -- NULL when n == 0 or C == 0
        effective_rank_fraction: double (6 dp)  -- PR / dim

    Determinism contract (the anisotropy/q114 discipline): components
    quantize to ``round(x·scale)`` BIGINT in column algebra (Spark
    F.round == oracle round, proven parity), so the moment sums
    S_i = Σq_i and P_ij = Σ q_i·q_j are EXACT integer aggregates immune
    to summation order; C_ij = (P_ij − S_i·S_j/n)/n is then a fixed
    IEEE-double formula both engines evaluate identically, and the only
    order-dependent float sums left are the two traces over ≤ dim²
    doubles. tr_cov is reported in RAW units (trace / scale²): at
    quantized magnitude (~variance·scale²) a double's ulp exceeds 6 dp
    and the order-dependent trace noise becomes visible — measured as a
    2e-4 absolute drift at sf0.1 — while in raw units the same relative
    noise sits at 1e-16, invisible at 6 dp. The PR ratio cancels the
    scale² factor entirely.

    Scale shape: one row-local stats aggregate plus ONE Arrow-batched
    ``mapInPandas`` Gram pass — a vectorized ``Xᵀ·X`` per batch (no
    per-row Python, no dim²-literal plan blowup, no n×dim² explode)
    emitting dim·(dim+1)/2 packed rows per batch that CARRY the batch's
    marginal sums (si, sj, nn) alongside pp, so the whole statistic is
    a straight-line plan: MapInPandas → map-side-combined
    groupBy((i,j)) → projection → one-row reduce. No self-joins back
    onto the Gram branch — an earlier join-based shape made Catalyst
    re-execute the corpus pass once per consumer (observed: 4×).
    Int64 headroom: |q| ≤ scale·max|x|, so P_ij ≲ n·(scale·max|x|)² —
    at 10^12 rows drop ``scale`` to 10³ or shard the sum; documented,
    not silent."""
    import numpy as np
    import pandas as pd

    v = F.col(vec_col)
    if dim is None:
        dim = df.agg(F.max(F.size(v))).first()[0]
        if dim is None:
            dim = 0
    d = int(dim)
    ok = v.isNotNull() & (F.size(v) == d) if d else F.lit(False)
    stats = df.agg(
        F.coalesce(F.sum(F.when(ok, 1).otherwise(0)), F.lit(0))
        .cast("long").alias("n"),
        F.lit(d).cast("int").alias("dim"),
        F.coalesce(F.sum(F.when(ok, 0).otherwise(1)), F.lit(0))
        .cast("long").alias("n_degenerate"),
    )
    if d == 0:
        return stats.select(
            "n", "dim", "n_degenerate",
            F.lit(None).cast("double").alias("tr_cov"),
            F.lit(None).cast("double").alias("participation_ratio"),
            F.lit(None).cast("double").alias("effective_rank_fraction"),
        )
    qv = F.transform(
        v, lambda x: F.round(x.cast("double") * F.lit(float(scale)), 0)
        .cast("long")
    )
    quant = df.where(ok).select(qv.alias("__q"))
    iu, ju = np.triu_indices(d)

    def gram_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(a, dtype=np.int64) for a in pdf["__q"]]
            )
            m = x.T @ x  # exact int64 Gram
            sv = x.sum(axis=0, dtype=np.int64)
            # each (i, j) row carries the batch marginals it will need
            # downstream — keeps the reduced frame self-contained, so
            # no join ever re-touches this branch
            yield pd.DataFrame(
                {"i": iu.astype("int32"), "j": ju.astype("int32"),
                 "pp": m[iu, ju], "si": sv[iu], "sj": sv[ju],
                 "nn": np.int64(len(x))}
            )

    parts = quant.mapInPandas(
        gram_partials,
        schema="i int, j int, pp long, si long, sj long, nn long",
    )
    g = parts.groupBy("i", "j").agg(
        F.sum("pp").alias("pp"),
        F.sum("si").alias("s_i"),
        F.sum("sj").alias("s_j"),
        F.sum("nn").alias("__n"),
    )
    nd = F.col("__n").cast("double")
    # the cross-engine contract formula: both engines compute
    # (P - S_i*S_j/n) / n on IEEE doubles in this exact order
    c = (
        F.col("pp").cast("double")
        - F.col("s_i").cast("double") * F.col("s_j").cast("double") / nd
    ) / nd
    cov = g.where(F.col("__n") > 0).select(
        F.when(F.col("i") == F.col("j"), c).alias("__diag"),
        F.when(F.col("i") == F.col("j"), c * c)
        .otherwise(F.lit(2.0) * c * c).alias("__sq"),
    )
    tr = cov.agg(
        F.sum("__diag").alias("__tr"), F.sum("__sq").alias("__tr2")
    )
    pr = F.when(
        F.col("__tr2") > 0, F.col("__tr") * F.col("__tr") / F.col("__tr2")
    )
    return stats.crossJoin(tr).select(
        "n", "dim", "n_degenerate",
        F.round(F.col("__tr") / F.lit(float(scale) ** 2), 6)
        .alias("tr_cov"),
        F.round(pr, 6).alias("participation_ratio"),
        F.round(pr / F.lit(float(d)), 6)
        .alias("effective_rank_fraction"),
    )


def simplified_silhouette(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label simplified silhouette: for each vector, a = Euclidean
    distance to its OWN label centroid, b = distance to the NEAREST
    other centroid, s = (b − a) / max(a, b) ∈ [-1, 1]; the label's mean
    s is its cluster quality in one number (≈1 compact & separated,
    ≈0 touching its neighbor, <0 closer to another label's centroid
    than its own — mislabeled or collapsed). The classical silhouette's
    O(n²) pairwise distances are replaced by centroid distances
    (Hruschka et al. 2004), which is what makes it computable at corpus
    scale; it combines :func:`group_coherence` (within) and
    :func:`centroid_separation` (between) into the per-label verdict
    both halves only hint at.

    Per label::

        <label_col>: as input
        n_vecs: bigint
        mean_silhouette: double (6 dp)   -- NULL when no other label
        p_negative: double (6 dp)        -- share of s < 0 rows
        nearest_label: as input          -- modal nearest other label,
                                            ties -> least label

    Determinism contract: centroid components are avg rounded 12 dp
    (the q114 pin); per-row s rounds to 6 dp then aggregates as the
    EXACT integer round(s·10⁶) — the group_coherence discipline — so
    the only cross-engine float risk is per-row folds over dim terms,
    ulp-level under 6 dp rounding.

    Scale shape: centroids via ONE posexplode → groupBy(label, dim)
    partial agg (|labels|·dim tiny frame), rebuilt as arrays and
    BROADCAST; each row crossJoins the |labels|-row centroid table and
    folds its distance row-locally (zip_with + aggregate — no dims×rows
    shuffle), then one groupBy(row) min-reduce and one groupBy(label)
    integer-sum. Label cardinality must be bounded (taxonomy-sized,
    dozens-to-thousands) — the n·|labels| intermediate is the cost
    knob, exactly as in centroid_separation."""
    g = F.col(label_col)
    v = F.col(vec_col)
    ok = v.isNotNull() & g.isNotNull()
    ex = df.where(ok).select(
        g.alias("__g"), F.posexplode(v).alias("__pos", "__x")
    )
    cent = (
        ex.groupBy("__g", "__pos")
        .agg(F.round(F.avg(F.col("__x").cast("double")), 12).alias("__c"))
        .groupBy("__g")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__c"))),
                lambda s: s["__c"],
            ).alias("__cent")
        )
        .select(F.col("__g").alias("__cl"), "__cent")
    )
    rows = df.where(ok).select(
        F.monotonically_increasing_id().alias("__rid"),
        g.alias("__own"),
        v.alias("__v"),
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("__v"), F.col("__cent"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = rows.crossJoin(F.broadcast(cent)).select(
        "__rid", "__own", "__cl", F.sqrt(d2).alias("__d")
    )
    per_row = cand.groupBy("__rid", "__own").agg(
        F.min(F.when(F.col("__cl") == F.col("__own"), F.col("__d")))
        .alias("__a"),
        F.min(F.when(F.col("__cl") != F.col("__own"), F.col("__d")))
        .alias("__b"),
        F.min_by(
            F.when(F.col("__cl") != F.col("__own"), F.col("__cl")),
            F.when(
                F.col("__cl") != F.col("__own"),
                F.struct(F.col("__d"), F.col("__cl")),
            ),
        ).alias("__nl"),
    )
    s = F.when(
        F.col("__b").isNotNull()
        & (F.greatest(F.col("__a"), F.col("__b")) > 0),
        (F.col("__b") - F.col("__a"))
        / F.greatest(F.col("__a"), F.col("__b")),
    ).otherwise(
        F.when(F.col("__b").isNotNull(), F.lit(0.0))
    )
    ic = F.round(F.round(s, 6) * F.lit(1000000.0)).cast("long")
    per = per_row.select(
        F.col("__own"), ic.alias("__ic"), F.col("__nl")
    )
    agg = per.groupBy("__own").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.count("__ic").cast("long").alias("__n_s"),
        F.sum("__ic").alias("__sum_ic"),
        F.sum(F.when(F.col("__ic") < 0, 1).otherwise(0)).cast("long")
        .alias("__neg"),
    )
    # modal nearest label with (count desc, label asc) tiebreak — via
    # an explicit grain, F.mode's tie choice is not contractual
    nl_grain = per.where(F.col("__nl").isNotNull()).groupBy(
        "__own", "__nl"
    ).agg(F.count(F.lit(1)).alias("__c"))
    from pyspark.sql import Window

    w = Window.partitionBy("__own").orderBy(
        F.col("__c").desc(), F.col("__nl")
    )
    modal = (
        nl_grain.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("__own", F.col("__nl").alias("nearest_label"))
    )
    return (
        agg.join(modal, "__own", "left")
        .select(
            F.col("__own").alias(label_col),
            "n_vecs",
            F.round(
                F.col("__sum_ic").cast("double")
                / F.col("__n_s").cast("double") / F.lit(1000000.0),
                6,
            ).alias("mean_silhouette"),
            F.round(
                F.col("__neg").cast("double")
                / F.col("n_vecs").cast("double"), 6
            ).alias("p_negative"),
            "nearest_label",
        )
        .orderBy(label_col)
    )
