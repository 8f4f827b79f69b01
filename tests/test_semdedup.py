"""SemDeDup k-means + intra-cluster cosine dedup (operators/semdedup.py)."""

from pyspark.sql import functions as F

from soda_core_spark.operators.semdedup import (
    assign_clusters,
    kmeans_fit_assign,
    semdedup,
    update_centroids,
)


def _vec_frame(spark):
    # two tight groups on orthogonal axes + one echo pair inside group A
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),   # near vec 0
        (3, [0.95, 0.05, 0.0, 0.0]),  # near vec 0 and 2
        (4, [0.1, 0.9, 0.0, 0.0]),   # near vec 1
        (5, [0.0, 0.0, 1.0, 0.0]),   # its own direction
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_assignment_is_argmin_with_low_cluster_tiebreak(spark):
    pts = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [1.0, 0.0])],
        ["id", "e"],
    ).select("id", F.transform("e", lambda x: x.cast("double")).alias("e"))
    cents = [[0.0, 0.0], [2.0, 0.0]]
    got = {
        r["id"]: r["cluster"]
        for r in assign_clusters(pts, cents).collect()
    }
    # vec 2 is equidistant → first (lowest) cluster wins
    assert got == {0: 0, 1: 1, 2: 0}


def test_update_rounds_and_keeps_empty_clusters(spark):
    pts = spark.createDataFrame(
        [(0, [0.0, 0.0], 0), (1, [1.0, 1.0], 0)], ["id", "e", "cluster"]
    ).select(
        "id",
        F.transform("e", lambda x: x.cast("double")).alias("e"),
        "cluster",
    )
    prev = [[9.0, 9.0], [5.0, 5.0]]
    out = update_centroids(pts, prev)
    assert out[0] == [0.5, 0.5]
    assert out[1] == [5.0, 5.0]  # no members → unchanged


def test_clusters_separate_directions(spark):
    assigned = kmeans_fit_assign(_vec_frame(spark), k=3, iterations=2)
    cl = {r["id"]: r["cluster"] for r in assigned.collect()}
    assert cl[0] == cl[2] == cl[3]
    assert cl[1] == cl[4]
    assert cl[5] not in (cl[0], cl[1])


def test_semdedup_keeps_lowest_id_representative(spark):
    out = {
        r["vec_id"]: r["is_semdup"]
        for r in semdedup(
            _vec_frame(spark), k=3, iterations=2, threshold=0.97
        ).collect()
    }
    # 0 is the representative of the {0,2,3} near-set; 2 and 3 are dups
    # (cos(0,2)≈0.994, cos(0,3)≈0.998, cos(2,3)≈0.999 ≥ .97)
    assert out[0] is False
    assert out[2] is True and out[3] is True
    # cluster representatives (lowest id of their near-set) survive
    assert out[1] is False and out[5] is False
    # vec 4 vs vec 1: cos = 0.9/√0.82 ≈ 0.994 ≥ .97 → dup of 1
    assert out[4] is True


def test_deterministic_across_partitionings(spark):
    df = _vec_frame(spark)
    a = sorted(
        (r["vec_id"], r["cluster"], r["is_semdup"])
        for r in semdedup(df.repartition(1), k=3, iterations=2).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"], r["is_semdup"])
        for r in semdedup(df.repartition(5), k=3, iterations=2).collect()
    )
    assert a == b
