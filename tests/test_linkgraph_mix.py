"""Link graph, weighted sampling, CCNet buckets, no-broadcast decontam."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# weighted_hash_topk
# ---------------------------------------------------------------------------


def _scored_df(spark, n=200):
    rows = [(i, float(1 + (i % 10))) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "w"])


def test_weighted_topk_deterministic_and_bounded(spark):
    from soda_core_spark.operators.sampling import weighted_hash_topk

    df = _scored_df(spark)
    key = F.col("doc_id").cast("string")
    a = weighted_hash_topk(df, 25, F.col("w"), key)
    b = weighted_hash_topk(df.repartition(13), 25, F.col("w"), key)
    sa = sorted(r["doc_id"] for r in a.collect())
    sb = sorted(r["doc_id"] for r in b.collect())
    assert len(sa) == 25
    assert sa == sb  # partitioning-independent survivor set


def test_weighted_topk_excludes_nonpositive_and_matches_python(spark):
    from soda_core_spark.operators.sampling import weighted_hash_topk

    rows = [
        (1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0), (6, 9.0),
        (7, float("nan")),  # would sort ABOVE every real key unguarded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = weighted_hash_topk(df, 2, F.col("w"), F.col("doc_id").cast("string"))
    got = {r["doc_id"] for r in out.collect()}
    assert got <= {1, 5, 6}  # 2/3/4/7 can never be drawn

    # python replay of u^(1/w) over md5 hash fractions
    import hashlib

    def u(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 16**8

    keys = {i: u(i) ** (1.0 / w) for i, w in rows if w and w > 0}
    expect = set(sorted(keys, key=keys.get, reverse=True)[:2])
    assert got == expect


def test_weighted_topk_is_take_ordered_not_global_sort(spark):
    from soda_core_spark.operators.sampling import weighted_hash_topk

    out = weighted_hash_topk(
        _scored_df(spark), 10, F.col("w"), F.col("doc_id").cast("string")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_weighted_topk_reserved_column_and_bad_k(spark):
    from soda_core_spark.operators.sampling import weighted_hash_topk

    df = _scored_df(spark).withColumn("__ws_key", F.lit(1))
    with pytest.raises(ValueError):
        weighted_hash_topk(df, 5, F.col("w"), F.col("doc_id").cast("string"))
    with pytest.raises(ValueError):
        weighted_hash_topk(_scored_df(spark), 0, F.col("w"), F.col("doc_id"))


# ---------------------------------------------------------------------------
# ccnet_quality_buckets
# ---------------------------------------------------------------------------


def test_ccnet_buckets_per_lang_quartiles(spark):
    from soda_core_spark.functions.classifier import ccnet_quality_buckets

    # lang a: scores 1..8 -> q25 = 2.75, q75 = 6.25; lang b: constant
    rows = [(i, "a", float(i)) for i in range(1, 9)]
    rows += [(100 + i, "b", 3.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "s"])
    out = {
        r["doc_id"]: r["quality_bucket"]
        for r in ccnet_quality_buckets(df, F.col("s")).collect()
    }
    assert [out[i] for i in range(1, 9)] == [
        "tail", "tail", "middle", "middle", "middle", "middle", "head", "head",
    ]
    # constant distribution: cutoffs equal every value -> all middle
    assert all(out[100 + i] == "middle" for i in range(4))


def test_ccnet_buckets_broadcast_plan_and_validation(spark):
    from soda_core_spark.functions.classifier import ccnet_quality_buckets

    df = spark.createDataFrame(
        [(i, "a", float(i)) for i in range(20)], ["doc_id", "lang", "s"]
    )
    out = ccnet_quality_buckets(df, F.col("s"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError):
        ccnet_quality_buckets(df, F.col("s"), lower_q=0.8, upper_q=0.2)


# ---------------------------------------------------------------------------
# decontaminate: no-broadcast path equals broadcast path
# ---------------------------------------------------------------------------


def test_decontaminate_shuffle_path_matches_broadcast(spark):
    from soda_core_spark.operators.dedup import decontaminate

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a sleeping cat"),
        (3, "completely different words entirely here now"),
        (4, "the quick brown fox jumps over the lazy dog again today"),
    ]
    bench = spark.createDataFrame(docs[:1], ["doc_id", "text"])
    train = spark.createDataFrame(docs[1:], ["doc_id", "text"])
    base = decontaminate(train, bench, overlap_threshold=0.5)
    for hs in (None, "xxhash64", "portable"):
        alt = decontaminate(
            train, bench, overlap_threshold=0.5,
            broadcast_bench=False, hash_shingles=hs,
        )
        assert sorted(map(tuple, alt.collect())) == sorted(
            map(tuple, base.collect())
        )
    with pytest.raises(ValueError):
        decontaminate(train, bench, hash_shingles="md5")


# ---------------------------------------------------------------------------
# link graph
# ---------------------------------------------------------------------------


def _crawl_df(spark):
    rows = [
        (
            "https://a.example.com/p1",
            '<a href="https://b.example.com/x">1</a>'
            '<a class="n" href="//c.example.com/y">2</a>'
            '<a href="/about">3</a><a href="#top">4</a>'
            "<a href='singlequoted.com'>ignored</a>",
        ),
        (
            "https://b.example.com/p2",
            '<a href="https://a.example.com:443/z">5</a>'
            '<a href="mailto:someone@a.example.com">6</a>'
            '<a href="javascript:void(0)">7</a>'
            '<a href="ftp://files.example.com/f">8</a>',
        ),
        ("https://d.example.com/p3", "no links at all"),
    ]
    return spark.createDataFrame(rows, ["url", "html"])


def test_outlink_hosts_resolution(spark):
    from soda_core_spark.operators.linkgraph import outlink_hosts

    got = sorted(
        map(tuple, outlink_hosts(_crawl_df(spark)).collect())
    )
    assert got == sorted(
        [
            ("a.example.com", "b.example.com"),
            ("a.example.com", "c.example.com"),   # protocol-relative
            ("a.example.com", "a.example.com"),   # /about -> self
            ("a.example.com", "a.example.com"),   # #top -> self
            ("b.example.com", "a.example.com"),   # port stripped
            # mailto:/javascript:/ftp: schemes dropped (http-only graph);
            # single-quoted href is outside the extractor's contract
        ]
    )


def test_host_edges_and_degrees(spark):
    from soda_core_spark.operators.linkgraph import (
        host_degrees,
        host_edges,
        outlink_hosts,
    )

    edges = host_edges(outlink_hosts(_crawl_df(spark)))
    e = {(r["src_host"], r["dst_host"]): r["n_links"] for r in edges.collect()}
    assert e[("a.example.com", "a.example.com")] == 2
    assert e[("a.example.com", "b.example.com")] == 1
    deg = {r["host"]: r for r in host_degrees(edges).collect()}
    a = deg["a.example.com"]
    assert (a["out_hosts"], a["out_links"]) == (3, 4)
    assert (a["in_hosts"], a["in_links"]) == (2, 3)  # self x2 + from b
    c = deg["c.example.com"]
    assert (c["out_hosts"], c["out_links"], c["in_hosts"], c["in_links"]) == (
        0, 0, 1, 1,
    )


def test_pagerank_matches_hand_iteration(spark):
    from soda_core_spark.operators.linkgraph import host_pagerank

    # x -> y (2 links), x -> z (1), y -> x (1); z dangling
    edges = spark.createDataFrame(
        [("x", "y", 2), ("x", "z", 1), ("y", "x", 1)],
        ["src_host", "dst_host", "n_links"],
    )
    got = {
        r["host"]: r["rank"]
        for r in host_pagerank(edges, iterations=2, damping=0.85).collect()
    }
    ranks = {"x": 1.0, "y": 1.0, "z": 1.0}
    w = {("x", "y"): 2 / 3, ("x", "z"): 1 / 3, ("y", "x"): 1.0}
    for _ in range(2):
        contrib = {}
        for (s, d), wt in w.items():
            contrib[d] = contrib.get(d, 0.0) + ranks[s] * wt
        ranks = {
            v: round(0.15000000000000002 + 0.85 * contrib.get(v, 0.0), 12)
            for v in ranks
        }
    for v in ranks:
        assert math.isclose(got[v], ranks[v], rel_tol=0, abs_tol=1e-9)


def test_pagerank_zero_iterations_and_validation(spark):
    from soda_core_spark.operators.linkgraph import host_pagerank

    edges = spark.createDataFrame(
        [("x", "y", 1)], ["src_host", "dst_host", "n_links"]
    )
    got = {r["host"]: r["rank"] for r in host_pagerank(edges, 0).collect()}
    assert got == {"x": 1.0, "y": 1.0}
    with pytest.raises(ValueError):
        host_pagerank(edges, -1)


# ---------------------------------------------------------------------------
# leakage_free_split
# ---------------------------------------------------------------------------


def test_leakage_free_split_clusters_stay_together(spark):
    import hashlib

    from soda_core_spark.operators.sampling import leakage_free_split

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 21)], ["doc_id"]
    )
    # clusters: {1,2,3} -> 1, {10,11} -> 10; rest singletons
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        ["node", "component"],
    )
    out = leakage_free_split(docs, comps, train_frac=0.6, val_frac=0.2)
    rows = {r["doc_id"]: (r["component"], r["split"]) for r in out.collect()}
    assert len(rows) == 20
    # cluster members share component AND split
    assert rows[1] == rows[2] == rows[3]
    assert rows[10] == rows[11]
    # singletons are their own component
    assert rows[5][0] == 5 and rows[20][0] == 20

    def u(c):
        return int(hashlib.md5(str(c).encode()).hexdigest()[:8], 16) / 2**32

    for d, (c, s) in rows.items():
        expect = "train" if u(c) < 0.6 else ("val" if u(c) < 0.8 else "test")
        assert s == expect, (d, c, s, expect)


def test_leakage_free_split_validation(spark):
    import pytest

    from soda_core_spark.operators.sampling import leakage_free_split

    docs = spark.createDataFrame([(1,)], ["doc_id"])
    comps = spark.createDataFrame([(1, 1)], ["node", "component"])
    with pytest.raises(ValueError):
        leakage_free_split(docs, comps, train_frac=0.0)
    with pytest.raises(ValueError):
        leakage_free_split(docs, comps, train_frac=0.8, val_frac=0.3)


# ---------------------------------------------------------------------------
# anchor-text aggregation (linkgraph.host_anchor_texts / top_host_anchors)
# ---------------------------------------------------------------------------


def _anchor_pages(spark):
    rows = [
        (
            "https://a.com/1",
            '<p>x</p><a href="https://b.com/p"><b>Great</b> site</a>'
            '<a href="//c.com/q">news &amp; views</a>'
            '<a href="/local">home</a>'
            '<a href="mailto:x@y.z">mail</a>'
            '<a href="https://b.com/img"><img src="i.png"/></a>',
        ),
        ("https://d.com/2", '<a href="https://b.com/p">Great site</a>'),
        ("https://e.com/3", '<a href="https://b.com/p">b portal</a>'),
        ("https://b.com/4", '<a href="https://b.com/self">internal nav</a>'),
    ]
    return spark.createDataFrame(rows, ["url", "html"])


def test_anchor_texts_resolution_and_cleaning(spark):
    from soda_core_spark.operators.linkgraph import host_anchor_texts

    got = sorted(
        (r["dst_host"], r["anchor_text"])
        for r in host_anchor_texts(_anchor_pages(spark)).collect()
    )
    # internal nav (self-link + relative) and mailto dropped; image-only
    # anchor drops as empty text; inline tags stripped; entities decoded
    assert got == [
        ("b.com", "Great site"),
        ("b.com", "Great site"),
        ("b.com", "b portal"),
        ("c.com", "news & views"),
    ]


def test_anchor_texts_internal_kept_when_asked(spark):
    from soda_core_spark.operators.linkgraph import host_anchor_texts

    got = sorted(
        (r["dst_host"], r["anchor_text"])
        for r in host_anchor_texts(
            _anchor_pages(spark), external_only=False
        ).collect()
    )
    assert ("a.com", "home") in got and ("b.com", "internal nav") in got


def test_top_host_anchors_rank_and_ties(spark):
    from soda_core_spark.operators.linkgraph import (
        host_anchor_texts,
        top_host_anchors,
    )

    anchors = host_anchor_texts(_anchor_pages(spark))
    got = {
        (r["dst_host"], r["rank"]): (r["anchor_text"], r["n"])
        for r in top_host_anchors(anchors, k=2).collect()
    }
    assert got[("b.com", 1)] == ("Great site", 2)
    assert got[("b.com", 2)] == ("b portal", 1)
    assert got[("c.com", 1)] == ("news & views", 1)
    assert ("b.com", 3) not in got  # k cap
