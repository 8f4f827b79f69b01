"""robots.txt parsing/gating and the compression-ratio signal."""

import zlib

from pyspark.sql import functions as F

from soda_core_spark.functions.compressratio import (
    DEFLATE_LEVEL,
    compression_ratio_col,
    compression_ratio_text,
)
from soda_core_spark.operators.robots import (
    apply_robots_rules,
    parse_robots_txt,
    robots_filter,
    robots_rules,
)

ROBOTS_BODY = """
# crawler policy
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /tmp/
Allow: /tmp/public/
Disallow:
Crawl-delay: 10
"""


def test_parse_group_selection():
    star = parse_robots_txt(ROBOTS_BODY, "*")
    assert star == [("/tmp/", False), ("/tmp/public/", True)]
    # exact agent match beats the wildcard group
    gb = parse_robots_txt(ROBOTS_BODY, "GoogleBot")
    assert gb == [("/private/", False)]
    # unknown agent falls back to '*'
    assert parse_robots_txt(ROBOTS_BODY, "otherbot") == star
    assert parse_robots_txt(None) == []
    assert parse_robots_txt("") == []


def test_parse_consecutive_agents_share_group():
    body = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots_txt(body, "a") == [("/x", False)]
    assert parse_robots_txt(body, "b") == [("/x", False)]
    assert parse_robots_txt(body, "c") == []


def test_rules_df_and_gate(spark):
    robots = spark.createDataFrame(
        [("example.com", ROBOTS_BODY), ("empty.com", ""), ("none.com", None)],
        ["host", "body"],
    )
    rules = robots_rules(robots)
    assert sorted(
        (r["host"], r["rule_path"], r["allow"]) for r in rules.collect()
    ) == [
        ("example.com", "/tmp/", False),
        ("example.com", "/tmp/public/", True),
    ]
    pages = spark.createDataFrame(
        [
            (1, "example.com", "/tmp/secret"),        # disallowed
            (2, "example.com", "/tmp/public/a.html"), # longest match: allow
            (3, "example.com", "/index.html"),        # no rule matches
            (4, "unknown.com", "/tmp/secret"),        # host has no rules
        ],
        ["doc_id", "host", "path"],
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in apply_robots_rules(pages, rules).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: True}
    kept = robots_filter(pages, rules)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4]
    assert kept.columns == pages.columns


def test_equal_length_tie_allow_wins(spark):
    rules = spark.createDataFrame(
        [("h", "/a/", False), ("h", "/a/", True)],
        ["host", "rule_path", "allow"],
    )
    pages = spark.createDataFrame([(1, "h", "/a/x")], ["doc_id", "host", "path"])
    assert apply_robots_rules(pages, rules).collect()[0]["allowed"] is True


def test_gate_never_shuffles_corpus(spark):
    rules = spark.createDataFrame(
        [("h", "/a/", False)], ["host", "rule_path", "allow"]
    )
    pages = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "h").otherwise("g").alias("host"),
        F.concat(F.lit("/a/"), F.col("id")).alias("path"),
    )
    plan = (
        apply_robots_rules(pages, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one shuffle exchange total — the tiny per-host rules
    # aggregate — and it must sit BELOW the broadcast (rules side);
    # the corpus streams through the broadcast-hash join unshuffled
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    join_at = plan.index("BroadcastHashJoin")
    bcast_at = plan.index("BroadcastExchange", join_at)
    corpus_segment = plan[join_at:bcast_at]
    assert "Exchange" not in corpus_segment


def test_compression_ratio_semantics():
    prose = (
        "The quick brown fox jumps over the lazy dog while the rain in "
        "Spain falls mainly on the plain and every sentence adds fresh "
        "words to keep entropy realistic for a web paragraph of text."
    )
    junk = "spam " * 200
    assert compression_ratio_text(None) is None
    assert compression_ratio_text("") is None
    r_prose = compression_ratio_text(prose)
    r_junk = compression_ratio_text(junk)
    assert 0.0 < r_junk < r_prose <= 1.2
    assert r_junk < 0.1  # pure repetition collapses
    # exact byte-level pin against direct zlib at the contract level
    raw = prose.encode("utf-8")
    assert r_prose == len(zlib.compress(raw, DEFLATE_LEVEL)) / len(raw)


def test_compression_ratio_udf(spark):
    rows = [(1, "word " * 300), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["cr"]
        for r in df.select(
            "doc_id", compression_ratio_col(F.col("text")).alias("cr")
        ).collect()
    }
    assert got[1] == compression_ratio_text("word " * 300)
    assert got[2] is None and got[3] is None
