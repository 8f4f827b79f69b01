"""Round-4 operators: readability scores, HITS hub/authority, paragraph
language segmentation, registered-domain extraction."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------


def test_readability_hand_computed(spark):
    from soda_core_spark.functions.readability import with_readability

    # "the cat sat." → 3 words, 1 sentence run, syllables: the(1) cat(1)
    # sat(1) = 3. FRE = 206.835 - 1.015*3 - 84.6*1 = 119.19
    # FKGL = 0.39*3 + 11.8*1 - 15.59 = -2.62
    df = spark.createDataFrame([(1, "the cat sat.")], "id int, text string")
    row = with_readability(df).collect()[0]
    assert row.n_words == 3
    assert row.n_sentences == 1
    assert row.n_syllables == 3
    assert row.flesch_reading_ease == pytest.approx(119.19, abs=1e-6)
    assert row.fk_grade == pytest.approx(-2.62, abs=1e-6)


def test_readability_sentence_runs_collapse(spark):
    from soda_core_spark.functions.readability import with_readability

    # "Really?! No... way." → runs: "?!", "...", "." = 3 sentences
    df = spark.createDataFrame(
        [(1, "Really?! No... way.")], "id int, text string"
    )
    row = with_readability(df).collect()[0]
    assert row.n_sentences == 3
    assert row.n_words == 3  # whitespace tokens: Really?! / No... / way.


def test_readability_vowel_free_word_floor(spark):
    from soda_core_spark.functions.readability import with_readability

    # "hmm grr" → zero vowel groups, 2 vowel-free words → 2 syllables
    df = spark.createDataFrame([(1, "hmm grr")], "id int, text string")
    row = with_readability(df).collect()[0]
    assert row.n_syllables == 2
    assert row.n_sentences == 1  # floor with no terminator


def test_readability_null_and_empty_text(spark):
    from soda_core_spark.functions.readability import with_readability

    df = spark.createDataFrame(
        [(1, None), (2, "")], "id int, text string"
    )
    rows = {r.id: r for r in with_readability(df).collect()}
    for i in (1, 2):
        assert rows[i].n_words == 0
        assert rows[i].flesch_reading_ease is None
        assert rows[i].fk_grade is None


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src_host string, dst_host string, n_links long"
    )


def test_hits_hub_authority_separation(spark):
    """A directory host linking to two content hosts: the directory is
    the max hub, the content hosts are the authorities, and the
    directory (never linked-to) has zero authority. Textbook (unweighted)
    HITS — under per-source weight normalization a single-link host's
    whole mass rides one edge, which is the weighted variant's point."""
    from soda_core_spark.operators.linkgraph import host_hits

    e = _edges(spark, [("dir", "a", 1), ("dir", "b", 1), ("a", "b", 1)])
    out = {
        r.host: r
        for r in host_hits(e, iterations=3, weighted=False).collect()
    }
    assert out["dir"].authority == 0.0
    assert out["dir"].hub == 1.0  # max hub → normalized to 1
    assert out["b"].authority == 1.0  # linked by both → max authority
    assert out["a"].authority > 0.0
    assert out["b"].hub == 0.0  # b links to nobody


def test_hits_weighted_vs_unweighted(spark):
    """With link weighting, a 9-link edge dominates a 1-link edge from
    the same source; unweighted they contribute equally."""
    from soda_core_spark.operators.linkgraph import host_hits

    e = _edges(spark, [("s", "heavy", 9), ("s", "light", 1)])
    w = {r.host: r.authority for r in host_hits(e, iterations=1).collect()}
    u = {
        r.host: r.authority
        for r in host_hits(e, iterations=1, weighted=False).collect()
    }
    assert w["heavy"] == 1.0 and w["light"] == pytest.approx(1 / 9, abs=1e-9)
    assert u["heavy"] == 1.0 and u["light"] == 1.0


def test_hits_rejects_zero_iterations(spark):
    from soda_core_spark.operators.linkgraph import host_hits

    e = _edges(spark, [("a", "b", 1)])
    with pytest.raises(ValueError):
        host_hits(e, iterations=0)


# ---------------------------------------------------------------------------
# paragraph language segmentation
# ---------------------------------------------------------------------------


def test_paragraph_lang_profile_mixed_doc(spark):
    from soda_core_spark.functions.langid import paragraph_lang_profile

    en = "the and is of to in that it was for"
    fr = "le la les de des un une et est que qui dans pour pas sur avec"
    df = spark.createDataFrame(
        [
            (1, f"{en}\n\n{en}\n\n{fr}"),  # 2 en + 1 fr
            (2, en),  # monolingual
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in paragraph_lang_profile(df).collect()}
    assert rows[1].n_paragraphs == 3
    assert rows[1].dominant_lang == "en"
    assert rows[1].n_other == 1
    assert rows[1].other_fraction == pytest.approx(1 / 3, abs=1e-6)
    assert rows[2].n_paragraphs == 1
    assert rows[2].dominant_lang == "en"
    assert rows[2].n_other == 0


def test_paragraph_lang_profile_tie_breaks_lexicographic(spark):
    """1 French + 1 German paragraph: tie resolves to 'de' (first in
    sorted language order) on BOTH engines."""
    from soda_core_spark.functions.langid import paragraph_lang_profile

    fr = "le la les de des un une et est que qui dans pour pas sur avec"
    de = "der die das und ist ich nicht mit ein eine zu den von sie er es"
    df = spark.createDataFrame(
        [(1, f"{fr}\n\n{de}")], "doc_id int, text string"
    )
    row = paragraph_lang_profile(df).collect()[0]
    assert row.dominant_lang == "de"
    assert row.n_other == 1


def test_paragraph_lang_profile_blank_paragraphs_dropped(spark):
    from soda_core_spark.functions.langid import paragraph_lang_profile

    df = spark.createDataFrame(
        [(1, "the and is\n\n   \n\nof to in")], "doc_id int, text string"
    )
    row = paragraph_lang_profile(df).collect()[0]
    assert row.n_paragraphs == 2  # whitespace-only block dropped


# ---------------------------------------------------------------------------
# registered domain
# ---------------------------------------------------------------------------


def test_registered_domain_cases(spark):
    from soda_core_spark.operators.urls import registered_domain_col

    cases = [
        ("a.blog.co.uk", "blog.co.uk"),
        ("b.blog.co.uk", "blog.co.uk"),
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("deep.sub.site.com.au", "site.com.au"),
        ("localhost", "localhost"),
        ("co.uk", "co.uk"),  # bare suffix: only 2 labels → passthrough
        ("192.168.0.1", "192.168.0.1"),  # IPv4 literal passes through
        ("10.0.0.1", "10.0.0.1"),  # distinct IPs must stay distinct keys
        ("[2001:db8::1]", "[2001:db8::1]"),  # IPv6 literal passes through
        (None, None),
    ]
    df = spark.createDataFrame(
        [(h,) for h, _ in cases], "host string"
    ).withColumn("rd", registered_domain_col(F.col("host")))
    got = {r.host: r.rd for r in df.collect()}
    for host, want in cases:
        assert got[host] == want, (host, got[host], want)


def test_with_registered_domain_literal_broadcast_parity(spark):
    """The broadcast-join form of the registered-domain derivation must
    equal the isin-literal form host-for-host — forced through both
    paths with the same suffix set (the SemDeDup literal/broadcast
    parity pattern behind the full-PSL scale path)."""
    from pyspark.sql import functions as F

    from soda_core_spark.operators.urls import (
        MULTI_LABEL_SUFFIXES,
        with_registered_domain,
    )

    hosts = [
        "a.blog.co.uk", "b.blog.co.uk", "www.example.com", "example.com",
        "deep.sub.domain.com.au", "single", "10.0.0.1", "[2001:db8::1]",
        None, "x.co.jp", "co.uk", "y.z.gov.cn", "weird..double",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    lit = with_registered_domain(
        df, "host", suffixes=MULTI_LABEL_SUFFIXES,
        broadcast_threshold=10_000,       # force the literal path
    )
    bc = with_registered_domain(
        df, "host", suffixes=MULTI_LABEL_SUFFIXES,
        broadcast_threshold=0,            # force the broadcast path
    )
    got_lit = sorted(
        [(r["host"], r["registered_domain"]) for r in lit.collect()],
        key=str,
    )
    got_bc = sorted(
        [(r["host"], r["registered_domain"]) for r in bc.collect()],
        key=str,
    )
    assert got_lit == got_bc
    # and the column-form values too (the documented equivalence)
    from soda_core_spark.operators.urls import registered_domain_col

    col = sorted(
        [
            (r["host"], r["rd"])
            for r in df.withColumn(
                "rd", registered_domain_col(F.col("host"))
            ).collect()
        ],
        key=str,
    )
    assert got_lit == col


def test_with_registered_domain_broadcast_plan_no_giant_literal(spark):
    """Above the threshold the plan must contain a BroadcastHashJoin and
    no isin literal carrying the suffix set."""
    from soda_core_spark.operators.urls import with_registered_domain

    df = spark.createDataFrame([("a.co.uk",)], "host string")
    big = tuple(f"s{i}.tld" for i in range(500)) + ("co.uk",)
    out = with_registered_domain(
        df, "host", suffixes=big, broadcast_threshold=256
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "s123.tld" not in plan  # the set is data, not plan text
    assert [r["registered_domain"] for r in out.collect()] == ["a.co.uk"]
