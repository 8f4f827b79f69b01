"""HTML → text extraction: python-oracle parity, plan shape, binary input."""

import re

from pyspark.sql import functions as F


def _py_extract(s: str) -> str:
    from soda_core_spark.functions.html import (
        HTML_ENTITIES,
        HTML_EXTRACT_RULES,
        _ENTITY_STAGE,
    )

    for i, (pat, rep) in enumerate(HTML_EXTRACT_RULES):
        if i == _ENTITY_STAGE:
            for ent, lit in HTML_ENTITIES:
                s = s.replace(ent, lit)
        s = re.sub(pat, rep, s)
    return s


CASES = [
    "<html><head><title> My &amp; Title </title><style>p{color:red}</style>"
    "<script>var x='<p>not text</p>';</script></head>"
    "<body><h1>Heading</h1><p>Para one with <b>bold</b> and a "
    "<a href='/x'>link&nbsp;text</a>.</p>\n\n<div>Second   block</div>"
    "<!-- comment --><ul><li>item1</li><li>item2</li></ul>"
    "&amp;lt; stays &lt; becomes</body></html>",
    "no tags at all",
    "",
    "<p>&#39;q&#39; &quot;d&quot;</p>",
    "<P CLASS=x>upper <BR>case tags</P>",
    "<script>unclosed script swallows nothing after"
    "</p>",  # malformed: unterminated script only removed when closed
    "a <span>b</span> c<hr>d",
    "<noscript>hidden</noscript>shown",
    "<pre>kept\ntext</pre>",
]


def test_extraction_matches_python_oracle(spark):
    from soda_core_spark.functions.html import html_text_col

    df = spark.createDataFrame(list(enumerate(CASES)), ["i", "h"])
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_text_col(F.col("h")).alias("t")).collect()
    }
    for i, c in enumerate(CASES):
        assert got[i] == _py_extract(c), (i, got[i])


def test_extraction_semantics():
    """Pin the observable behavior, not just oracle agreement."""
    out = _py_extract(CASES[0])
    assert "color:red" not in out and "not text" not in out  # style/script
    assert "comment" not in out
    assert "Heading\n" in out  # block boundary → newline
    assert "My & Title" in out  # entity decode
    assert "&lt; stays < becomes" in out  # single-pass entity decode
    assert "  " not in out  # whitespace collapsed


def test_with_extracted_text_binary_and_null(spark):
    from soda_core_spark.functions.html import with_extracted_text

    rows = [
        (1, "<p>hello <b>world</b></p>".encode()),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, html binary")
    got = {
        r["doc_id"]: (r["extracted_text"], r["title"], r["link_density"])
        for r in with_extracted_text(df).collect()
    }
    assert got[1][0] == "hello world"
    assert got[2] == (None, None, None)


def test_title_and_link_density(spark):
    from soda_core_spark.functions.html import with_extracted_text

    rows = [
        (1, "<title>T &amp; T</title><p>body text here</p>"),
        (2, "<p>no title</p>"),
        (3, "<p><a href=x>all of this is link</a></p>"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "html"])
    got = {
        r["doc_id"]: (r["title"], r["link_density"])
        for r in with_extracted_text(df).collect()
    }
    assert got[1][0] == "T & T"
    assert got[2][0] is None
    assert got[3][1] == 1.0
    assert got[1][1] == 0.0  # no anchors at all


def test_extraction_no_shuffle_no_python(spark):
    from soda_core_spark.functions.html import with_extracted_text

    df = spark.createDataFrame([(1, "<p>x</p>")], ["doc_id", "html"])
    plan = (
        with_extracted_text(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM chain


def test_pipeline_html_fallback(spark):
    """Rows with NULL text take their text from the html column when
    html_fallback=True; default pipeline leaves them missing."""
    from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline
    from soda_core_spark.sources.webtext_gen import generate_web_pages

    pdf = generate_web_pages(40, seed=5)
    for c in ("url", "text", "lang"):
        pdf[c] = pdf[c].astype(object)
    df = spark.createDataFrame(pdf)
    # null out one row's text and give it REAL html of another row's text
    donor = pdf["text"][1]
    html = f"<html><body><p>{donor}</p></body></html>".encode()
    df = df.withColumn(
        "text",
        F.when(F.col("url") == pdf["url"][0], F.lit(None)).otherwise(
            F.col("text")
        ),
    ).withColumn(
        "html",
        F.when(F.col("url") == pdf["url"][0], F.lit(html)).otherwise(
            F.col("html")
        ),
    ).withColumn(
        # rules also read the declared lang — give row0 the donor's so
        # every text-derived signal (and therefore keep) must match
        "lang",
        F.when(F.col("url") == pdf["url"][0], F.lit(pdf["lang"][1])).otherwise(
            F.col("lang")
        ),
    )

    base = QualityFilterPipeline().annotate(df)
    row0 = base.where(F.col("url") == pdf["url"][0]).first()
    assert row0["text"] is None

    fb = QualityFilterPipeline(html_fallback=True).annotate(df)
    row0b = fb.where(F.col("url") == pdf["url"][0]).first()
    assert row0b["text"] == donor
    # donor text is keepable → the recovered row scores like the donor
    donor_row = fb.where(F.col("url") == pdf["url"][1]).first()
    assert row0b["keep"] == donor_row["keep"]


# ---------------------------------------------------------------------------
# head metadata extraction (with_html_metadata)
# ---------------------------------------------------------------------------


def test_html_metadata_extraction(spark):
    import datetime as dt

    from soda_core_spark.functions.html import with_html_metadata

    rows = [
        (
            1,
            '<html><head><link rel="canonical" href="https://ex.com/a"/>'
            '<meta property="article:published_time" '
            'content="2026-08-18T10:30:00"/>'
            '<meta property="og:title" content="Cats &amp; Dogs"/>'
            '<meta name="description" content="All about pets"/>'
            "</head><body>x</body></html>",
        ),
        (
            2,
            # fallback chain: no article meta → <time datetime>
            '<html><body><time datetime="2025-01-02T03:04:05">then</time>'
            "</body></html>",
        ),
        (3, "<html><body>no metadata at all</body></html>"),
        (4, '<meta name="date" content="not a date"/>'),
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "html"])
    got = {r["doc_id"]: r for r in with_html_metadata(df).collect()}
    assert got[1]["canonical_href"] == "https://ex.com/a"
    assert got[1]["published_ts"] == dt.datetime(2026, 8, 18, 10, 30)
    assert got[1]["og_title"] == "Cats & Dogs"
    assert got[1]["meta_description"] == "All about pets"
    assert got[2]["published_ts"] == dt.datetime(2025, 1, 2, 3, 4, 5)
    assert got[2]["canonical_href"] is None
    assert all(got[3][c] is None for c in
               ("canonical_href", "published_ts", "og_title"))
    assert got[4]["published_ts"] is None  # unparseable date → NULL
    assert all(got[5][c] is None for c in
               ("canonical_href", "published_ts", "og_title"))


def test_html_metadata_is_shuffle_free(spark):
    from soda_core_spark.functions.html import with_html_metadata

    df = spark.createDataFrame([(1, "<p>x</p>")], ["doc_id", "html"])
    plan = (
        with_html_metadata(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
