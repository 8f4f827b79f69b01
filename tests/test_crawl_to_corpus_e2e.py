"""Capstone integration: raw crawl bytes to kept corpus in one plan.

WARC chunks (binary) -> record parse (mapInPandas) -> HTML text
extraction (codegen) -> quality-filter pipeline (signals + langid +
perplexity + scrub + keep/drop + lineage). This is the full ingest
story the engine exists for; every stage is individually oracled
elsewhere — this test pins that they COMPOSE, with deterministic counts
and byte-accounted parsing."""

from pyspark.sql import functions as F

from soda_core_spark.functions.html import with_extracted_text
from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline
from soda_core_spark.sources.warc import build_warc_bytes, parse_warc_records
from soda_core_spark.sources.webtext_gen import generate_web_pages


def _html_of(text: str, title: str) -> bytes:
    body = "".join(f"<p>{p}</p>" for p in text.split("\n"))
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body>{body}</body></html>"
    ).encode()


def test_warc_to_kept_corpus(spark):
    pdf = generate_web_pages(120, seed=21)
    src = [
        {
            "url": u,
            "warc_ts": str(t),
            "html": _html_of(txt, f"page {i}"),
        }
        for i, (u, t, txt) in enumerate(
            zip(pdf["url"], pdf["warc_ts"], pdf["text"])
        )
    ]
    chunks = [
        (i, build_warc_bytes(src[i * 30 : (i + 1) * 30], gzip_members=True))
        for i in range(4)
    ]
    df = spark.createDataFrame(chunks, "chunk_id long, warc binary")

    records = parse_warc_records(df)
    pages = with_extracted_text(records, html_col="payload").select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        F.col("payload").alias("html"),
        F.col("extracted_text").alias("text"),
        F.lit("en").alias("lang"),
        "title",
        "n_malformed",
    )
    assert pages.where(F.col("n_malformed") > 0).count() == 0

    res = QualityFilterPipeline().run(pages)
    assert res.n_input == 120
    assert 0 < res.n_kept <= 120

    # extraction recovered the generated prose (modulo markup): the
    # lexicographically-first page's extracted text contains its source
    # text's first 40 characters of prose
    row = pages.orderBy("url").select("url", "text").first()
    probe = str(pdf["text"][list(pdf["url"]).index(row["url"])])[:40]
    assert probe.split("\n")[0][:40] in row["text"]

    # determinism: the same bytes give the same keep count
    res2 = QualityFilterPipeline().run(pages)
    assert res2.n_kept == res.n_kept
