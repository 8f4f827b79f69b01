"""WARC record parsing: round-trip vs the encoder twin, gzip members,
malformed-tail accounting, pure-python parser units."""

import pytest

from soda_core_spark.sources.warc import (
    build_warc_bytes,
    parse_warc_member,
    parse_warc_records,
    split_gzip_members,
)


def _recs():
    return [
        {"url": "https://a.example.com/x", "warc_ts": "2026-08-01T00:00:00Z",
         "html": b"<html>alpha</html>"},
        {"url": "https://b.example.com/y", "warc_ts": "2026-08-02T12:30:00Z",
         "html": b"<html>beta \xe2\x9c\x93</html>"},
    ]


def test_member_roundtrip_plain():
    buf = build_warc_bytes(_recs())
    recs, bad = parse_warc_member(buf)
    assert bad == 0 and len(recs) == 2
    assert recs[0]["url"] == "https://a.example.com/x"
    assert recs[0]["http_status"] == 200
    assert recs[0]["payload"] == b"<html>alpha</html>"
    assert recs[1]["payload"] == _recs()[1]["html"]
    assert recs[1]["content_type"] == "text/html"


def test_gzip_member_split():
    buf = build_warc_bytes(_recs(), gzip_members=True)
    members, bad = split_gzip_members(buf)
    assert bad == 0 and len(members) == 2
    # truncated final member is counted, earlier members survive
    members, bad = split_gzip_members(buf[:-20])
    assert bad == 1 and len(members) == 1


def test_malformed_tail_counted():
    buf = build_warc_bytes(_recs()) + b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"
    recs, bad = parse_warc_member(buf)
    assert len(recs) == 2 and bad == 1


def test_spark_explode_roundtrip(spark):
    from soda_core_spark.sources.webtext_gen import generate_web_pages

    pdf = generate_web_pages(30, seed=11)
    src = [
        {"url": u, "warc_ts": str(t), "html": bytes(h)}
        for u, t, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"])
    ]
    # 3 chunks of 10 records, mixed plain/gzip
    chunks = []
    for i in range(3):
        part = src[i * 10 : (i + 1) * 10]
        chunks.append((i, build_warc_bytes(part, gzip_members=i % 2 == 0)))
    df = spark.createDataFrame(chunks, "chunk_id long, warc binary")
    out = parse_warc_records(df).collect()
    assert len(out) == 30
    got = {r["url"]: r for r in out}
    for s in src:
        r = got[s["url"]]
        assert bytes(r["payload"]) == s["html"]  # byte-identical ingest
        assert r["http_status"] == 200
        assert r["n_malformed"] == 0
        assert r["warc_type"] == "response"


def test_spark_empty_chunk_visible(spark):
    df = spark.createDataFrame(
        [(7, b"\x1f\x8bgarbage")], "chunk_id long, warc binary"
    )
    out = parse_warc_records(df).collect()
    assert len(out) == 1
    assert out[0]["url"] is None and out[0]["n_malformed"] >= 1


def test_streaming_warc_ingest(spark, tmp_path):
    """WARC chunks arriving as a stream (the crawl-ingest shape):
    readStream -> mapInPandas parse -> memory sink, exactly-once rows."""
    from soda_core_spark.sources.webtext_gen import generate_web_pages

    pdf = generate_web_pages(20, seed=13)
    src = [
        {"url": u, "warc_ts": str(t), "html": bytes(h)}
        for u, t, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"])
    ]
    chunks = [
        (i, build_warc_bytes(src[i * 10 : (i + 1) * 10], gzip_members=True))
        for i in range(2)
    ]
    inp = str(tmp_path / "chunks")
    spark.createDataFrame(chunks, "chunk_id long, warc binary").write.parquet(inp)

    stream = spark.readStream.schema("chunk_id long, warc binary").parquet(inp)
    parsed = parse_warc_records(stream)
    q = (
        parsed.writeStream.format("memory")
        .queryName("warc_ingest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM warc_ingest").collect()
    assert len(rows) == 20
    got = {r["url"]: bytes(r["payload"]) for r in rows}
    assert all(got[s["url"]] == s["html"] for s in src)


def test_seeded_fuzz_never_crashes_and_accounts_loss():
    """300 seeded cases: random payload bytes (incl. CRLFs and fake WARC
    magic inside bodies), random gzip/plain mix, random truncation.
    The parser must never raise; intact prefixes parse byte-identically;
    any truncation mid-stream is visible in the malformed count."""
    import random

    rng = random.Random(42)
    for case in range(300):
        n_rec = rng.randint(1, 5)
        recs = []
        for i in range(n_rec):
            body = bytes(rng.randrange(256) for _ in range(rng.randint(0, 400)))
            if rng.random() < 0.3:
                body += b"\r\n\r\nWARC/1.0\r\n"  # magic inside a body
            recs.append({
                "url": f"https://h{rng.randrange(50)}.example/{i}",
                "warc_ts": "2026-08-18T00:00:00Z",
                "html": body,
            })
        gz = rng.random() < 0.5
        # record/member byte boundaries: a cut exactly ON one is
        # indistinguishable from a shorter valid stream (WARC has no
        # end-of-stream framing) and is legitimately silent
        bounds = {0}
        buf = b""
        for r in recs:
            buf += build_warc_bytes([r], gzip_members=gz)
            bounds.add(len(buf))
        cut = rng.random() < 0.5
        on_boundary = False
        if cut:
            pos = rng.randint(0, len(buf))
            on_boundary = pos in bounds
            buf = buf[:pos]
        members, bad_gz = split_gzip_members(buf)
        parsed, bad = [], bad_gz
        for m in members:
            r, b = parse_warc_member(m)
            parsed.extend(r)
            bad += b
        assert len(parsed) <= n_rec
        if not cut:
            assert bad == 0 and len(parsed) == n_rec, f"case {case}"
            for src_r, got in zip(recs, parsed):
                assert got["payload"] == src_r["html"], f"case {case}"
        else:
            # whatever parsed must still be byte-faithful to its source
            for src_r, got in zip(recs, parsed):
                assert got["payload"] == src_r["html"], f"case {case}"
            assert len(parsed) == n_rec or bad > 0 or on_boundary, (
                f"case {case}: silent loss"
            )
