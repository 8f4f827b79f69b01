"""WARC record parsing — the ingest step UPSTREAM of the ``web_pages``
table: Common-Crawl ships crawls as WARC files (ISO 28500: records of
``WARC/1.x`` header block + body, separated by CRLFCRLF, usually
per-record gzip members), and a curation pipeline's first job turns
those bytes into the (url, warc_ts, html, ...) rows everything else here
consumes.

Spark shape: WARC bytes arrive as an opaque ``binary`` column (one
file / chunk per row — the multimodal-column pattern,
functions/multimodal.py); parsing runs in ``mapInPandas`` with an
ITERATOR signature so one Arrow batch of chunks streams through at a
time — no per-row Python UDF, no driver involvement, and chunk rows
explode into record rows inside the same task (no shuffle). Everything
is stdlib: gzip member splitting via ``zlib`` (wbits=47 auto-detects the
gzip wrapper), header parsing by byte scanning. Malformed tails are
counted, never fatal — at crawl scale a truncated member is a WHEN
(same contract as sources/tables.py corrupt_file_audit).

Reference anchor: the reference engine ingests already-tabular
warehouse data (soda-core data_source facade); WARC ingestion is the
webtext-pipeline extension of the same "source → contract-checked
table" shape.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.StringType()),  # ISO-8601 as recorded
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_malformed", T.IntegerType()),
    ]
)

_MAX_MEMBER = 64 * 1024 * 1024  # inflate bound per gzip member (bombs)


def split_gzip_members(buf: bytes) -> tuple[list[bytes], int]:
    """Split a multi-member gzip stream into decompressed members.
    Returns (members, n_malformed). A plain (non-gzip) buffer comes back
    as a single member."""
    if not buf[:2] == b"\x1f\x8b":
        return [buf], 0
    members: list[bytes] = []
    bad = 0
    data = buf
    while data[:2] == b"\x1f\x8b":
        dec = zlib.decompressobj(47)
        try:
            out = dec.decompress(data, _MAX_MEMBER)
            if not dec.eof:  # truncated or over-bound member
                bad += 1
                break
        except zlib.error:
            bad += 1
            break
        members.append(out)
        data = dec.unused_data
    if data and data[:2] != b"\x1f\x8b":
        bad += 1 if data.strip(b"\x00") else 0
    return members, bad


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return headers


def parse_warc_member(member: bytes) -> tuple[list[dict], int]:
    """Parse one decompressed WARC stream (>= 1 record) into dicts.
    Returns (records, n_malformed)."""
    records: list[dict] = []
    bad = 0
    pos = 0
    n = len(member)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and member[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not member[pos : pos + 5] == b"WARC/":
            bad += 1
            break
        hdr_end = member.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            bad += 1
            break
        headers = _parse_headers(member[pos : hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            bad += 1
            break
        body = member[hdr_end + 4 : hdr_end + 4 + length]
        if len(body) < length:
            bad += 1
            break
        pos = hdr_end + 4 + length
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "http_status": None,
            "content_type": headers.get("content-type"),
            "payload": body,
        }
        if rec["warc_type"] == "response" and body[:5] == b"HTTP/":
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line = body.split(b"\r\n", 1)[0].split()
                if len(status_line) >= 2 and status_line[1].isdigit():
                    rec["http_status"] = int(status_line[1])
                http_headers = _parse_headers(body[:http_end])
                rec["content_type"] = http_headers.get(
                    "content-type", rec["content_type"]
                )
                rec["payload"] = body[http_end + 4 :]
        records.append(rec)
    return records, bad


def parse_warc_records(
    df: DataFrame, warc_col: str = "warc", chunk_id_col: str = "chunk_id"
) -> DataFrame:
    """Explode a binary column of WARC chunks into one row per record.
    ``n_malformed`` counts parse failures per chunk (attached to every
    record of the chunk, and emitted on a NULL-record row when a chunk
    yields nothing — loss is visible, never silent)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for cid, buf in zip(pdf[chunk_id_col], pdf[warc_col]):
                if buf is None:
                    continue
                members, bad = split_gzip_members(bytes(buf))
                recs = []
                for m in members:
                    r, b2 = parse_warc_member(m)
                    recs.extend(r)
                    bad += b2
                if not recs:
                    rows.append(
                        {
                            "chunk_id": int(cid),
                            "warc_type": None,
                            "url": None,
                            "warc_ts": None,
                            "http_status": None,
                            "content_type": None,
                            "payload": None,
                            "n_malformed": bad,
                        }
                    )
                for r in recs:
                    rows.append({"chunk_id": int(cid), "n_malformed": bad, **r})
            yield pd.DataFrame(
                rows, columns=[f.name for f in RECORD_SCHEMA.fields]
            )

    src = df.select(
        F.col(chunk_id_col).alias("chunk_id"), F.col(warc_col).alias("warc")
    )
    return src.mapInPandas(run, schema=RECORD_SCHEMA)


def build_warc_bytes(
    records: list[dict], gzip_members: bool = False
) -> bytes:
    """Encoder twin for tests: serialize (url, warc_ts, html) dicts into
    WARC response records (HTTP 200 wrapper), optionally one gzip member
    per record — the Common-Crawl layout."""
    import gzip as _gzip

    out = b""
    for r in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + r["html"]
        )
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['warc_ts']}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode() + b"\r\n"
        rec = hdr + http + b"\r\n\r\n"
        out += _gzip.compress(rec) if gzip_members else rec
    return out
