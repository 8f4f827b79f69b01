"""Document chunking edge cases (operators/chunking.py); value semantics
are cross-checked against DuckDB by q41 in tests/test_oracle_parity.py."""

import pytest
from pyspark.sql import functions as F

from soda_core_spark.operators.chunking import chunk_documents


def test_chunking_edges(spark):
    docs = [
        (1, " ".join(f"w{i}" for i in range(10))),  # one short chunk
        (2, " ".join(f"w{i}" for i in range(5))),  # exactly chunk_size
        (3, " ".join(f"w{i}" for i in range(12))),  # 3 chunks at stride 4
        (4, ""),  # no tokens → no chunks
        (5, None),  # NULL → no chunks
        (6, " ".join(f"w{i}" for i in range(9))),  # tail window shorter
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = chunk_documents(df, chunk_size=5, stride=4)
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    }
    by_doc = {}
    for (d, _i), _ in rows.items():
        by_doc[d] = by_doc.get(d, 0) + 1
    # doc1: k=10 → 1+ceil(5/4)=3 chunks; doc2: 1; doc3: k=12 → 1+ceil(7/4)=3
    assert by_doc == {1: 3, 2: 1, 3: 3, 6: 2}
    assert rows[(2, 0)] == (5, "w0 w1 w2 w3 w4")
    # doc1 chunks: starts 0,4,8 → lengths 5,5,2
    assert rows[(1, 0)][0] == 5 and rows[(1, 1)][0] == 5 and rows[(1, 2)] == (
        2,
        "w8 w9",
    )
    # overlap: chunk 1 starts at token 4
    assert rows[(1, 1)][1].startswith("w4 ")
    # doc6: k=9 → starts 0,4 → lengths 5,5(=tokens 4..8)
    assert rows[(6, 1)] == (5, "w4 w5 w6 w7 w8")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=5, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=5, stride=6)


def test_chain_fragments_inverts_overlap_chunking(spark):
    from soda_core_spark.operators.chunking import chain_fragments

    words = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    # 10-token windows, stride 6 -> overlap 4: chunks at 0,6,12,18,24
    frags = chunk_documents(df, chunk_size=10, stride=6).select(
        (F.col("doc_id") * 100 + F.col("chunk_idx")).alias("fid"),
        "chunk_text",
    )
    edges = {(r.prev_id, r.next_id) for r in chain_fragments(
        frags, id_col="fid", text_col="chunk_text", k=4).collect()}
    # consecutive chunks chain; nothing else does
    assert edges == {(100, 101), (101, 102), (102, 103), (103, 104)}


def test_chain_fragments_short_and_selfloop_excluded(spark):
    from soda_core_spark.operators.chunking import chain_fragments

    rows = [
        (1, "a b c d tail x y z"),   # tail-4 = "tail x y z"
        (2, "tail x y z continues here fine"),  # head-4 matches 1's tail
        (3, "x y"),                   # < k tokens: no endpoints
        (4, "p p p p p p p p"),       # head == tail but self-loops drop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    edges = chain_fragments(df, k=4).collect()
    assert {(r.prev_id, r.next_id) for r in edges} == {(1, 2)}


def test_chain_fragments_hot_boundary_capped(spark):
    from soda_core_spark.operators.chunking import chain_fragments

    # 5 fragments ending with the same boilerplate footer, 5 starting
    # with it: cap 3 drops the fingerprint from both sides entirely
    rows = [(i, f"u{i} v{i} shared boiler plate footer") for i in range(5)]
    rows += [(10 + i, f"shared boiler plate footer q{i} r{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dense = chain_fragments(df, k=4, max_fp_docs=64).count()
    capped = chain_fragments(df, k=4, max_fp_docs=3).count()
    assert dense == 25 and capped == 0


def test_chain_fragments_validation(spark):
    from soda_core_spark.operators.chunking import chain_fragments

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chain_fragments(df, k=0)
