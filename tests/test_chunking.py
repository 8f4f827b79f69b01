"""Document chunking edge cases (operators/chunking.py); value semantics
are cross-checked against DuckDB by q41 in tests/test_oracle_parity.py."""

import pytest

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
