"""Data-level parity fuzz corpus: a deterministic mutation of an
sf-directory that injects the edges the clean generator never produces —
NULLs in nullable value columns (~2% per column, hash-keyed) and
duplicate-CONTENT rows under FRESH primary keys (documents/events).

Both engines then run the FULL registry on the SAME mutated parquet via
``check_oracles.py``, so any hash mismatch is a genuine cross-engine
semantics divergence, not a wrong answer: the oracle can't be fooled by
a shared assumption about the data because the data no longer honors it.

Round-5 findings from this harness (all fixed + regression-pinned in
tests/test_null_edges.py):
  * asof-class invisible edges: shingles_col emitted [''] for zero-word
    docs (DuckDB's array_to_string([]) is NULL, Spark's concat_ws '') —
    every empty doc was a jaccard-1.0 duplicate of every other;
  * NULL embeddings crashed both k-means trainers at the init collect
    and poisoned semdedup's distance ordering differently per engine;
  * decontaminate's struct-max picked a phantom nearest_bench_id for
    unscorable vectors;
  * equi-joins on group keys silently dropped NULL groups from
    sample_to_token_budget and calibrate_group_thresholds (window
    PARTITION BY keeps a NULL partition; a join does not);
  * two oracles lost NULL label classes through USING joins.

Keys (doc_id, vec_id, event_id, *key) are never nulled: duplicate or
NULL primary keys violate the declared contract — detecting those is
the duplicate/missing CHECK operators' job, upstream of these queries.

Usage: python scripts/gen_null_fuzz.py [src_dir] [out_dir]
       (defaults /root/testdata/sf0.001 -> /tmp/sf_nulls)
Then:  python scripts/check_oracles.py /tmp/sf_nulls
"""

import sys

import duckdb

NULLABLE = {
    "region": [],
    "nation": [],
    "part": ["p_comment", "p_type"],
    "supplier": ["s_comment", "s_phone"],
    "customer": ["c_comment", "c_mktsegment", "c_phone"],
    "orders": ["o_comment", "o_clerk", "o_orderpriority"],
    "lineitem": ["l_comment", "l_shipmode", "l_returnflag"],
    "events": ["props", "event_type", "value", "user_id"],
    "documents": ["text", "lang", "source"],
    "embeddings": ["embedding"],
}

# content-duplicate rows get key + OFFSET — fresh PK, replicated payload
DUP_KEY = {"documents": "doc_id", "events": "event_id"}
OFFSET = 1_000_000


def main(src: str, out: str) -> int:
    import os

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, cols in NULLABLE.items():
        rel = con.sql(f"SELECT * FROM read_parquet('{src}/{t}.parquet')")
        allcols = [d[0] for d in rel.description]
        first = allcols[0]
        sel = [
            (
                f"CASE WHEN hash(CAST({first} AS VARCHAR) || '{c}') % 50 = 0"
                f" THEN NULL ELSE {c} END AS {c}"
                if c in cols
                else c
            )
            for c in allcols
        ]
        if t in DUP_KEY:
            k = DUP_KEY[t]
            dupsel = ", ".join(
                f"{k} + {OFFSET} AS {k}" if c == k else c for c in allcols
            )
            dup = (
                f" UNION ALL SELECT {dupsel} FROM base"
                f" WHERE hash(CAST({first} AS VARCHAR)) % 100 = 3"
            )
        else:
            dup = ""
        con.sql(
            f"COPY (WITH base AS (SELECT {', '.join(sel)}"
            f" FROM read_parquet('{src}/{t}.parquet'))"
            f" SELECT * FROM base{dup}) TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_nulls"
    sys.exit(main(src, out))
