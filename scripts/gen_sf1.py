"""Generate an sf1.0 test-table set by deterministic 10x replication of
the driver's sf0.1 tables with consistent key offsets.

The oracle-parity sweep compares Spark vs DuckDB on the SAME files, so
any schema-compatible data exercises the registry; what sf1.0 adds is
SCALE — 6M lineitem rows, 50k documents, 20k embeddings — where
quantile interpolation, cardinality estimates, LSH banding, and top-k
tie-breaks can diverge in ways sf0.1 cannot show. Replication keeps
every foreign-key relationship intact (each copy's keys are offset by
copy_index * max_key_ceiling, consistently across referencing tables;
the fixed dimension tables region/nation are NOT replicated so FK
targets stay valid), and the 10 identical text/embedding copies under
distinct ids are a deliberate stress: exact/MinHash/semantic dedup at
sf1.0 sees 10-member duplicate classes everywhere — the hot-key shape
the band caps and AQE skew handling exist for.

Usage: python scripts/gen_sf1.py [out_dir]   (default /tmp/testdata_sf1.0)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: key columns to offset, per table: {table: {column: ceiling}}.
#: Ceilings are fixed powers of ten above the sf0.1 max so offsets are
#: stable and readable (copy 3's orderkey 42 -> 3_000_042).
CEILINGS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}

PASSTHROUGH = ["region", "nation"]


def main(out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in PASSTHROUGH:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: passthrough")
    for t, keys in CEILINGS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"({c} + i.copy * {keys[c]})::BIGINT AS {c}" if c in keys else c
            for c in cols
        )
        con.sql(
            f"""
            COPY (
              SELECT {sel}
              FROM read_parquet('{SRC}/{t}.parquet')
              CROSS JOIN (SELECT unnest(range({COPIES})) AS copy) i
              ORDER BY {list(keys)[0]}
            ) TO '{out_dir}/{t}.parquet'
            (FORMAT PARQUET, ROW_GROUP_SIZE 122880)
            """
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({COPIES}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1.0"))
