"""Local replica of the driver's correctness gate: run every queries()
entry in Spark and its oracle_sql() twin in DuckDB on the same parquet
tables; compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [name-substring ...]
Optional name substrings restrict the run to matching registry queries
(e.g. ``q116 q114`` while iterating on new operators).
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            # missing arrives as None from Spark and NaN from DuckDB —
            # unify BEFORE stringifying or 'None' != 'nan' false-fails
            # (the driver's comparator is NULL-safe: q47 was green with
            # NULL strings in round 3)
            pdf[c] = pdf[c].where(pdf[c].notna(), None).astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("float64").round(9)
        elif "datetime" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pdf[c].dtype == bool or "bool" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype(bool)
        elif "int" in str(pdf[c].dtype).lower():
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    from pyspark.sql import SparkSession

    from __spark_entry__ import oracle_sql, queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = queries(), oracle_sql()
    if only:
        qs = {n: f for n, f in qs.items() if any(s in n for s in only)}
        if not qs:
            print(f"no registry query matches {only}")
            return 1
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle)")
            continue
        try:
            opdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        s, o = normalize(spdf), normalize(opdf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(o.columns)}")
            failures += 1
            continue
        if len(s) != len(o):
            print(f"FAIL  {name}: rows {len(s)} vs {len(o)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                s, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
            )
            print(f"OK    {name}: {len(s)} rows")
        except AssertionError as e:
            print(f"FAIL  {name}: values differ: {str(e).splitlines()[-1]}")
            failures += 1
    print(f"\n{len(qs)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:] or None,
        )
    )
