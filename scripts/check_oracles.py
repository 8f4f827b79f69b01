"""Local replica of the driver's correctness gate: run every queries()
entry in Spark and its oracle_sql() twin in DuckDB on the same parquet
tables; compare row count, column names, and order-insensitive values.

Usage::

    python scripts/check_oracles.py [sf_dir] [name-substring ...]
    python scripts/check_oracles.py [sf_dir] --emit-json OUT.json

Optional name substrings restrict the run to matching registry queries
(e.g. ``q116 q114`` while iterating on new operators). ``--emit-json``
writes a machine-readable artifact in exactly the driver's
CORRECTNESS_r{N}.json per-query schema (``rows_match`` /
``schema_match`` / ``hash_match`` / ``spark_rows`` / ``oracle_rows`` /
``err``) so rounds where the driver's own sweep covers only a prefix of
the registry still ship a verifiable record for every query. For
entries with no oracle (rows-only), ``hash_match``/``schema_match`` are
null and ``oracle_rows`` is null — the same weaker-check shape the
driver records.
"""

from __future__ import annotations

import json
import os
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


def check_one(con, name, fn, oracles, spark, sf_dir) -> dict:
    """One registry query → a driver-schema record."""
    rec = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": None, "oracle_rows": None, "err": None,
    }
    try:
        spdf = fn(spark, sf_dir).toPandas()
        rec["spark_rows"] = len(spdf)
    except Exception as e:
        rec["err"] = f"spark error: {e}"
        return rec
    if name not in oracles:
        # rows-only entry: the driver records the weaker shape too
        rec["rows_match"] = rec["spark_rows"] >= 0
        return rec
    try:
        opdf = con.sql(oracles[name]).df()
        rec["oracle_rows"] = len(opdf)
    except Exception as e:
        rec["err"] = f"duckdb error: {e}"
        return rec
    s, o = normalize(spdf), normalize(opdf)
    rec["rows_match"] = len(s) == len(o)
    rec["schema_match"] = list(s.columns) == list(o.columns)
    if not rec["rows_match"] or not rec["schema_match"]:
        rec["hash_match"] = False
        return rec
    try:
        pd.testing.assert_frame_equal(
            s, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
        )
        rec["hash_match"] = True
    except AssertionError as e:
        rec["hash_match"] = False
        rec["err"] = f"values differ: {str(e).splitlines()[-1]}"
    return rec


def main(sf_dir: str, only: list[str] | None = None,
         emit_json: str | None = None) -> int:
    from pyspark.sql import SparkSession

    from __spark_entry__ import oracle_sql, queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        # default 1g driver heap OOMs on the sf1.0 (6M-lineitem) sweep;
        # override with SPARK_GRAFT_MEM for bigger synthetic scales
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
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
    results, failures = {}, 0
    for name, fn in qs.items():
        rec = check_one(con, name, fn, oracles, spark, sf_dir)
        results[name] = rec
        if rec["err"] or rec["hash_match"] is False:
            failures += 1
            print(f"FAIL  {name}: {rec['err'] or 'mismatch'} "
                  f"(rows {rec['spark_rows']} vs {rec['oracle_rows']})")
        elif rec["hash_match"] is None:
            print(f"ROWS  {name}: {rec['spark_rows']} rows (no oracle)")
        else:
            print(f"OK    {name}: {rec['spark_rows']} rows")
    if emit_json:
        with open(emit_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": results}, f, indent=1)
        print(f"wrote {emit_json} ({len(results)} queries)")
    print(f"\n{len(qs)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    emit = None
    if "--emit-json" in argv:
        i = argv.index("--emit-json")
        emit = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(
        main(
            argv[0] if argv else "/root/testdata/sf0.01",
            argv[1:] or None,
            emit_json=emit,
        )
    )
