"""Local twin of the driver's correctness gate: run every oracled
REGISTRY query on Spark AND its DuckDB oracle SQL at sf0.001 and assert
value-identical results (columns sorted by name, rows sorted, exact
compare — the same shape the driver hashes).

Catching a drift here is strictly cheaper than catching it in
CORRECTNESS_r{N}.json after the round closes.
"""

import os

import duckdb
import pandas as pd
import pytest

from soda_core_spark.entry_queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

ORACLED = sorted(name for name, (_fn, sql) in REGISTRY.items() if sql is not None)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # timestamps arrive tz-aware from Spark (session UTC) and naive from
    # DuckDB; strip tz so the value compare is on the same clock
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_localize(None)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, oracle, name):
    fn, sql = REGISTRY[name]
    got = _norm(fn(spark, SF_DIR).toPandas())
    want = _norm(oracle.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs oracle {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
