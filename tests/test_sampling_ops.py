

def test_length_buckets_and_waste(spark):
    from soda_core_spark.operators.sampling import (
        assign_length_buckets,
        padding_waste_report,
    )

    import pytest

    df = spark.createDataFrame(
        [(1, 5), (2, 8), (3, 9), (4, 64), (5, 100)], ["doc_id", "n_tokens"]
    )
    b = assign_length_buckets(df, [8, 16, 32, 64])
    got = {r["doc_id"]: (r["len_bucket"], r["pad_tokens"]) for r in b.collect()}
    assert got == {
        1: (0, 3),   # pads to 8
        2: (0, 0),   # exactly 8
        3: (1, 7),   # pads to 16
        4: (3, 0),   # exactly 64
        5: (4, 0),   # overflow: pads to itself
    }
    rep = {
        r["len_bucket"]: (r["n_rows"], r["real_tokens"], r["pad_tokens"])
        for r in padding_waste_report(b).collect()
    }
    assert rep[0] == (2, 13, 3)
    assert rep[4] == (1, 100, 0)
    with pytest.raises(ValueError, match="ascending"):
        assign_length_buckets(df, [16, 8])
    # assignment is pure projection: no shuffle
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
