"""Python-oracle tests for mojibake detection + repair
(functions/mojibake.py). DuckDB has no Latin-1 codec, so the repair is
pinned here against Python's own encode/decode round trip (the same
python-oracle pattern as the compression-ratio signal)."""

from __future__ import annotations

import pyspark.sql.functions as F

from soda_core_spark.functions.mojibake import (
    mojibake_signals,
    repair_mojibake,
)

CLEAN_SAMPLES = [
    "été déjà — «naïve» “quoted”…",
    "L'élève a préféré the café's crème brûlée.",
    "Größe straße — “Ärger” und ‘Öl’…",
    "João não falou português à noite.",
]


def _repair(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [
        r["r"]
        for r in df.select(repair_mojibake(F.col("t")).alias("r")).collect()
    ]


def test_repairs_latin1_mojibake(spark):
    moj = [s.encode("utf-8").decode("latin-1") for s in CLEAN_SAMPLES]
    assert _repair(spark, moj) == CLEAN_SAMPLES


def test_repairs_cp1252_mojibake(spark):
    # only cp1252-decodable sources (no UTF-8 byte hits the five
    # undefined cp1252 slots; U+201D's 0x9D excludes samples 0 and 2)
    safe = [CLEAN_SAMPLES[1], CLEAN_SAMPLES[3],
            "‘Öl’ und — dashes… “open only"]
    moj = [s.encode("utf-8").decode("cp1252") for s in safe]
    assert _repair(spark, moj) == safe


def test_clean_text_passes_through_byte_identical(spark):
    texts = CLEAN_SAMPLES + [
        "Hello, plain ASCII world.",
        "Mixed clean accents: café naïve — no artifacts here.",
    ]
    assert _repair(spark, texts) == texts


def test_non_latin1_text_never_touched(spark):
    # artifacts present AND CJK present: the Latin-1 byte reversal is
    # impossible, so the guard must refuse to repair
    t = "Ã© Ã© Ã© Ã© 中文テキスト Ã©"
    assert _repair(spark, [t]) == [t]


def test_null_stays_null(spark):
    df = spark.createDataFrame([(None,)], "t string")
    assert df.select(repair_mojibake(F.col("t")).alias("r")).first()[
        "r"
    ] is None


def test_double_encoded_needs_two_passes(spark):
    # double mojibake repairs one layer per pass (same as ftfy's loop)
    s = CLEAN_SAMPLES[0]
    double = (
        s.encode("utf-8").decode("latin-1")
        .encode("utf-8").decode("latin-1")
    )
    once = _repair(spark, [double])
    assert once == [s.encode("utf-8").decode("latin-1")]
    assert _repair(spark, once) == [s]


def test_signal_hand_values(spark):
    df = spark.createDataFrame(
        [("abÃ©cÃ©: Â« quoted Â» â€” end",)], "t string"
    )
    row = df.select(
        *(
            e.alias(n)
            for n, e in mojibake_signals(F.col("t")).items()
        )
    ).first()
    # Ã x2 + Â x2 + â€ x1
    assert row["n_artifacts"] == 5
    assert row["is_mojibake"] is True


def test_signal_clean_zero(spark):
    df = spark.createDataFrame([("no artifacts at all",), (None,)], "t string")
    rows = df.select(
        *(
            e.alias(n)
            for n, e in mojibake_signals(F.col("t")).items()
        )
    ).collect()
    for r in rows:
        assert r["n_artifacts"] == 0
        assert r["mojibake_ratio"] == 0.0
        assert r["is_mojibake"] is False


def test_plan_is_pure_projection(spark):
    df = spark.createDataFrame([("x",)], "t string")
    out = df.select(repair_mojibake(F.col("t")).alias("r"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_seeded_fuzz_repair_matches_python_twin(spark):
    """300 seeded-random texts (clean / Latin-1 mojibake / cp1252
    mojibake / undecodable junk) through the JVM repair Column vs an
    independent pure-python twin of the same chain — one Spark job."""
    import random

    from pyspark.sql import functions as F

    from soda_core_spark.functions.mojibake import (
        CP1252_CONTROLS,
        CP1252_VISIBLE,
        mojibake_signals,
        repair_mojibake,
    )

    fold = str.maketrans(CP1252_VISIBLE, CP1252_CONTROLS)

    def detected_py(t):
        n = t.count("Ã") + t.count("Â") + t.count("â€")
        nc = len(t)
        ratio = round(n / nc, 6) if nc else 0.0
        return n >= 2 and ratio > 0.005

    def repair_py(t):
        if t is None or not detected_py(t):
            return t
        folded = t.translate(fold)
        if any(ord(c) > 0xFF for c in folded):
            return t
        try:
            return folded.encode("latin-1").decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            return t

    rng = random.Random(42)
    accents = "éàüñ«»’—…"
    words = ["alpha", "beta", "café", "naïve", "x"]
    rows = []
    for i in range(300):
        clean = " ".join(rng.choice(words) for _ in range(rng.randint(1, 8)))
        clean += "".join(rng.choice(accents) for _ in range(rng.randint(0, 4)))
        kind = i % 4
        if kind == 0:
            t = clean
        elif kind == 1:
            t = clean.encode("utf-8").decode("latin-1")
        elif kind == 2:
            t = clean.encode("utf-8").decode("cp1252", errors="replace")
            t = t.replace("�", "?")  # keep inputs FFFD-free
        else:
            t = "ÃÃ " + clean  # artifacts but broken sequence
        rows.append((i, t))
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {
        r["i"]: r["rep"]
        for r in df.select(
            "i", repair_mojibake(F.col("t")).alias("rep")
        ).collect()
    }
    for i, t in rows:
        assert got[i] == repair_py(t), (i, repr(t), repr(got[i]))
    # and detection parity on the same corpus
    flags = {
        r["i"]: r["f"]
        for r in df.select(
            "i", mojibake_signals(F.col("t"))["is_mojibake"].alias("f")
        ).collect()
    }
    for i, t in rows:
        assert flags[i] == detected_py(t), (i, repr(t))
