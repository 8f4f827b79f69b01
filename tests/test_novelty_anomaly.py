"""vocabulary_novelty and robust_anomaly_days: python-twin + edge tests."""

import datetime as dt
import random
import statistics

from soda_core_spark.operators.profiling import (
    robust_anomaly_days,
    vocabulary_novelty,
)


# ---------------------------------------------------------------------------
# vocabulary_novelty
# ---------------------------------------------------------------------------


def _novelty_twin(docs):
    """docs: list of (iso_day, text). Returns {day: (distinct, new,
    rate, cum)} matching the operator's contract."""
    per_day = {}
    for day, text in docs:
        per_day.setdefault(day, set()).update(
            w for w in text.lower().split() if w
        )
    seen = set()
    out = {}
    cum = 0
    for day in sorted(per_day):
        toks = per_day[day]
        new = toks - seen
        seen |= toks
        cum += len(new)
        out[day] = (
            len(toks),
            len(new),
            round(len(new) / len(toks), 6),
            cum,
        )
    return out


def _run_novelty(spark, docs):
    df = spark.createDataFrame(
        [(dt.date.fromisoformat(d), t) for d, t in docs], ["day", "text"]
    )
    rows = vocabulary_novelty(df, "day", "text").collect()
    return {
        r["day"]: (
            r["distinct_tokens"],
            r["new_tokens"],
            r["novelty_rate"],
            r["cum_vocab"],
        )
        for r in rows
    }


def test_novelty_basic(spark):
    docs = [
        ("2026-01-01", "the cat sat"),
        ("2026-01-02", "the dog sat"),  # only "dog" is new
        ("2026-01-03", "the cat sat"),  # nothing new
    ]
    got = _run_novelty(spark, docs)
    assert got["2026-01-01"] == (3, 3, 1.0, 3)
    assert got["2026-01-02"] == (3, 1, round(1 / 3, 6), 4)
    assert got["2026-01-03"] == (3, 0, 0.0, 4)


def test_novelty_repeated_token_counts_once(spark):
    docs = [("2026-01-01", "a a a a b")]
    got = _run_novelty(spark, docs)
    assert got["2026-01-01"] == (2, 2, 1.0, 2)


def test_novelty_random_twin(spark):
    rng = random.Random(4242)
    words = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(8):
        day = f"2026-02-{d + 1:02d}"
        for _ in range(rng.randrange(1, 6)):
            docs.append(
                (
                    day,
                    " ".join(
                        rng.choice(words)
                        for _ in range(rng.randrange(1, 12))
                    ),
                )
            )
    got = _run_novelty(spark, docs)
    want = _novelty_twin(docs)
    assert got == want


# ---------------------------------------------------------------------------
# robust_anomaly_days
# ---------------------------------------------------------------------------


def _anomaly_twin(events, threshold=3.5):
    """events: list of (key, iso_day). Returns {(key, day): (n, med,
    mad, z, flag)} with the operator's densification + NULL policy."""
    daily = {}
    for key, day in events:
        daily[(key, day)] = daily.get((key, day), 0) + 1
    keys = sorted({k for k, _ in daily})
    out = {}
    for key in keys:
        days = sorted(d for k, d in daily if k == key)
        d0 = dt.date.fromisoformat(days[0])
        d1 = dt.date.fromisoformat(days[-1])
        cal = [
            (d0 + dt.timedelta(days=i)).isoformat()
            for i in range((d1 - d0).days + 1)
        ]
        ns = {d: daily.get((key, d), 0) for d in cal}
        med = statistics.median([float(n) for n in ns.values()])
        mad = statistics.median([abs(n - med) for n in ns.values()])
        for d in cal:
            n = ns[d]
            if mad > 0:
                z = 0.6745 * (n - med) / mad
                out[(key, d)] = (
                    n,
                    round(med, 6),
                    round(mad, 6),
                    round(z, 6),
                    abs(z) > threshold,
                )
            else:
                out[(key, d)] = (n, round(med, 6), round(mad, 6), None,
                                 float(n) != med)
    return out


def _run_anomaly(spark, events):
    df = spark.createDataFrame(
        [(k, dt.datetime.fromisoformat(d + "T12:00:00")) for k, d in events],
        ["key", "ts"],
    )
    rows = robust_anomaly_days(df, "ts", "key").collect()
    return {
        (r["key"], r["day"]): (
            r["n"],
            r["med"],
            r["mad"],
            r["robust_z"],
            r["is_anomaly"],
        )
        for r in rows
    }


def test_anomaly_spike_flagged_and_silent_day_densified(spark):
    # steady 2/day for 9 days, one 40-event flood, one silent day (gap)
    events = []
    for i in range(9):
        day = f"2026-03-{i + 1:02d}"
        if day == "2026-03-05":
            continue  # silent day — must still be scored via densification
        events += [("hostA", day)] * (40 if day == "2026-03-07" else 2)
    got = _run_anomaly(spark, events)
    want = _anomaly_twin(events)
    assert got == want
    assert got[("hostA", "2026-03-07")][4] is True  # flood flagged
    assert got[("hostA", "2026-03-05")][0] == 0  # silent day present
    assert got[("hostA", "2026-03-05")][4] is True  # and flagged


def test_anomaly_constant_key_mad_zero_policy(spark):
    # constant rate -> MAD = 0 -> z NULL, any deviation flagged exactly
    events = [("k", f"2026-04-{i + 1:02d}") for i in range(6)] + [
        ("k", "2026-04-03")
    ]
    got = _run_anomaly(spark, events)
    want = _anomaly_twin(events)
    assert got == want
    assert got[("k", "2026-04-03")][3] is None
    assert got[("k", "2026-04-03")][4] is True
    assert got[("k", "2026-04-01")][4] is False


def test_anomaly_random_twin(spark):
    rng = random.Random(99)
    events = []
    for key in ("a", "b", "c"):
        base = rng.randrange(1, 30)
        for d in range(12):
            if rng.random() < 0.15:
                continue  # random gaps exercise densification
            n = rng.randrange(1, 6) + (30 if rng.random() < 0.08 else 0)
            events += [(key, f"2026-05-{base + d:02d}")] * n
    got = _run_anomaly(spark, events)
    want = _anomaly_twin(events)
    assert set(got) == set(want)
    for k in want:
        g, w = got[k], want[k]
        assert g[0] == w[0] and g[4] == w[4], k
        for i in (1, 2, 3):
            if w[i] is None:
                assert g[i] is None, k
            else:
                assert abs(g[i] - w[i]) <= 1e-6, k
