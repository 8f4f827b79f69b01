"""classifier_auc + spearman_correlation: brute-force python twins
(ties, NULL exclusion), degenerate-class/constant-signal NULLs, and a
randomized twin sweep."""

import random

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StructField,
    StructType,
)

from soda_core_spark.operators.calibration import classifier_auc
from soda_core_spark.operators.profiling import spearman_correlation

_AUC_SCHEMA = StructType(
    [
        StructField("s", DoubleType(), True),
        StructField("y", BooleanType(), True),
    ]
)


def _auc_twin(pairs):
    """Brute-force Mann-Whitney: mean over all (pos, neg) pairs of
    1/0.5/0 for win/tie/loss."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    num = 0.0
    for p in pos:
        for q in neg:
            num += 1.0 if p > q else (0.5 if p == q else 0.0)
    return round(num / (len(pos) * len(neg)), 6)


def _run_auc(spark, pairs):
    df = spark.createDataFrame(pairs, _AUC_SCHEMA)
    return classifier_auc(df, F.col("s"), F.col("y")).collect()[0]


def test_auc_hand_with_ties(spark):
    pairs = [
        (0.1, False),
        (0.2, True),   # beats one neg, ties nothing
        (0.2, False),  # tie group at 0.2
        (0.9, True),
        (0.9, True),
        (0.9, False),  # 3-way tie at the top
        (0.5, False),
    ]
    r = _run_auc(spark, pairs)
    assert (r["n_pos"], r["n_neg"]) == (3, 4)
    assert r["n_distinct_scores"] == 4
    assert r["auc"] == _auc_twin(pairs)


def test_auc_null_rows_excluded(spark):
    pairs = [(0.9, True), (0.1, False), (None, True), (0.5, None)]
    r = _run_auc(spark, pairs)
    assert (r["n_pos"], r["n_neg"]) == (1, 1)
    assert r["auc"] == 1.0


def test_auc_degenerate_single_class(spark):
    r = _run_auc(spark, [(0.2, True), (0.7, True)])
    assert r["n_neg"] == 0 and r["auc"] is None


def test_auc_perfect_and_inverted(spark):
    perfect = [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
    assert _run_auc(spark, perfect)["auc"] == 1.0
    inverted = [(s, not y) for s, y in perfect]
    assert _run_auc(spark, inverted)["auc"] == 0.0


def test_auc_random_twin(spark):
    rng = random.Random(1337)
    # coarse grid forces heavy ties; mixed NULLs
    pairs = []
    for _ in range(300):
        s = round(rng.randrange(0, 11) / 10.0, 6)
        y = rng.random() < (0.2 + 0.6 * s)
        pairs.append((None if rng.random() < 0.03 else s,
                      None if rng.random() < 0.03 else y))
    r = _run_auc(spark, pairs)
    clean = [(s, y) for s, y in pairs if s is not None and y is not None]
    assert r["auc"] == _auc_twin(clean)


def _rho_twin(xy):
    """Average-rank Spearman via explicit rank tables."""
    def avg_ranks(vals):
        order = sorted(set(vals))
        below, out = 0, {}
        for v in order:
            c = vals.count(v)
            out[v] = below + (c + 1) / 2.0
            below += c
        return [out[v] for v in vals]

    xs = [p[0] for p in xy]
    ys = [p[1] for p in xy]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xy)
    mx, my = sum(rx) / n, sum(ry) / n
    sxy = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    sxx = sum((a - mx) ** 2 for a in rx)
    syy = sum((b - my) ** 2 for b in ry)
    if sxx == 0 or syy == 0:
        return None
    return round(sxy / (sxx * syy) ** 0.5, 6)


def _run_rho(spark, xy):
    schema = StructType(
        [
            StructField("x", DoubleType(), True),
            StructField("y", DoubleType(), True),
        ]
    )
    df = spark.createDataFrame(xy, schema)
    return spearman_correlation(df, "x", "y").collect()[0]


def test_spearman_monotone_is_one(spark):
    xy = [(1.0, 10.0), (2.0, 40.0), (3.0, 90.0), (4.0, 160.0)]
    r = _run_rho(spark, xy)
    assert r["n"] == 4 and r["spearman_rho"] == 1.0
    rev = [(x, -y) for x, y in xy]
    assert _run_rho(spark, rev)["spearman_rho"] == -1.0


def test_spearman_ties_and_nulls(spark):
    xy = [
        (1.0, 5.0),
        (1.0, 7.0),   # tie in x
        (2.0, 7.0),   # tie in y
        (3.0, 2.0),
        (None, 9.0),  # excluded
        (4.0, None),  # excluded
    ]
    r = _run_rho(spark, xy)
    clean = [p for p in xy if p[0] is not None and p[1] is not None]
    assert r["n"] == len(clean)
    assert r["spearman_rho"] == _rho_twin(clean)


def test_spearman_constant_signal_null(spark):
    r = _run_rho(spark, [(1.0, 3.0), (1.0, 7.0), (1.0, 5.0)])
    assert r["spearman_rho"] is None


def test_spearman_random_twin(spark):
    rng = random.Random(4242)
    xy = [
        (float(rng.randrange(0, 20)), float(rng.randrange(0, 20)))
        for _ in range(200)
    ]
    r = _run_rho(spark, xy)
    twin = _rho_twin(xy)
    # both engines fold doubles in different orders; 6-dp twin may sit
    # on a rounding boundary — allow the last printed digit to differ
    assert abs(r["spearman_rho"] - twin) <= 1e-6


# ---------------------------------------------------------------------------
# vocab_divergence
# ---------------------------------------------------------------------------

import math

from soda_core_spark.operators.profiling import vocab_divergence


def _jsd_twin(docs, top_k):
    """Python twin: global top-k vocab + <oov>, pairwise JSD."""
    from collections import Counter

    per = {}
    total = Counter()
    for g, text in docs:
        toks = [w for w in text.lower().split() if w]
        per.setdefault(g, Counter()).update(toks)
        total.update(toks)
    vocab = set(
        t for t, _ in sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[
            :top_k
        ]
    )
    folded = {
        g: Counter(
            {(t if t in vocab else "<oov>"): 0 for t in []}
        )
        for g in per
    }
    for g, cnt in per.items():
        f = Counter()
        for t, c in cnt.items():
            f[t if t in vocab else "<oov>"] += c
        folded[g] = f
    cells = set()
    for f in folded.values():
        cells |= set(f)
    out = {}
    for ga in sorted(folded):
        for gb in sorted(folded):
            if ga >= gb:
                continue
            ta = sum(folded[ga].values())
            tb = sum(folded[gb].values())
            s = 0.0
            for v in cells:
                pa = folded[ga].get(v, 0) / ta
                pb = folded[gb].get(v, 0) / tb
                m = (pa + pb) / 2.0
                if pa > 0:
                    s += pa * math.log(pa / m) / 2.0
                if pb > 0:
                    s += pb * math.log(pb / m) / 2.0
            out[(ga, gb)] = (ta, tb, round(s, 6))
    return out


def _run_jsd(spark, docs, top_k):
    df = spark.createDataFrame(docs, ["source", "text"])
    rows = vocab_divergence(df, "source", "text", top_k=top_k).collect()
    return {
        (r["group_a"], r["group_b"]): (
            r["n_tokens_a"],
            r["n_tokens_b"],
            r["jsd"],
        )
        for r in rows
    }


def test_jsd_identical_sources_zero(spark):
    docs = [("a", "x y z x"), ("b", "x y z x")]
    got = _run_jsd(spark, docs, top_k=10)
    assert got[("a", "b")][2] == 0.0


def test_jsd_disjoint_sources_ln2(spark):
    docs = [("a", "x x y"), ("b", "p q q")]
    got = _run_jsd(spark, docs, top_k=10)
    assert got[("a", "b")][2] == round(math.log(2.0), 6)


def test_jsd_oov_fold_and_twin(spark):
    # top_k=2 forces real <oov> mass; three sources → three pairs
    docs = [
        ("a", "the cat sat on the mat"),
        ("a", "the dog sat"),
        ("b", "the the the cat runs far away"),
        ("c", "zebra quark boson lepton"),
    ]
    got = _run_jsd(spark, docs, top_k=2)
    want = _jsd_twin(docs, top_k=2)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2], k
        assert abs(got[k][2] - want[k][2]) <= 1e-6, k


def test_jsd_random_twin(spark):
    rng = random.Random(777)
    words = [f"w{i}" for i in range(30)]
    docs = []
    for g in ("s0", "s1", "s2"):
        bias = int(g[1]) * 7
        for _ in range(20):
            n = rng.randrange(3, 15)
            docs.append(
                (
                    g,
                    " ".join(
                        words[(rng.randrange(0, 30) + bias) % 30]
                        for _ in range(n)
                    ),
                )
            )
    got = _run_jsd(spark, docs, top_k=10)
    want = _jsd_twin(docs, top_k=10)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2]
        assert abs(got[k][2] - want[k][2]) <= 1e-6
        assert 0.0 <= got[k][2] <= round(math.log(2.0), 6)
