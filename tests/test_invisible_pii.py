"""Invisible-character audit + PII co-occurrence census
(operators/profiling.py invisible_chars / pii_cooccurrence)."""

import pytest


def _by(rows, *keys):
    return {tuple(getattr(r, k) for k in keys): r for r in rows}


def test_invisible_chars_hand_values(spark):
    from soda_core_spark.operators.profiling import invisible_chars

    df = spark.createDataFrame(
        [
            (1, "g", "ab‮cd‮"),  # 2 bidi occurrences, 1 doc
            (2, "g", "plain ascii"),
            (3, "g", None),  # NULL counts as clean
            (4, "h", "x​y­ z w"),
            (5, "h", "a\x01b\x7f"),
        ],
        "doc_id long, source string, text string",
    )
    out = _by(invisible_chars(df).collect(), "group", "class")
    r = out[("g", "bidi_control")]
    assert (r.n_docs, r.n_docs_hit, r.total_occurrences) == (3, 1, 2)
    assert r.doc_rate == pytest.approx(1 / 3, abs=1e-6)
    assert out[("g", "zero_width")].n_docs_hit == 0
    assert out[("h", "zero_width")].total_occurrences == 1
    assert out[("h", "soft_hyphen")].total_occurrences == 1
    assert out[("h", "nbsp_variant")].total_occurrences == 1
    assert out[("h", "c0_control")].total_occurrences == 2
    # every class row exists for every group (inline unpivot)
    assert len(out) == 2 * 5


def test_invisible_chars_rejects_empty_classes(spark):
    from soda_core_spark.operators.profiling import invisible_chars

    df = spark.createDataFrame(
        [(1, "g", "x")], "doc_id long, source string, text string"
    )
    with pytest.raises(ValueError):
        invisible_chars(df, classes={})


def test_pii_cooccurrence_hand_values(spark):
    from soda_core_spark.operators.profiling import pii_cooccurrence

    df = spark.createDataFrame(
        [
            (1, "mail bob@x.io today"),
            (2, "bob@x.io then 123-45-6789 then +1 555 123 4567"),
            (3, "nothing sensitive"),
            (4, None),
            (5, "server 10.1.2.3 and card 4111 1111 1111 1111"),
        ],
        "doc_id long, text string",
    )
    out = {r.pii_types: r for r in pii_cooccurrence(df).collect()}
    assert out["email"].n_types == 1 and out["email"].risk_tier == "low"
    assert out["email"].n_docs == 1
    # combination key follows scrub-rule order: email, ssn, phone
    trio = out["email+ssn+phone"]
    assert trio.n_types == 3 and trio.risk_tier == "high"
    duo = out["ipv4+credit_card"]
    assert duo.n_types == 2 and duo.risk_tier == "medium"
    assert out["none"].n_docs == 2 and out["none"].risk_tier == "none"


def test_pii_cooccurrence_independent_flags_no_masking(spark):
    from soda_core_spark.operators.profiling import pii_cooccurrence

    # the scrubber's ordered chain would eat the SSN before the phone
    # rule ran; the audit must still see BOTH independently when both
    # genuinely match disjoint spans
    df = spark.createDataFrame(
        [(1, "ssn 123-45-6789 phone +12 555 123 4567")],
        "doc_id long, text string",
    )
    out = pii_cooccurrence(df).collect()
    assert len(out) == 1 and out[0].pii_types == "ssn+phone"
