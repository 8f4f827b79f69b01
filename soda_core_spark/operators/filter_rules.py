"""Declarative quality-filter rules — the shared keep/drop contract.

Each rule is (name, SQL fail-condition over signal columns). This table is
THE contract: the Spark pipeline compiles each condition with ``F.expr``
(operators/filter_pipeline.py) and the plain-pandas oracle re-evaluates the
same semantics with independent code (sources/webtext_oracle.py). Keep/drop
F1 ≥ 0.99 between the two is the acceptance criterion (BASELINE.json).

These are soda-style ``failed_rows`` conditions (reference
failed_rows_check.py:47-259: a boolean SQL expression where TRUE == the
row failed) — ``to_contract()`` converts the rule set into a real contract
for the check engine, so scan-level metrics (fail counts/percent per rule)
come from the same machinery as any other soda check.

Thresholds are frozen after empirical calibration on the deterministic
generator (see tests/test_webtext_parity.py); they sit away from the data's
float boundaries so JVM-vs-Python double arithmetic cannot flip a decision.
"""

from __future__ import annotations

from dataclasses import dataclass

from soda_core_spark.plans.model import Contract, contract_from_dict


@dataclass(frozen=True)
class FilterRule:
    name: str
    condition: str  # SQL boolean over input+signal columns; TRUE == drop
    description: str = ""


class InvalidFilterRuleError(ValueError):
    """A rule's condition does not parse or references unknown columns.
    Raised at plan time with the offending rule named — a bad rule must
    fail loudly before any document is processed, never silently drop or
    pass documents (north-rule NOT_EVALUATED discipline)."""


#: signals computed by built-in F.* expressions (functions/text.py)
HEURISTIC_RULES: tuple[FilterRule, ...] = (
    FilterRule("min_chars", "n_chars < 200", "too short (Gopher-style min length)"),
    FilterRule("max_chars", "n_chars > 20000", "absurdly long"),
    FilterRule("min_words", "n_words < 40", "too few words"),
    FilterRule("alnum_ratio", "alnum_ratio < 0.55", "symbol-heavy junk"),
    FilterRule(
        "stopword_density",
        "lang = 'en' AND stopword_density < 0.08",
        "English doc without English function words",
    ),
    FilterRule("repetition", "bigram_repetition > 0.30", "boilerplate repetition"),
    FilterRule(
        "mean_word_length",
        "mean_word_length < 2.0 OR mean_word_length > 14.0",
        "word-length profile outside natural language",
    ),
)

#: rules over model scores (pandas-UDF columns)
MODEL_RULES: tuple[FilterRule, ...] = (
    FilterRule(
        "langid_disagree",
        "langid_pred <> lang AND langid_conf >= 0.15",
        "confident language-ID disagreement with declared lang",
    ),
    FilterRule(
        "perplexity",
        "lang = 'en' AND log_ppl > 4.0",
        "English doc with high n-gram perplexity",
    ),
)

DEFAULT_WEBTEXT_RULES: tuple[FilterRule, ...] = HEURISTIC_RULES + MODEL_RULES


def to_contract(
    rules: tuple[FilterRule, ...] = DEFAULT_WEBTEXT_RULES,
    dataset: str = "web_pages",
    max_fail_percent: float = 100.0,
) -> Contract:
    """Express the rule set as a soda-style contract: one ``failed_rows``
    check per rule (percent metric), so the scan-metrics table mirrors the
    reference's check-result schema for every rule."""
    return contract_from_dict(
        {
            "dataset": dataset,
            "checks": [
                {
                    "failed_rows": {
                        "condition": r.condition,
                        "metric": "percent",
                        "must_be_less_than_or_equal": max_fail_percent,
                        "qualifier": r.name,
                        "name": f"rule_{r.name}",
                    }
                }
                for r in rules
            ]
            + [{"row_count": {"must_be_greater_than": 0}}],
        }
    )


#: extended pack: the round-4 signal families (readability, weighted
#: lexicon) as OPT-IN rules. Deliberately NOT in DEFAULT_WEBTEXT_RULES —
#: the default pack's keep/drop decisions are golden-pinned
#: (tests/fixtures_golden_decisions.json); changing defaults is a data
#: migration, done via rule_pack_diff (q100) + a new golden pin, never a
#: silent edit. Thresholds follow the calibration discipline above:
#: away from the generator's float boundaries.
EXTENDED_SIGNAL_RULES: tuple[FilterRule, ...] = (
    FilterRule(
        "readability_floor",
        "lang = 'en' AND flesch_reading_ease IS NOT NULL "
        "AND flesch_reading_ease < -200.0",
        "unreadable token salad (FRE far below natural-prose range)",
    ),
    FilterRule(
        "lexicon_score",
        "lex_score > 50.0",
        "severity-weighted lexicon density (UT1-tier policy score)",
    ),
)


def with_extended_signals(
    df,
    text_col: str = "text",
    lexicon: dict[str, float] | None = None,
):
    """Attach the EXTENDED_SIGNAL_RULES input columns (readability +
    weighted lexicon) to a frame that already carries the base signals.
    Kept separate from ``with_signals`` so the default pipeline's plan
    (and its golden decisions) are untouched unless a deployment opts
    in."""
    from soda_core_spark.functions.readability import with_readability
    from soda_core_spark.operators.blocklist import lexicon_score

    out = with_readability(df, text_col=text_col)
    return lexicon_score(out, lexicon or {"spam": 5.0}, text_col=text_col)


#: opt-in round-5 web-shell rule pack: drop rules over the soft-error /
#: markup-residue / truncation signals (profiling.py's corpus audits,
#: here as row-level gates). Separate from DEFAULT_WEBTEXT_RULES so the
#: default pipeline's golden decisions are untouched unless a
#: deployment opts in (the EXTENDED_SIGNAL_RULES discipline).
WEBSHELL_SIGNAL_RULES: tuple[FilterRule, ...] = (
    FilterRule(
        "soft_error_shell",
        "is_soft_error",
        "HTTP-200 error/consent/login shell — zero-content page that "
        "passes length and language checks",
    ),
    FilterRule(
        "markup_residue",
        "has_markup_residue",
        "extraction residue: raw tags / unresolved entities / template "
        "braces / literal escapes survived extraction",
    ),
    FilterRule(
        "cap_truncated",
        "is_cap_truncated",
        "text length parked EXACTLY at a round cap and cut mid-sentence "
        "— cap/preview/db-column truncation",
    ),
)


def with_webshell_signals(df, text_col: str = "text"):
    """Attach the WEBSHELL_SIGNAL_RULES input columns — boolean
    ``is_soft_error`` / ``has_markup_residue`` / ``is_cap_truncated`` —
    from the SAME shared constants the q164/q182/q183 corpus audits and
    their SQL oracles use (functions.text.SOFT_ERROR_PHRASES /
    TRUNCATION_CAPS / TERMINAL_PUNCT, profiling.MARKUP_RESIDUE_PATTERNS),
    so the row gate and the corpus report can never disagree. All pure
    codegen column algebra; NULL text is clean on every signal."""
    from pyspark.sql import functions as F

    from soda_core_spark.functions.text import (
        SOFT_ERROR_PHRASES,
        TERMINAL_PUNCT,
        TRUNCATION_CAPS,
    )
    from soda_core_spark.operators.profiling import (
        MARKUP_RESIDUE_PATTERNS,
    )

    t = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(t)
    soft = F.lit(False)
    for p in SOFT_ERROR_PHRASES:
        soft = soft | low.contains(p)
    residue = F.lit(False)
    for pat in MARKUP_RESIDUE_PATTERNS.values():
        residue = residue | t.rlike(pat)
    trimmed = F.regexp_replace(t, "[ \\t\\n\\r]+$", "")
    midsent = (F.length(trimmed) > 0) & ~F.substring(
        trimmed, -1, 1
    ).isin(*list(TERMINAL_PUNCT))
    at_cap = F.length(t).isin(*TRUNCATION_CAPS)
    return (
        df.withColumn("is_soft_error", soft)
        .withColumn("has_markup_residue", residue)
        .withColumn("is_cap_truncated", at_cap & midsent)
    )
