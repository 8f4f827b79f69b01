"""Contract / rule model — pure-Python dataclasses, no Spark imports.

Mirrors the *semantics* of the reference's contract language (behavioural
parity, fresh implementation):

* missing/validity config keys: reference
  ``soda-core/src/soda_core/contracts/impl/contract_yaml.py:383-406``
* threshold keys + pass logic: ``contract_yaml.py:714-765`` and
  ``contract_verification_impl.py:1012-1030``
* check registry (9 core types): ``contracts/impl/check_types/check_types.py:14-114``
* variable resolution ``${var}``: ``contract_yaml.py:88-245``

Contracts can be built from Python dicts or YAML text with the same shape
as the reference's contract files::

    dataset: web_pages
    filter: "lang = 'en'"
    columns:
      - name: text
        missing_values: ['']
        checks:
          - missing:
              metric: percent
              must_be_less_than: 5
    checks:
      - row_count:
          must_be_greater_than: 0
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional


class ContractParseError(Exception):
    pass


# ---------------------------------------------------------------------------
# Thresholds
# ---------------------------------------------------------------------------

THRESHOLD_KEYS = (
    "must_be",
    "must_not_be",
    "must_be_greater_than",
    "must_be_greater_than_or_equal",
    "must_be_less_than",
    "must_be_less_than_or_equal",
    "must_be_between",
    "must_be_not_between",
)


@dataclass(frozen=True)
class Threshold:
    """Numeric threshold on a metric value.

    Pass logic mirrors reference ``contract_verification_impl.py:1012-1030``:
    every configured comparator must hold; ``must_be_between`` is an
    inclusive inner range; ``must_be_not_between`` an (exclusive-inside)
    outer range.
    """

    must_be: Optional[float] = None
    must_not_be: Optional[float] = None
    must_be_greater_than: Optional[float] = None
    must_be_greater_than_or_equal: Optional[float] = None
    must_be_less_than: Optional[float] = None
    must_be_less_than_or_equal: Optional[float] = None
    must_be_between: Optional[tuple[float, float]] = None
    must_be_not_between: Optional[tuple[float, float]] = None

    def is_configured(self) -> bool:
        return any(
            getattr(self, k) is not None for k in THRESHOLD_KEYS
        )

    def passes(self, value: Any) -> bool:
        if value is None:
            return False
        v = float(value)
        if self.must_be is not None and not v == float(self.must_be):
            return False
        if self.must_not_be is not None and v == float(self.must_not_be):
            return False
        if self.must_be_greater_than is not None and not v > self.must_be_greater_than:
            return False
        if (
            self.must_be_greater_than_or_equal is not None
            and not v >= self.must_be_greater_than_or_equal
        ):
            return False
        if self.must_be_less_than is not None and not v < self.must_be_less_than:
            return False
        if (
            self.must_be_less_than_or_equal is not None
            and not v <= self.must_be_less_than_or_equal
        ):
            return False
        if self.must_be_between is not None:
            lo, hi = self.must_be_between
            if not (lo <= v <= hi):
                return False
        if self.must_be_not_between is not None:
            lo, hi = self.must_be_not_between
            if lo < v < hi:
                return False
        return True

    def describe(self) -> str:
        parts = []
        for k in THRESHOLD_KEYS:
            val = getattr(self, k)
            if val is not None:
                parts.append(f"{k} {val}")
        return " and ".join(parts) if parts else "no threshold"

    @staticmethod
    def from_dict(d: dict) -> "Threshold":
        kwargs: dict[str, Any] = {}
        for k in THRESHOLD_KEYS:
            if k in d and d[k] is not None:
                val = d[k]
                if k in ("must_be_between", "must_be_not_between"):
                    if not (isinstance(val, (list, tuple)) and len(val) == 2):
                        raise ContractParseError(
                            f"{k} must be a two-element list, got {val!r}"
                        )
                    kwargs[k] = (float(val[0]), float(val[1]))
                else:
                    kwargs[k] = float(val)
        return Threshold(**kwargs)


# ---------------------------------------------------------------------------
# Missing / validity configuration
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MissingConfig:
    """``is_missing`` = NULL OR value IN missing_values OR value matches
    missing_format — reference ``contract_verification_impl.py:715-722``."""

    missing_values: Optional[tuple] = None
    missing_format: Optional[str] = None  # regex

    def is_configured(self) -> bool:
        return self.missing_values is not None or self.missing_format is not None

    @staticmethod
    def from_dict(d: dict) -> "MissingConfig":
        mv = d.get("missing_values")
        return MissingConfig(
            missing_values=tuple(mv) if mv is not None else None,
            missing_format=d.get("missing_format"),
        )


@dataclass(frozen=True)
class ValidityConfig:
    """``is_invalid`` = NOT missing AND (any configured validity rule fails)
    — full disjunction, reference ``contract_verification_impl.py:724-764``.
    An explicitly-empty ``valid_values`` list means *everything* is invalid
    (reference :732-738).
    """

    valid_values: Optional[tuple] = None
    invalid_values: Optional[tuple] = None
    valid_format: Optional[str] = None  # regex the value MUST match
    invalid_format: Optional[str] = None  # regex the value must NOT match
    valid_min: Optional[float] = None
    valid_max: Optional[float] = None
    valid_min_length: Optional[int] = None
    valid_max_length: Optional[int] = None
    valid_length: Optional[int] = None
    # reference-data validity: value must exist in another dataset's column
    # (reference invalidity_check.py:199-349)
    valid_reference_dataset: Optional[str] = None
    valid_reference_column: Optional[str] = None

    def is_configured(self) -> bool:
        return any(
            getattr(self, f.name) is not None
            for f in self.__dataclass_fields__.values()  # type: ignore[attr-defined]
        )

    def has_reference(self) -> bool:
        return self.valid_reference_dataset is not None

    @staticmethod
    def from_dict(d: dict) -> "ValidityConfig":
        ref = d.get("valid_reference_data") or {}
        vv = d.get("valid_values")
        iv = d.get("invalid_values")
        return ValidityConfig(
            valid_values=tuple(vv) if vv is not None else None,
            invalid_values=tuple(iv) if iv is not None else None,
            valid_format=d.get("valid_format"),
            invalid_format=d.get("invalid_format"),
            valid_min=d.get("valid_min"),
            valid_max=d.get("valid_max"),
            valid_min_length=d.get("valid_min_length"),
            valid_max_length=d.get("valid_max_length"),
            valid_length=d.get("valid_length"),
            valid_reference_dataset=ref.get("dataset"),
            valid_reference_column=ref.get("column"),
        )


MISSING_KEYS = ("missing_values", "missing_format")
VALIDITY_KEYS = (
    "valid_values",
    "invalid_values",
    "valid_format",
    "invalid_format",
    "valid_min",
    "valid_max",
    "valid_min_length",
    "valid_max_length",
    "valid_length",
    "valid_reference_data",
)


# ---------------------------------------------------------------------------
# Checks
# ---------------------------------------------------------------------------

CHECK_TYPES = (
    "schema",
    "row_count",
    "missing",
    "invalid",
    "duplicate",
    "freshness",
    "aggregate",
    "metric",
    "failed_rows",
)

#: extension registry: custom check types accepted by the YAML parser
#: (reference ``CheckYaml.register``, contract_yaml.py:619-628). Maps
#: type name → parser callable ``(type_name, body, column) -> CheckSpec``
#: or None for the generic CheckSpec parsing (threshold keys, filter,
#: qualifier, attributes — enough for most custom checks). Register
#: through ``soda_core_spark.register_check_type`` so the planner side
#: (reference ``CheckImpl.register``) stays in sync.
CUSTOM_CHECK_PARSERS: dict = {}


@dataclass
class CheckSpec:
    """One check — the engine's unit of evaluation.

    ``type`` is one of CHECK_TYPES (reference check registry
    ``check_types.py:14-114``). Column-level checks carry ``column``;
    dataset-level checks (row_count, freshness, metric, failed_rows,
    schema, multi-column duplicate) may not.
    """

    type: str
    column: Optional[str] = None
    #: inherited from the parent ColumnSpec: SQL expression the check
    #: evaluates instead of F.col(column) (reference column_expression)
    column_expression: Optional[str] = None
    columns: Optional[tuple[str, ...]] = None  # multi-column duplicate
    threshold: Threshold = field(default_factory=Threshold)
    level: str = "fail"  # fail | warn  (contract_yaml.py:714-765)
    filter: Optional[str] = None  # SQL boolean expression (check-scoped)
    qualifier: Optional[str] = None
    name: Optional[str] = None
    metric: str = "count"  # count | percent (missing/invalid/duplicate/failed_rows)
    missing: MissingConfig = field(default_factory=MissingConfig)
    validity: ValidityConfig = field(default_factory=ValidityConfig)
    # aggregate check (aggregate_check.py:42-153)
    function: Optional[str] = None  # avg|sum|min|max|avg_length|min_length|max_length
    # metric check (metric_check.py)
    expression: Optional[str] = None  # SQL aggregate expression
    query: Optional[str] = None  # full SQL query (first cell of first row)
    # freshness check (freshness_check.py:46-276)
    unit: str = "minute"  # second|minute|hour|day
    # failed_rows expression check (failed_rows_check.py:47-259)
    condition: Optional[str] = None  # SQL boolean: TRUE == row failed
    # failed_rows custom denominator / key-extraction forms
    # (failed_rows_check.py:81-128, 314-391)
    rows_tested_query: Optional[str] = None  # first cell = rows-tested denominator
    keys_query: Optional[str] = None  # rows = failing keys (counted; keys sunk as diagnostics)
    # free-form check attributes, matchable by selectors
    # (check_selector.py:122-129; contract_yaml attributes passthrough)
    attributes: dict = field(default_factory=dict)
    # duplicate check: approx=True swaps exact COUNT DISTINCT for an HLL
    # sketch (approx_count_distinct) — the 10^12-row scale path the
    # reference lacks (SURVEY §2.2); exact remains the default for parity
    approx: bool = False
    # schema check
    allow_extra_columns: bool = False
    allow_other_column_order: bool = True

    def default_name(self) -> str:
        base = self.name or self.type
        if self.column:
            return f"{base}({self.column})"
        if self.columns:
            return f"{base}({','.join(self.columns)})"
        return base


@dataclass
class ColumnSpec:
    name: str
    data_type: Optional[str] = None
    #: declared primary-key membership (reference ColumnMetadata.
    #: is_primary_key, metadata_types.py:88-97 — "False both for non-key
    #: columns and for data sources that don't introspect primary keys").
    #: Spark mapping: compared by the schema check against the table's
    #: Iceberg identifier fields when introspectable; a documented no-op
    #: on parquet/views, which have no key concept.
    is_primary_key: bool = False
    character_maximum_length: Optional[int] = None
    numeric_precision: Optional[int] = None
    numeric_scale: Optional[int] = None
    #: computed-column support (reference contract_yaml.py:493-495): when
    #: set, every check on this column runs over this SQL expression
    #: instead of the physical column (contract_verification_impl.py:
    #: 656-675 feeds it into is_missing_expr/is_invalid_expr :715-722)
    column_expression: Optional[str] = None
    missing: MissingConfig = field(default_factory=MissingConfig)
    validity: ValidityConfig = field(default_factory=ValidityConfig)
    checks: list[CheckSpec] = field(default_factory=list)


@dataclass(frozen=True)
class SampleConfig:
    """Dataset-level row sampling applied to the filtered dataset before
    ALL metrics (reference check_collections/base.py:595-605 attaches
    SAMPLE to the filtered CTE; sampler types metadata_types.py:136-140:
    absolute_limit | percentage)."""

    percent: Optional[float] = None  # percentage sampler
    limit: Optional[int] = None  # absolute_limit sampler
    seed: int = 42  # pinned for within-engine reproducibility

    def is_configured(self) -> bool:
        return self.percent is not None or self.limit is not None

    @staticmethod
    def from_dict(d: Optional[dict]) -> "SampleConfig":
        if not d:
            return SampleConfig()
        if d.get("percent") is not None and d.get("limit") is not None:
            raise ContractParseError("sample: give either 'percent' or 'limit', not both")
        pct = d.get("percent")
        if pct is not None and not (0 < float(pct) <= 100):
            raise ContractParseError(f"sample.percent must be in (0, 100], got {pct}")
        lim = d.get("limit")
        if lim is not None and int(lim) <= 0:
            raise ContractParseError(f"sample.limit must be positive, got {lim}")
        return SampleConfig(
            percent=float(pct) if pct is not None else None,
            limit=int(lim) if lim is not None else None,
            seed=int(d.get("seed", 42)),
        )


@dataclass(frozen=True)
class DatasetIdentifier:
    """Parsed ``dataset:`` line. The reference's qualified form is
    ``data_source/prefix…/dataset`` ('/'-separated,
    dataset_identifier.py:23-37; consumed at base.py:535-537). In Spark
    the session IS the data source, so the prefixes map onto the catalog
    namespace tiers (``catalog.database``) and ``spark_name`` is what
    ``spark.table`` resolves. A plain (slash-free) ``dataset:`` — possibly
    already dotted — stays opaque: ``data_source_name`` is None and
    ``spark_name`` is the string as given."""

    data_source_name: Optional[str]
    prefixes: tuple[str, ...]
    dataset_name: str
    raw: str

    @classmethod
    def parse(cls, qualified_name: str) -> "DatasetIdentifier":
        if "/" not in qualified_name:
            return cls(None, (), qualified_name, qualified_name)
        parts = qualified_name.split("/")
        if len(parts) < 2 or any(not p.strip() for p in parts):
            raise ContractParseError(
                f"dataset {qualified_name!r}: a '/'-qualified dataset name "
                "needs at least data_source/dataset with no empty segments "
                "(reference dataset_identifier.py:23-37)"
            )
        return cls(
            data_source_name=parts[0],
            prefixes=tuple(parts[1:-1]),
            dataset_name=parts[-1],
            raw=qualified_name,
        )

    def to_string(self) -> str:
        if self.data_source_name is None:
            return self.raw
        return "/".join([self.data_source_name, *self.prefixes, self.dataset_name])

    @property
    def spark_name(self) -> str:
        """Catalog path for ``spark.table``: prefixes + dataset dotted."""
        return ".".join([*self.prefixes, self.dataset_name])


@dataclass
class Contract:
    dataset: str
    filter: Optional[str] = None  # SQL boolean expression over the dataset
    columns: list[ColumnSpec] = field(default_factory=list)
    checks: list[CheckSpec] = field(default_factory=list)
    variables: dict[str, str] = field(default_factory=dict)
    sample: SampleConfig = field(default_factory=SampleConfig)
    # where this contract was loaded from (None for inline contracts);
    # matched by 'path' check selectors (check_selector.py:115-117)
    source_path: Optional[str] = None

    @property
    def dataset_identifier(self) -> DatasetIdentifier:
        """Parsed dataset id (reference parses it at construction,
        base.py:535-537); the full qualified string — prefixes included —
        is what check identities hash over."""
        return DatasetIdentifier.parse(self.dataset)

    def all_checks(self) -> list[CheckSpec]:
        """Checks in contract order: dataset-level first, then per column
        (reference orders checks as declared in YAML, base.py:620-629)."""
        out = list(self.checks)
        for col in self.columns:
            out.extend(col.checks)
        return out

    def column_spec(self, name: str) -> Optional[ColumnSpec]:
        for c in self.columns:
            if c.name == name:
                return c
        return None


# ---------------------------------------------------------------------------
# Parsing (dict / YAML)
# ---------------------------------------------------------------------------

_VAR_RE = re.compile(r"\$\{\s*([A-Za-z0-9_.]+)\s*\}")


def resolve_variables(text: str, variables: dict[str, str]) -> str:
    """``${var}`` substitution with a circular-reference guard
    (reference contract_yaml.py:88-245)."""
    seen: set[str] = set()

    def sub_once(s: str) -> str:
        def repl(m: re.Match) -> str:
            key = m.group(1)
            if key in seen:
                raise ContractParseError(f"circular variable reference: {key}")
            if key not in variables:
                raise ContractParseError(f"unknown variable: {key}")
            seen.add(key)
            return str(variables[key])

        return _VAR_RE.sub(repl, s)

    prev = text
    for _ in range(10):
        cur = sub_once(prev)
        if cur == prev:
            return cur
        prev = cur
    raise ContractParseError("variable resolution did not converge")


def _parse_check(
    type_name: str,
    body: Any,
    column: Optional[ColumnSpec] = None,
) -> CheckSpec:
    if body is None:
        body = {}
    if not isinstance(body, dict):
        raise ContractParseError(f"check body for {type_name!r} must be a mapping")
    # custom parser dispatch comes FIRST so register_check_type(...,
    # replace=True) can override a built-in type's parsing too (reference
    # registries allow re-registration); a registered-but-parserless
    # custom type falls through to the generic CheckSpec parsing
    custom_parser = CUSTOM_CHECK_PARSERS.get(type_name)
    if custom_parser is not None:
        spec = custom_parser(type_name, body, column)
        if not isinstance(spec, CheckSpec):
            raise ContractParseError(
                f"custom parser for {type_name!r} must return a CheckSpec"
            )
        return spec
    if type_name not in CHECK_TYPES and type_name not in CUSTOM_CHECK_PARSERS:
        raise ContractParseError(
            f"unknown check type {type_name!r}; expected one of "
            f"{CHECK_TYPES + tuple(CUSTOM_CHECK_PARSERS)}"
        )

    threshold = Threshold.from_dict(body)
    # defaults mirror the reference:
    #   row_count: must_be_greater_than 0      (row_count_check.py:49-52)
    #   missing / invalid / duplicate: must_be 0 (missing_check.py:51-55)
    if not threshold.is_configured():
        if type_name == "row_count":
            threshold = Threshold(must_be_greater_than=0)
        elif type_name in ("missing", "invalid", "duplicate", "failed_rows"):
            threshold = Threshold(must_be=0)

    missing = MissingConfig.from_dict(body)
    validity = ValidityConfig.from_dict(body)
    # column-level missing/validity defaults are inherited by checks that
    # don't override them (reference contract_verification_impl.py:777-800)
    if column is not None:
        if not missing.is_configured():
            missing = column.missing
        if not validity.is_configured():
            validity = column.validity

    cols = body.get("columns")
    # check-level column_expression overrides the column-level one
    # (reference CheckImpl.column_expression,
    # contract_verification_impl.py:1136-1141)
    check_ce = (body.get("column_expression") or "").strip() or None
    spec = CheckSpec(
        type=type_name,
        column=column.name if column is not None else body.get("column"),
        column_expression=check_ce
        or (column.column_expression if column is not None else None),
        columns=tuple(cols) if cols else None,
        threshold=threshold,
        level=body.get("level", "fail"),
        filter=body.get("filter"),
        qualifier=body.get("qualifier"),
        name=body.get("name"),
        metric=body.get("metric", "count"),
        missing=missing,
        validity=validity,
        function=body.get("function"),
        expression=body.get("expression"),
        query=body.get("query"),
        unit=body.get("unit", "minute"),
        condition=body.get("condition") or body.get("expression")
        if type_name == "failed_rows"
        else body.get("condition"),
        rows_tested_query=body.get("rows_tested_query"),
        keys_query=body.get("keys_query"),
        attributes=dict(body.get("attributes") or {}),
        allow_extra_columns=bool(body.get("allow_extra_columns", False)),
        allow_other_column_order=bool(body.get("allow_other_column_order", True)),
        approx=bool(body.get("approx", False)),
    )
    if type_name == "failed_rows":
        forms = [f for f in (spec.condition, spec.query, spec.keys_query) if f]
        if len(forms) > 1:
            raise ContractParseError(
                "failed_rows check takes exactly one of 'condition'/"
                "'expression', 'query', or 'keys_query'"
            )
    if type_name == "freshness" and spec.column is None:
        raise ContractParseError("freshness check requires a column")
    if type_name == "aggregate" and not spec.function:
        raise ContractParseError("aggregate check requires 'function'")
    return spec


def _parse_checks_list(raw: Any, column: Optional[ColumnSpec] = None) -> list[CheckSpec]:
    checks: list[CheckSpec] = []
    if raw is None:
        return checks
    if not isinstance(raw, list):
        raise ContractParseError("'checks' must be a list")
    for item in raw:
        if isinstance(item, str):
            checks.append(_parse_check(item, {}, column))
        elif isinstance(item, dict):
            if len(item) != 1:
                raise ContractParseError(
                    f"each check must be a single-key mapping, got {list(item)}"
                )
            ((type_name, body),) = item.items()
            checks.append(_parse_check(type_name, body, column))
        else:
            raise ContractParseError(f"bad check entry: {item!r}")
    return checks


def contract_from_dict(d: dict) -> Contract:
    if "dataset" not in d:
        raise ContractParseError("contract requires 'dataset'")
    variables = {str(k): str(v) for k, v in (d.get("variables") or {}).items()}
    columns: list[ColumnSpec] = []
    for col_raw in d.get("columns") or []:
        if not isinstance(col_raw, dict) or "name" not in col_raw:
            raise ContractParseError(f"bad column entry: {col_raw!r}")
        col = ColumnSpec(
            name=col_raw["name"],
            data_type=col_raw.get("data_type"),
            character_maximum_length=col_raw.get("character_maximum_length"),
            numeric_precision=col_raw.get("numeric_precision"),
            numeric_scale=col_raw.get("numeric_scale"),
            column_expression=(col_raw.get("column_expression") or "").strip() or None,
            is_primary_key=bool(col_raw.get("primary_key", False)),
            missing=MissingConfig.from_dict(col_raw),
            validity=ValidityConfig.from_dict(col_raw),
        )
        col.checks = _parse_checks_list(col_raw.get("checks"), col)
        columns.append(col)
    return Contract(
        dataset=str(d["dataset"]),
        filter=d.get("filter"),
        columns=columns,
        checks=_parse_checks_list(d.get("checks")),
        variables=variables,
        sample=SampleConfig.from_dict(d.get("sample")),
        source_path=d.get("source_path"),
    )


def contract_from_yaml(
    text: str,
    variables: Optional[dict[str, str]] = None,
    data_timestamp: Optional[Any] = None,
) -> Contract:
    import yaml

    merged_vars = dict(variables or {})
    # built-in variables NOW / DATA_TIMESTAMP (reference contract_yaml.py:
    # 88-245); injectable for determinism, else stamped at parse time UTC
    if "${NOW}" in text or "${DATA_TIMESTAMP}" in text:
        from datetime import datetime, timezone

        now = (
            data_timestamp.isoformat()
            if data_timestamp is not None
            else datetime.now(timezone.utc).isoformat()
        )
        merged_vars.setdefault("NOW", now)
        merged_vars.setdefault("DATA_TIMESTAMP", now)
    # first parse to pick up declared variables, then resolve ${...} and re-parse
    raw = yaml.safe_load(text)
    if isinstance(raw, dict) and raw.get("variables"):
        for k, v in raw["variables"].items():
            merged_vars.setdefault(str(k), str(v))
    if merged_vars and _VAR_RE.search(text):
        text = resolve_variables(text, merged_vars)
        raw = yaml.safe_load(text)
    if not isinstance(raw, dict):
        raise ContractParseError("contract YAML must be a mapping")
    raw.setdefault("variables", {})
    raw["variables"] = {**merged_vars, **(raw["variables"] or {})}
    return contract_from_dict(raw)


def contract_from_yaml_file(
    path: str,
    variables: Optional[dict[str, str]] = None,
    data_timestamp: Optional[Any] = None,
) -> Contract:
    """Load a contract from a YAML file, recording ``source_path`` so
    ``path=`` check selectors can match it (reference resolves checks'
    relative_path from the contract file, check_selector.py:115-117)."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    contract = contract_from_yaml(text, variables, data_timestamp)
    contract.source_path = path
    return contract
