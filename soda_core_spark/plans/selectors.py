"""Check selectors: ``field=value`` expressions that pick which checks of
a contract run.

Behavioural twin of the reference's selector language
(``soda-core/src/soda_core/contracts/impl/check_selector.py:13-186``):

* grouped by field — OR within a field, AND across fields,
* ``*`` / ``?`` wildcards (``[`` is escaped so only those two are magic),
* ``attributes.<key>`` matches free-form check attributes; list-valued
  attributes support member match (``key=value``) and exact-set match
  (``key=[a,b]``, quoted elements allowed),
* a bare value (no ``=``) is shorthand for ``name=<value>`` — a
  convenience this engine adds on top of the reference syntax.
"""

from __future__ import annotations

import fnmatch
from typing import Optional, Union

from soda_core_spark.plans.model import CheckSpec, Contract


class CheckSelectorParseError(Exception):
    pass


SUPPORTED_FIELDS = {
    "type",
    "name",
    "column",
    "path",
    "relative_path",
    "check_path",
    "contract_path",
    "qualifier",
}
ATTRIBUTES_PREFIX = "attributes."


class CheckSelector:
    def __init__(self, field: str, value: str, raw: Optional[str] = None):
        self.field = field
        self.value = value
        self.raw = raw if raw is not None else f"{field}={value}"
        self._selector_list = _parse_list_value(value)

    def __repr__(self) -> str:  # pragma: no cover
        return f"CheckSelector({self.field!r}, {self.value!r})"

    @classmethod
    def parse(cls, expression: str) -> "CheckSelector":
        if "=" not in expression:
            # bare glob → match on the check name
            return cls(field="name", value=expression.strip(), raw=expression)
        field, value = expression.split("=", 1)
        field = field.strip()
        value = value.strip()
        if not field:
            raise CheckSelectorParseError(
                f"Invalid check filter {expression!r}: empty field name"
            )
        if field not in SUPPORTED_FIELDS and not field.startswith(ATTRIBUTES_PREFIX):
            raise CheckSelectorParseError(
                f"Invalid check filter {expression!r}: unknown field {field!r}. "
                f"Supported: {', '.join(sorted(SUPPORTED_FIELDS))}, "
                f"{ATTRIBUTES_PREFIX}<key>"
            )
        return cls(field=field, value=value, raw=expression)

    @classmethod
    def parse_all(
        cls, expressions: Optional[list[Union[str, "CheckSelector"]]]
    ) -> list["CheckSelector"]:
        if not expressions:
            return []
        return [e if isinstance(e, CheckSelector) else cls.parse(e) for e in expressions]

    def matches(self, check: CheckSpec, contract: Contract) -> bool:
        value = self._check_value(check, contract)
        if value is None:
            return False
        if isinstance(value, list):
            if self._selector_list is not None:
                # exact set equality, no wildcards (reference :98-102)
                return set(value) == set(self._selector_list)
            return any(_values_match(item, self.value) for item in value)
        return _values_match(value, self.value)

    def _check_value(
        self, check: CheckSpec, contract: Contract
    ) -> Optional[Union[str, list[str]]]:
        if self.field == "type":
            return check.type
        if self.field == "name":
            return check.default_name()
        if self.field == "column":
            return check.column
        if self.field in ("path", "relative_path"):
            # reference-pure: matches ONLY the check's dotted relative
            # path ("columns.<col>.checks.<type>[.<qualifier>]",
            # contract_verification_impl.py:1156-1171, selected at
            # check_selector.py:113-115). Contract-FILE-path matching
            # lives under the distinct contract_path= field so a file
            # glob like path=*missing* cannot accidentally select every
            # check in a matching contract file.
            return check_relative_path(check)
        if self.field == "contract_path":
            # engine extension: match the contract's source file path
            # (as-given / cwd-relative / absolute forms all participate)
            return _path_variants(contract.source_path)
        if self.field == "check_path":
            # no wire_source/collection prefixing here, so check_path ==
            # relative_path (reference :1198-1211 contract case)
            return check_relative_path(check)
        if self.field == "qualifier":
            return check.qualifier
        if self.field.startswith(ATTRIBUTES_PREFIX):
            attr = check.attributes.get(self.field[len(ATTRIBUTES_PREFIX) :])
            if attr is None:
                return None
            if isinstance(attr, list):
                return [str(x) for x in attr]
            return str(attr)
        return None

    @staticmethod
    def all_match(
        selectors: list["CheckSelector"], check: CheckSpec, contract: Contract
    ) -> bool:
        """AND across fields, OR within a field (reference :172-186)."""
        if not selectors:
            return True
        groups: dict[str, list[CheckSelector]] = {}
        for s in selectors:
            groups.setdefault(s.field, []).append(s)
        return all(
            any(s.matches(check, contract) for s in group)
            for group in groups.values()
        )


def check_relative_path(check: CheckSpec) -> str:
    """The check's dotted position path within the contract — the value
    the reference's ``path=`` selector and ``checkPath`` wire field carry
    (contract_verification_impl.py:1156-1171):
    ``columns.<col>.checks.<type>[.<qualifier>]`` for column checks,
    ``checks.<type>[.<qualifier>]`` for dataset checks."""
    parts: list[str] = []
    if check.column:
        parts += ["columns", check.column]
    parts += ["checks", check.type]
    if check.qualifier:
        parts.append(check.qualifier)
    return ".".join(parts)


def _path_variants(source_path: Optional[str]) -> Optional[list[str]]:
    """Candidate forms of a contract's source path for ``path=`` matching.

    The reference matches the check's *relative* path
    (check_selector.py:115-117); a glob written for relative paths
    (``path=contracts/*.yml``) must therefore also match when the CLI was
    invoked with an absolute path — so both the as-given, the
    cwd-relative, and the absolute form participate in the OR-match."""
    if source_path is None:
        return None
    import os

    variants = [source_path]
    for form in (os.path.relpath(source_path), os.path.abspath(source_path)):
        if form not in variants:
            variants.append(form)
    return variants


def _parse_list_value(value: str) -> Optional[list[str]]:
    """'[a,b]' → ['a','b']; None if not list syntax; quoted elements may
    contain commas/spaces (reference :135-165)."""
    if not (value.startswith("[") and value.endswith("]")):
        return None
    inner = value[1:-1]
    if not inner.strip():
        return []
    items: list[str] = []
    current: list[str] = []
    in_quotes = False
    for ch in inner:
        if ch == '"':
            in_quotes = not in_quotes
        elif ch == "," and not in_quotes:
            items.append("".join(current).strip())
            current = []
        else:
            current.append(ch)
    if in_quotes:
        raise CheckSelectorParseError(
            f"Invalid list syntax in selector value {value!r}: unterminated quote"
        )
    items.append("".join(current).strip())
    if any(item == "" for item in items):
        raise CheckSelectorParseError(
            f"Invalid list syntax in selector value {value!r}: empty elements"
        )
    return items


def _values_match(check_value: str, selector_value: str) -> bool:
    # escape '[' so fnmatch treats it literally — only * and ? are magic
    escaped = selector_value.replace("[", "[[]")
    return fnmatch.fnmatchcase(check_value, escaped)
