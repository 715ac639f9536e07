"""Rule schema model + INI parser (SURVEY §2.1 S7, §1.2).

The reference declares per-dataset validation schemas in INI files with
one ``[field.path]`` section per rule (reference: odevalidator/validator.py:262-292,
odevalidator/config_2.ini). This module parses the same INI dialect into
a plain dataclass list — the input to the rule compiler
(operators/validation.py), which turns rules into native Column
expressions instead of the reference's per-row interpreter.

Semantics replicated from the reference:

* ``_settings`` section: DataType (json|csv), Sequential, HasHeader
  (validator.py:275-284).
* ``ExtendedInterpolation`` (``${Values}`` backrefs, validator.py:264).
* Typed constraints: UpperLimit/LowerLimit (Decimal), Values (JSON
  list), Choices (JSON list), EqualsValue (JSON conditions object),
  EarliestTime/LatestTime (ISO or ``NOW``, second-truncated at parse
  per validator.py:64,73), DateFormat, AllowEmpty (validator.py:42-80).
* ``NOW`` is frozen once at parse time (validator.py:70) — the caller
  passes ``now`` for determinism.
* Sections whose path contains ``.list`` are list rules, expanded per
  element at validation time (validator.py:289-290, 304-378).
"""

from __future__ import annotations

import json
from configparser import ConfigParser, ExtendedInterpolation
from dataclasses import dataclass, field as dc_field
from datetime import datetime, timezone
from decimal import Decimal

TYPE_DECIMAL = "decimal"
TYPE_ENUM = "enum"
TYPE_CHOICE = "choice"
TYPE_TIMESTAMP = "timestamp"
TYPE_STRING = "string"
TYPE_SERIAL = "serial"  # declared in config_2.ini:92; validates presence only


@dataclass
class Rule:
    path: str
    type: str
    upper_limit: Decimal | None = None
    lower_limit: Decimal | None = None
    values: list[str] | None = None
    choices: list[str] | None = None
    conditions: list[dict] | None = None  # EqualsValue {"conditions": [...]}
    earliest_time: datetime | None = None
    latest_time: datetime | None = None
    date_format: str | None = None
    allow_empty: bool = False
    # a bare scalar EqualsValue (e.g. ``= 6``) makes the reference's
    # _check_value return None → the rule always passes, skipping even
    # presence checks (validator.py:99, 129)
    noop: bool = False

    @property
    def is_list(self) -> bool:
        # substring classification, matching the reference's
        # ``key.count('.list')`` routing (validator.py:290, 307); the
        # EXPANDER then only treats whole segments equal to ``list`` as
        # markers, so a mis-binned ``a.list2.b`` still validates as an
        # ordinary path
        return ".list" in self.path


@dataclass
class RuleSet:
    rules: list[Rule]
    data_type: str = "json"
    sequential: bool = False
    has_header: bool = False
    now: datetime | None = None
    # list-rule sections kept separate: expanded per-element at plan time
    list_rules: list[Rule] = dc_field(default_factory=list)

    @property
    def scalar_rules(self) -> list[Rule]:
        return self.rules


def _parse_time(raw: str, now: datetime) -> datetime:
    if raw == "NOW":
        # reference keeps NOW un-truncated (validator.py:70); frozen per run
        return now
    # lenient-ish ISO parse, second-truncated like validator.py:64,73
    ts = datetime.fromisoformat(raw.replace("Z", "+00:00"))
    return ts.replace(microsecond=0)


def parse_rules_ini(text: str, now: datetime | None = None) -> RuleSet:
    """Parse the reference INI rule dialect into a RuleSet."""
    now = now or datetime.now(timezone.utc)
    cp = ConfigParser(interpolation=ExtendedInterpolation())
    cp.read_string(text)

    if not cp.has_section("_settings"):
        raise ValueError("Invalid config ini file, '_settings' field not defined.")
    data_type = cp.get("_settings", "DataType")
    sequential = cp.getboolean("_settings", "Sequential")
    has_header = (
        cp.getboolean("_settings", "HasHeader") if data_type == "csv" else False
    )

    rules: list[Rule] = []
    list_rules: list[Rule] = []
    for section in cp.sections():
        if section == "_settings":
            continue
        sec = cp[section]
        rtype = sec.get("Type")
        if not rtype:
            raise ValueError(
                f"Missing required configuration property 'Type' for field {section}"
            )
        conditions = None
        noop = False
        equals_value = sec.get("EqualsValue")
        if equals_value is not None:
            parsed = json.loads(equals_value)
            if isinstance(parsed, dict) and "conditions" in parsed:
                conditions = parsed["conditions"]
            elif not isinstance(parsed, (dict, list, str)):
                # scalar EqualsValue → whole rule is a no-op (always
                # valid): validator.py:99 requires an Iterable, returns
                # None otherwise, and validate() treats None as pass
                noop = True
        rule = Rule(
            path=section,
            type=rtype,
            upper_limit=Decimal(sec["UpperLimit"]) if sec.get("UpperLimit") else None,
            lower_limit=Decimal(sec["LowerLimit"]) if sec.get("LowerLimit") else None,
            values=json.loads(sec["Values"]) if sec.get("Values") else None,
            choices=json.loads(sec["Choices"]) if sec.get("Choices") else None,
            conditions=conditions,
            earliest_time=_parse_time(sec["EarliestTime"], now)
            if sec.get("EarliestTime")
            else None,
            latest_time=_parse_time(sec["LatestTime"], now)
            if sec.get("LatestTime")
            else None,
            date_format=sec.get("DateFormat"),
            allow_empty=sec.get("AllowEmpty") == "True",
            noop=noop,
        )
        # sections containing a '.list' segment are deferred to
        # per-element expansion (validator.py:289-290)
        if ".list" in section:
            list_rules.append(rule)
        else:
            rules.append(rule)

    return RuleSet(
        rules=rules,
        data_type=data_type,
        sequential=sequential,
        has_header=has_header,
        now=now,
        list_rules=list_rules,
    )


def load_rules_file(path: str, now: datetime | None = None) -> RuleSet:
    with open(path, encoding="utf-8") as fh:
        return parse_rules_ini(fh.read(), now=now)


def fixture_rules_path(name: str = "config_2.ini") -> str:
    """Path to a vendored rule-config fixture shipped as package data
    (fixtures/ next to this package), so registered queries never depend
    on an external checkout existing at a fixed absolute path."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        name,
    )
