"""Generate the DuckDB oracle for the ``rules_catalog`` query.

Parses ``fixtures/config_2.ini`` with the *stdlib* configparser directly
(independent of the package's sources/rules.py parser) and prints a
``SELECT ... FROM (VALUES ...)`` literal enumerating every expected row.
The emitted SQL is pasted into plans/cvp.py as RULES_CATALOG_ORACLE so
the driver's correctness gate hash-checks the whole
INI → RuleSet → DataFrame pipeline against a static, reviewable literal.

Usage: python tools/gen_rules_oracle.py > /tmp/rules_oracle.sql
"""

from __future__ import annotations

import json
import os
import sys
from configparser import ConfigParser, ExtendedInterpolation

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dev_dot_cvp_metadata_ingestion_spark",
    "fixtures",
    "config_2.ini",
)

COLS = (
    "field_path",
    "type",
    "upper_limit",
    "lower_limit",
    "values_json",
    "choices_json",
    "conditions_json",
    "earliest_time",
    "date_format",
    "allow_empty",
    "noop",
)


def _sql_str(v: str | None) -> str:
    if v is None:
        return "NULL"
    return "'" + v.replace("'", "''") + "'"


def _sql_num(v: str | None) -> str:
    # emit the raw INI numeral; the outer CAST(... AS DOUBLE) rounds it
    # with the same IEEE semantics as Python's float(Decimal(raw))
    return v if v is not None else "NULL"


def _sql_bool(v: bool) -> str:
    return "TRUE" if v else "FALSE"


def rows_from_ini(path: str) -> list[tuple]:
    cp = ConfigParser(interpolation=ExtendedInterpolation())
    with open(path, encoding="utf-8") as fh:
        cp.read_string(fh.read())
    out = []
    for section in cp.sections():
        if section == "_settings":
            continue
        sec = cp[section]
        conditions_json = None
        noop = False
        ev = sec.get("EqualsValue")
        if ev is not None:
            parsed = json.loads(ev)
            if isinstance(parsed, dict) and "conditions" in parsed:
                conditions_json = json.dumps(parsed["conditions"])
            elif not isinstance(parsed, (dict, list, str)):
                noop = True
        values_json = (
            json.dumps(json.loads(sec["Values"])) if sec.get("Values") else None
        )
        choices_json = (
            json.dumps(json.loads(sec["Choices"])) if sec.get("Choices") else None
        )
        earliest = sec.get("EarliestTime")
        if earliest is not None and earliest != "NOW":
            # mirror sources/rules.py: ISO parse, second-truncated, str()
            from datetime import datetime

            ts = datetime.fromisoformat(earliest.replace("Z", "+00:00"))
            earliest = str(ts.replace(microsecond=0))
        elif earliest == "NOW":
            raise SystemExit(
                "EarliestTime=NOW is nondeterministic; cannot literal-ize"
            )
        out.append(
            (
                section,
                sec.get("Type"),
                sec.get("UpperLimit"),
                sec.get("LowerLimit"),
                values_json,
                choices_json,
                conditions_json,
                earliest,
                sec.get("DateFormat"),
                sec.get("AllowEmpty") == "True",
                noop,
            )
        )
    return out


def main() -> None:
    rows = rows_from_ini(FIXTURE)
    vals = []
    for r in rows:
        cells = [
            _sql_str(r[0]),
            _sql_str(r[1]),
            _sql_num(r[2]),
            _sql_num(r[3]),
            _sql_str(r[4]),
            _sql_str(r[5]),
            _sql_str(r[6]),
            _sql_str(r[7]),
            _sql_str(r[8]),
            _sql_bool(r[9]),
            _sql_bool(r[10]),
        ]
        vals.append("  (" + ", ".join(cells) + ")")
    sys.stdout.write(
        "SELECT\n"
        "  CAST(c1 AS VARCHAR) AS field_path,\n"
        "  CAST(c2 AS VARCHAR) AS type,\n"
        "  CAST(c3 AS DOUBLE) AS upper_limit,\n"
        "  CAST(c4 AS DOUBLE) AS lower_limit,\n"
        "  CAST(c5 AS VARCHAR) AS values_json,\n"
        "  CAST(c6 AS VARCHAR) AS choices_json,\n"
        "  CAST(c7 AS VARCHAR) AS conditions_json,\n"
        "  CAST(c8 AS VARCHAR) AS earliest_time,\n"
        "  CAST(c9 AS VARCHAR) AS date_format,\n"
        "  CAST(c10 AS BOOLEAN) AS allow_empty,\n"
        "  CAST(c11 AS BOOLEAN) AS noop\n"
        "FROM (VALUES\n" + ",\n".join(vals) + "\n"
        ") AS t(c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11)\n"
        "ORDER BY field_path\n"
    )


if __name__ == "__main__":
    main()
