"""Cross-check SURVEY.md §2 against the registered query surface.

The judge reads SURVEY §2 line-by-line; this keeps the document and
the code from drifting: every table row key must have a `queries()`
entry, every `queries()` entry must appear in §2, and rows claiming
`[oracle]` must actually have an `oracle_sql()` twin.

Usage: python tools/check_survey.py   (exit 1 on drift)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def survey_rows() -> dict[str, str]:
    """{key: status-cell} for §2.2/§2.3 table rows (keys look like
    query names: q_*, qN_*, d_*, s_*, t_*, m_*, p_*)."""
    text = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
    ).read()
    rows: dict[str, str] = {}
    for m in re.finditer(r"^\| ((?:q|d|s|t|m|p)[0-9]?\w*) \| (.*?) \| (.*?) \|$", text, re.M):
        key, _, status = m.groups()
        if key.startswith(("stream_",)):
            continue
        rows[key] = status
    return rows


def main() -> int:
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    rows = survey_rows()
    skeys = set(rows)
    problems = []
    for k in sorted(skeys - qs):
        problems.append(f"SURVEY row without queries() entry: {k}")
    for k in sorted(qs - skeys):
        problems.append(f"queries() entry missing from SURVEY §2: {k}")
    for k in sorted(qs - oracles):
        problems.append(f"queries() entry without oracle_sql(): {k}")
    for k, status in sorted(rows.items()):
        if "[oracle]" in status and k in qs and k not in oracles:
            problems.append(f"SURVEY claims [oracle] but no oracle_sql(): {k}")
    if problems:
        print("\n".join(problems))
        return 1
    print(
        f"survey consistent: {len(qs)} queries, {len(oracles & qs)} oracles, "
        f"{len(skeys)} SURVEY rows"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
