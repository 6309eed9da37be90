"""Text scrubbing for training-data pipelines: PII pattern redaction +
dictionary (denylist) entity scrubbing.

All patterns are in the RE2-compatible subset (no lookaround, no
backreferences) so Spark's Java regex and DuckDB's RE2 agree on every
match — the scrub is oracle-verifiable byte-for-byte. Replacement is a
chain of ``regexp_replace`` column expressions: JVM-side, codegen'd,
one pass per pattern, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order. Patterns restricted
# to the Java∩RE2 regex subset.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
)


def denylist_pattern(terms: tuple[str, ...]) -> str:
    """Word-boundary alternation for a term denylist."""
    return r"\b(" + "|".join(terms) + r")\b"


def scrub_expr(col: Column | str, patterns=PII_PATTERNS) -> Column:
    """Chained redaction of every pattern, in order."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in patterns:
        out = F.regexp_replace(out, pat, repl)
    return out


def match_counts(col: Column | str, patterns=PII_PATTERNS) -> list[Column]:
    """One ``n_<name>`` count column per pattern (on the raw text)."""
    src = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(src, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in patterns
    ]


def sql_scrub(col: str, patterns=PII_PATTERNS) -> str:
    """DuckDB twin of :func:`scrub_expr` (global replace flag)."""
    out = col
    for _, pat, repl in patterns:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def sql_match_counts(col: str, patterns=PII_PATTERNS) -> list[str]:
    """DuckDB twins of :func:`match_counts`."""
    return [
        f"CAST(len(regexp_extract_all({col}, '{pat}')) AS INT) AS n_{name}"
        for name, pat, _ in patterns
    ]
