"""Property-based tests (hypothesis) for the determinism kernel.

The engine's oracle-match guarantee rests on a few primitives being
exactly order- and partition-independent; these properties are the
load-bearing walls, so they get generative coverage, not just
examples.
"""

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from locopy_spark.functions.schema_inference import find_column_type
from locopy_spark.operators.scrub import PII_PATTERNS
from locopy_spark.functions.numeric import SCALE

finite_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


def _scaled_sum(xs):
    return sum(math.floor(x * SCALE + 0.5) for x in xs)


@given(st.lists(finite_doubles, min_size=1, max_size=200), st.randoms())
@settings(max_examples=200, deadline=None)
def test_exact_sum_is_permutation_invariant(xs, rnd):
    """The floor-scale-sum kernel must give the SAME integer no matter
    how partitions order the rows — that is the whole determinism
    argument for money aggregates."""
    shuffled = list(xs)
    rnd.shuffle(shuffled)
    assert _scaled_sum(xs) == _scaled_sum(shuffled)


@given(st.lists(finite_doubles, min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_exact_sum_associative_regrouping(xs):
    """Arbitrary partial-aggregation splits (map-side combine) must
    agree with the single-pass sum."""
    cut = len(xs) // 2
    assert _scaled_sum(xs) == _scaled_sum(xs[:cut]) + _scaled_sum(xs[cut:])


@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=200,
    )
)
@settings(max_examples=150, deadline=None)
def test_scrub_is_idempotent(text):
    """Redaction applied twice must equal redaction applied once (a
    replacement token must never itself match a PII pattern)."""
    import re

    def scrub(s: str) -> str:
        for _, pat, repl in PII_PATTERNS:
            s = re.sub(pat, repl, s)
        return s

    once = scrub(text)
    assert scrub(once) == once


def test_find_column_type_examples():
    import pandas as pd

    df = pd.DataFrame(
        {
            "i": [1, 2],
            "f": [1.5, 2.5],
            "s": ["a", "b"],
            "t": pd.to_datetime(["2020-01-01", "2020-01-02"]),
            "b": [True, False],
        }
    )
    got = find_column_type(df)
    assert got["i"] in ("int", "bigint")
    assert got["f"] in ("float", "double")
    assert got["s"] == "varchar"
    assert got["t"] == "timestamp"


@given(
    st.lists(
        st.text(alphabet=list("abc';\"-/*\\\n `"), min_size=0, max_size=12),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_sql_splitter_never_loses_content(parts):
    """Splitting arbitrary text: the output statements, stripped of the
    top-level semicolons, must preserve every non-separator character
    in order (no content invented or dropped)."""
    from locopy_spark.database import _split_sql_statements

    sql = ";".join(parts)
    out = _split_sql_statements(sql)
    # every returned statement is non-empty and a substring of the input
    for stmt in out:
        assert stmt.strip()
        assert stmt in sql


def test_sql_splitter_plain_statements_roundtrip():
    from locopy_spark.database import _split_sql_statements

    stmts = ["SELECT 1", "SELECT 'a;b'", 'SELECT ";" AS q', "SELECT 2 -- c"]
    assert _split_sql_statements("; ".join(stmts)) == stmts
