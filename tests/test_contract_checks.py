"""Structural contract checks: SURVEY §2 ↔ queries() ↔ oracle_sql()
drift, the streaming lockstep invariant (no stream job whose batch twin
has neither a driver CORRECTNESS row nor a seat in the current window),
and the bench manifest invariant (every queries() key is benched or
carries an explicit exclusion reason).

Keeping this inside pytest makes the invariants structural: a refactor
that breaks any of them fails the suite, not just a tool nobody ran.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_check_survey_passes():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_survey.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_window_capacity_math():
    """Pin the staleness-ceiling arithmetic (VERDICT r9 task 2).

    The driver gates WINDOW=50 keys per round, so a surface of N keys
    cycles fully in ceil(N / 50) rounds; the ceiling must be at least
    that or the checker is permanently unsatisfiable (the round-9 plan
    to ratchet CEILING 6 -> 5 failed exactly this: 298 keys need 6
    rounds of 50).  Also pin that the CURRENT window discharges every
    ceiling obligation: assuming this round's first-50 get fresh
    driver rows, no key outside the window is past the ceiling next
    round — i.e. the rotation plan is feasible, not just green today.
    """
    sys.path.insert(0, REPO)
    import glob
    import json
    import math
    import re

    import __spark_entry__ as entrymod
    from tools.check_survey import STALENESS_CEILING

    qs = list(entrymod.queries())
    window = set(qs[:50])
    assert STALENESS_CEILING >= math.ceil(len(qs) / 50), (
        f"ceiling {STALENESS_CEILING} < full-cycle length "
        f"{math.ceil(len(qs) / 50)} rounds: permanently unsatisfiable"
    )
    latest: dict[str, int] = {}
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)\.json$", p).group(1))
        for k in json.load(open(p)):
            latest[k] = max(latest.get(k, 0), r)
    if not latest:
        return
    this_round = max(latest.values()) + 1
    # project: window keys get a row this round, then the next round's
    # checker runs with current = this_round + 1
    projected = {k: (this_round if k in window else r) for k, r in latest.items()}
    overdue_next = [
        k
        for k, r in projected.items()
        if k in set(qs) and (this_round + 1) - r > STALENESS_CEILING
    ]
    assert len(overdue_next) <= 50, (
        f"{len(overdue_next)} keys will exceed the ceiling next round — "
        "more than one window can seat: rotation plan infeasible"
    )


def test_bench_manifest_covers_every_key():
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod
    import bench as benchmod

    qs = set(entrymod.queries())
    benched = set(benchmod.BENCH_QUERIES)
    excluded = set(benchmod.EXCLUDED)
    assert qs - benched - excluded == set()
    assert benched & excluded == set()
    assert excluded <= qs
    # every exclusion reason is a known category
    assert set(benchmod.EXCLUDED.values()) <= {
        "all-pairs-oracle",
        "prod-twin-priced",
        "io-roundtrip",
    }
