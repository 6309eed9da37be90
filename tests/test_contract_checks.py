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
