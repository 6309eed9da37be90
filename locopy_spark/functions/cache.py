"""Scoped persist management.

Query plans persist() shared subtrees (LSH signatures, normed
embeddings, tf tables) because ReusedExchange does not collapse
multi-consumer subtrees feeding broadcast joins. But a ``queries()``
callable returns its DataFrame lazily — the driver collects later — so
the query itself has no point at which it can unpersist, and a
sequential multi-query run (driver correctness gate, pytest) would pin
every query's cache for the rest of the process.

``managed_persist(df, scope)`` bounds that: frames persisted under the
CURRENT scope accumulate (one query may share several subtrees); the
first persist under a NEW scope releases everything from the previous
one. Pinned memory is therefore at most one query's working set.
Unpersisting is always correctness-safe — a released frame recomputes
on next use — so even a plan that mixes scopes only loses cache hits,
never results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live: list[DataFrame] = []
_scope: str | None = None


def managed_persist(df: DataFrame, scope: str) -> DataFrame:
    """persist() ``df`` under ``scope``, releasing frames persisted
    under any previous scope first. Returns ``df`` for chaining."""
    global _scope
    if scope != _scope:
        release_persists()
        _scope = scope
    df.persist()
    _live.append(df)
    return df


def release_persists() -> None:
    """Unpersist every managed frame (blocking=False: executors free
    the blocks asynchronously; plans remain valid)."""
    global _scope
    for d in _live:
        try:
            d.unpersist()
        except Exception:
            pass  # session gone / already released — nothing to free
    _live.clear()
    _scope = None
