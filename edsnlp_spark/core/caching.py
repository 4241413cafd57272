"""Tracked persists: bounded cache lifetime for lazily-returned plans.

Several operators persist derived planes (cue tables, section tables,
date-mention planes, SemDeDup cell assignments) that the RETURNED lazy
DataFrame still references — unpersisting before the caller
materializes would silently re-execute the subtree (the round-1 100x
lazy-blowup), and eagerly materializing inside the operator hits the
round-3 measured cliff (persisting history's evidence plane: 8x slower
+ codegen fallback).  So the planes must stay cached until the caller
is done.

This module makes that lifetime explicit instead of leaky (ADVICE r3):
operators register their internal persists under a scope name, and a
long-lived session calls :func:`release` after materializing the
output (or ``spark.catalog.clearCache()``, which Spark itself provides
for the blunt version).  The registry holds the Python wrapper (a few
hundred bytes) — the JVM-side cache it controls is the real memory,
and the wrapper is the only handle through which it can be dropped
(the cache outlives the wrapper's Python scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: dict[str, list[DataFrame]] = {}


def tracked_persist(df: DataFrame, scope: str) -> DataFrame:
    """persist() + register under ``scope`` for later :func:`release`."""
    df = df.persist()
    _TRACKED.setdefault(scope, []).append(df)
    return df


def release(scope: str | None = None) -> int:
    """Unpersist every tracked plane (one scope, or all).

    Call AFTER materializing the operator's output; the next call to
    the operator re-persists fresh planes.  Returns the number of
    planes released."""
    scopes = [scope] if scope is not None else list(_TRACKED)
    n = 0
    for s in scopes:
        for df in _TRACKED.pop(s, []):
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass
    return n


def tracked_scopes() -> dict[str, int]:
    """scope -> number of tracked planes (for tests/debugging)."""
    return {s: len(refs) for s, refs in _TRACKED.items()}
