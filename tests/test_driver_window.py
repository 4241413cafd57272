"""Driver-window membership pin + staleness audit (VERDICT r8 #1/#8).

The driver's correctness gate records only the FIRST 50 ``queries()``
keys.  Rotation happens at the DRIVER-KEY level (``__spark_entry__``):
``_ROTATE_INTO_WINDOW`` names gain an ``a0_`` prefix,
``_ROTATE_OUT_OF_WINDOW`` canonical ``a0_`` names lose it — canonical
registry keys stay stable.  These tests pin the fix under BOTH
plausible driver keying models (dict ITERATION order — the model the
r7 evidence proved — and sorted-keys order), and run the staleness
audit the judge used to run by hand: no query's newest driver-green
row may be more than 3 rounds old at round end, assuming this round's
window lands green.
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ENTRY = os.path.join(_REPO, "__spark_entry__.py")
_spec = importlib.util.spec_from_file_location("spark_entry", _ENTRY)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)

# The current build round: 1 + the newest committed CORRECTNESS file.
_ROUNDS = sorted(
    int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
    for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
THIS_ROUND = (_ROUNDS[-1] + 1) if _ROUNDS else 1
MAX_STALENESS = 3


def _canon(name: str) -> str:
    return name[len("a0_"):] if name.startswith("a0_") else name


def test_window_contains_rotated_names_in_iteration_order():
    keys = list(_entry.queries())
    window = set(keys[:50])
    rotated = {f"a0_{n}" for n in _entry._ROTATE_INTO_WINDOW}
    missing = rotated - window
    assert not missing, (
        f"driver first-50 window (ITERATION order) is missing {missing}; "
        f"window = {keys[:50]}")


def test_every_a0_key_fits_the_window():
    """Every a0_-prefixed key (canonical or rotated) must actually fit
    the 50-slot window — if the a0_ population ever exceeds 50, some
    prefixed query silently falls out and the prefix lies."""
    keys = list(_entry.queries())
    a0 = [k for k in keys if k.startswith("a0_")]
    assert len(a0) <= 50, f"{len(a0)} a0_ keys exceed the 50-slot window"
    window = set(keys[:50])
    assert set(a0) <= window


def test_window_same_under_sorted_keys_model():
    keys = list(_entry.queries())
    assert keys == sorted(keys), (
        "queries() iteration order must equal sorted-key order so both "
        "driver keying models produce the same first-50 window")


def test_driver_keys_unique_and_reversible():
    """Prefix-stripping must never collide two queries onto one driver
    key, and rotate-in / rotate-out sets must target real names."""
    from edsnlp_spark.queries import all_queries
    names = set(all_queries())
    keys = [_entry._driver_key(n) for n in names]
    assert len(set(keys)) == len(keys), "driver-key collision"
    missing_in = _entry._ROTATE_INTO_WINDOW - names
    assert not missing_in, f"rotate-in names not in registry: {missing_in}"
    missing_out = _entry._ROTATE_OUT_OF_WINDOW - names
    assert not missing_out, (
        f"rotate-out names not in registry: {missing_out}")
    # no double-prefixing either way
    assert not any(n.startswith("a0_")
                   for n in _entry._ROTATE_INTO_WINDOW)
    assert all(n.startswith("a0_")
               for n in _entry._ROTATE_OUT_OF_WINDOW)


def test_oracle_keys_match_query_keys():
    qk = set(_entry.queries())
    ok = set(_entry.oracle_sql())
    assert ok <= qk


def test_no_driver_row_older_than_three_rounds():
    """The audit VERDICT r8 #8 asked to move from the judge's head into
    pytest: aggregate every CORRECTNESS_r0*.json, assume the CURRENT
    first-50 window lands green this round, and assert every query's
    newest green row is then <= MAX_STALENESS rounds old.  Names are
    compared canonically (the a0_ prefix flips between rounds)."""
    newest: dict[str, int] = {}
    # NOTE: the pattern must be r*.json, not r0*.json — the r10 file
    # is CORRECTNESS_r10.json and a r0* glob silently drops it (this
    # bug made the audit blind to round 10 and under-counted
    # THIS_ROUND by one; found at r11 start).
    for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        for key, row in json.load(open(f)).items():
            ok = (row.get("rows_match") and row.get("schema_match")
                  and row.get("hash_match") in (True, None)
                  and not row.get("err"))
            if ok:
                c = _canon(key)
                newest[c] = max(newest.get(c, 0), rnd)
    window_now = {_canon(k) for k in list(_entry.queries())[:50]}
    for c in window_now:
        newest[c] = THIS_ROUND
    from edsnlp_spark.queries import all_queries
    stale = {
        n: newest.get(_canon(n), 0)
        for n in all_queries()
        if THIS_ROUND - newest.get(_canon(n), 0) > MAX_STALENESS
    }
    assert not stale, (
        f"queries whose newest driver row would be > {MAX_STALENESS} "
        f"rounds old at round {THIS_ROUND} end: {stale} — extend "
        f"_ROTATE_INTO_WINDOW (and free slots via _ROTATE_OUT_OF_WINDOW)")
