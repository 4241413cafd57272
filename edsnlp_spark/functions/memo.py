"""Expression-template memoization: reuse built Column trees.

Why: several operators build VERY large Column expression trees (the
tokenizer prefix-sum fold, the sentence state machine, temporal
classification, history flag folds) — thousands of py4j calls each.
Measured on local[32]: constructing the history_qualifier plan cost
~4.3s while EXECUTING it cost ~1.7s; the build was pure driver-side
expression construction + re-analysis.  A driver running thousands of
queries pays this on every plan build.

These builders are DETERMINISTIC functions of column NAMES and config
(they reference inputs via ``F.col("name")``, never via bound
DataFrame attributes), so the resulting unresolved Column is reusable
across any DataFrame exposing those names — name resolution happens at
analysis time.  We cache per JVM gateway (a py4j Column handle dies
with the gateway, never earlier in-process).

Use ``memo_column(key, builder)`` where ``key`` uniquely encodes the
builder identity + every config input that shapes the expression.
"""

from __future__ import annotations

from typing import Callable, Hashable

_MEMO: dict = {}


def _gateway_id():
    from pyspark import SparkContext
    gw = SparkContext._gateway
    return id(gw) if gw is not None else None


def memo_column(key: Hashable, builder: Callable):
    """Return the memoized result of ``builder()`` for this key.

    ``builder`` must construct its result purely from column names and
    the config captured in ``key`` (no DataFrame references)."""
    k = (_gateway_id(), key)
    if k not in _MEMO:
        _MEMO[k] = builder()
    return _MEMO[k]


def memo_clear() -> None:
    _MEMO.clear()
