"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (qualifier engine) on sf0.001.
queries()       — every implemented operator from SURVEY.md §2 as
                  (spark, sf_dir) -> DataFrame callables.
oracle_sql()    — matching ANSI SQL for DuckDB; queries without an
                  oracle (python-side stubs) are omitted and get the
                  driver's rows-only check.

Implementations live in edsnlp_spark/queries/ (relational.py,
textops.py, scaleops.py); operators in edsnlp_spark/operators/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from edsnlp_spark.queries import all_queries  # noqa: E402

# Driver-window rotation (round 5).  The driver's correctness gate
# records only the FIRST 50 queries() keys in alphabetical order; with
# 71 queries, 21 names never got a driver-recorded row through round 4
# (they are covered by the identical in-repo replica gate,
# tests/test_oracle_parity.py, which runs all 71).  Per VERDICT r4 #1 we
# re-KEY — not re-implement — those 21 with an `a0_` prefix so they sort
# into the checked window this round; implementations and oracle SQL are
# untouched, and the canonical names remain the keys of
# edsnlp_spark.queries.all_queries().  Rotation documented in README.md.
_ROTATE_INTO_WINDOW = frozenset({
    "reported_speech_tokens", "revenue_by_nation", "sales_rollup",
    "salted_event_totals", "section_spans", "semdedup_embeddings",
    "sentence_boundaries", "sequence_packing", "simhash_fingerprints",
    "simstring_fuzzy", "source_mixture_sample", "split_assignment",
    "split_windows", "suppliers_with_recent_shipments", "tnm_mentions",
    "token_offsets", "token_stats_by_lang", "top_orders_per_customer",
    "umls_scale_match", "unigram_logppl", "url_domain_filtering",
})


def _driver_key(name: str) -> str:
    return f"a0_{name}" if name in _ROTATE_INTO_WINDOW else name


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full qualifier pipeline (tokenize -> sentence segment ->
    phrase match -> boundary sessionization -> negation) on sf0.001."""
    from edsnlp_spark.queries.textops import negation_tokens

    return negation_tokens(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        _driver_key(name): fn
        for name, (fn, _) in sorted(all_queries().items())
    }


def oracle_sql() -> dict[str, str]:
    return {
        _driver_key(name): sql
        for name, (_, sql) in sorted(all_queries().items())
        if sql
    }
