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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full qualifier pipeline (tokenize -> sentence segment ->
    phrase match -> boundary sessionization -> negation) on sf0.001."""
    from edsnlp_spark.queries.textops import negation_tokens

    return negation_tokens(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in sorted(all_queries().items()) if sql
    }
