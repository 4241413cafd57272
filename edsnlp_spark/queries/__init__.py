"""Query registry: every declared operator's (spark_fn, oracle_sql) pair.

The driver contract (__spark_entry__.py) exposes these via queries() /
oracle_sql(); tests/test_oracle_parity.py replicates the driver's
DuckDB comparison locally.
"""

from __future__ import annotations


def all_queries() -> dict:
    """name -> (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)."""
    from . import relational
    out: dict = {}
    out.update(relational.QUERIES)
    try:
        from . import textops
        out.update(textops.QUERIES)
    except ImportError:
        pass
    try:
        from . import scaleops
        out.update(scaleops.QUERIES)
    except ImportError:
        pass
    try:
        from . import advanced
        out.update(advanced.QUERIES)
    except ImportError:
        pass
    try:
        from . import relational2
        out.update(relational2.QUERIES)
    except ImportError:
        pass
    try:
        from . import lexicon
        out.update(lexicon.QUERIES)
    except ImportError:
        pass
    try:
        from . import disorders_q
        out.update(disorders_q.QUERIES)
    except ImportError:
        pass
    try:
        from . import domain
        out.update(domain.QUERIES)
    except ImportError:
        pass
    try:
        from . import miscpipes
        out.update(miscpipes.QUERIES)
    except ImportError:
        pass
    return out
