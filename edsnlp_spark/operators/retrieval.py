"""Keyword retrieval over a document corpus: BM25 scoring + top-k.

The classic lexical-search capability a training-data platform needs
next to embedding ANN (corpus exploration, eval-set mining, targeted
decontamination).  Okapi BM25 (Robertson & Walker, SIGIR'94; the
Lucene idf variant ln(1 + (N - df + 0.5)/(df + 0.5)) which keeps idf
positive).

Scale shape: for a LITERAL query-term list (queries are tiny), per-doc
term frequencies are pure projections (`F.size(F.filter(tokens, ...))`
— no explode, no shuffle), the corpus statistics (N, total length, per
-term document frequencies) are ONE global aggregate row broadcast
back, and the final top-k is `orderBy(...).limit(k)` which Spark plans
as TakeOrderedAndProject (per-partition heaps + driver merge of k rows
— never a global sort of the corpus).

All arithmetic derives from exact integer counts (tf, df, dl, N, total
length), so a DuckDB oracle writing the SAME expression reproduces the
scores bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..core.caching import scoped, tracked_persist


def _tokens(text: Column) -> Column:
    # literal single-space split — the corpus tokenization model shared
    # by every textops oracle (ADVICE r6 #3: a \s+ split diverges from
    # the DuckDB oracle's string_split(text, ' ') on runs of
    # whitespace/tabs/newlines, changing dl and token boundaries).
    return F.split(F.lower(text), " ", -1)


@scoped("retrieval")
def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    -> (id_col, score) with ``score`` rounded to 4dp, ordered by
    (score desc, id) and limited to k — deterministic, oracle-friendly.

    The compact per-doc stats plane (id, dl, one tf per term — all
    numeric) is persisted because it is read twice (corpus-statistics
    aggregate + scoring): re-deriving it would re-scan the full TEXT
    column, which at corpus scale costs far more than caching a few
    numeric columns.  Tracked under the 'retrieval' scope; repeated
    calls release the previous call's plane.
    """
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    toks = _tokens(F.col(text_col))
    tf_cols = [
        F.size(F.filter(toks, _eq(t))).cast("double").alias(f"tf{i}")
        for i, t in enumerate(terms)
    ]
    base = tracked_persist(docs.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("dl"),
        *tf_cols,
    ), "retrieval")
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("double")).alias(f"df{i}")
          for i in range(len(terms))],
    )
    # one row of corpus statistics joined back (broadcast by size)
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5)))
        norm = (F.lit(k1)
                * (F.lit(1.0 - b)
                   + F.lit(b) * F.col("dl") * F.col("n_docs")
                   / F.col("sum_dl")))
        s_i = idf * (F.col(f"tf{i}") * F.lit(k1 + 1.0)
                     / (F.col(f"tf{i}") + norm))
        score = s_i if score is None else score + s_i
    return (
        scored.select(F.col(id_col), score.alias("__s"))
        .orderBy(F.col("__s").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("__s", 4).alias("score"))
    )


def _eq(term: str):
    # closure factory (CLAUDE.md: a 2-arg lambda default-arg capture
    # would receive the array INDEX as the second argument)
    def pred(x: Column) -> Column:
        return x == F.lit(term)
    return pred
