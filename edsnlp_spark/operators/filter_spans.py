"""filter_spans: greedy overlap resolution (longest, then leftmost).

Parity target: edsnlp/utils/filter.py:45-129 — sort spans by (length
desc, start asc) and greedily keep each span that does not overlap an
already-kept span.  Order-dependence makes this non-relational
(SURVEY.md §7 hard parts), but it IS a per-document fold: we sort the
collected spans inside an array column and run ``aggregate`` with a
kept-array accumulator — fully native, no UDF, no extra shuffle beyond
the per-document grouping the entities plane already has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def filter_spans(entities: DataFrame, start_col: str = "start_char",
                 end_col: str = "end_char", label_col: str = "label") -> DataFrame:
    """Keep non-overlapping spans, longest-then-leftmost-then-label order.

    Returns the same columns as the input (payload columns survive)."""
    payload = [c for c in entities.columns
               if c not in ("note_id", start_col, end_col, label_col)]
    span_struct = F.struct(
        (-(F.col(end_col) - F.col(start_col))).cast("int").alias("neg_len"),
        F.col(start_col).cast("int").alias("start"),
        F.col(end_col).cast("int").alias("end"),
        F.col(label_col).alias("label"),
        *[F.col(c).alias(c) for c in payload],
    )
    grouped = entities.groupBy("note_id").agg(
        F.sort_array(F.collect_list(span_struct)).alias("spans")
    )
    empty = F.slice(F.col("spans"), 1, 0)  # typed empty array
    kept = F.aggregate(
        F.col("spans"),
        empty,
        lambda acc, s: F.when(
            F.exists(acc, lambda k: (s["start"] < k["end"]) & (k["start"] < s["end"])),
            acc,
        ).otherwise(F.array_append(acc, s)),
    )
    out = grouped.select("note_id", F.explode(kept).alias("s"))
    return out.select(
        "note_id",
        F.col("s.start").alias(start_col),
        F.col("s.end").alias(end_col),
        F.col("s.label").alias(label_col),
        *[F.col(f"s.{c}").alias(c) for c in payload],
    )
