"""Span getter/setter DSL as column selectors (SURVEY.md §2.11).

Parity target: edsnlp/utils/span_getters.py:40-252 — span getters like
``{"ents": True, "group": ["label1"]}`` select which spans a pipe reads/
writes.  On the entities plane this is a filter expression; setters are
``withColumn``/union operations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def span_filter(span_getter: dict) -> Column:
    """{"ents": True, "mygroup": ["covid", "dis"]} -> boolean Column.

    Keys are span_type values ('ents' = the default group); True selects
    the whole group, a list restricts to those labels.
    """
    cond = F.lit(False)
    for group, sel in span_getter.items():
        this = F.col("span_type") == group
        if sel is not True:
            this = this & F.col("label").isin(list(sel))
        cond = cond | this
    return cond


def get_spans(entities: DataFrame, span_getter: dict) -> DataFrame:
    return entities.filter(span_filter(span_getter))


def set_span_group(entities: DataFrame, group: str) -> DataFrame:
    """Route spans into a named group (doc.spans[group] analog)."""
    return entities.withColumn("span_type", F.lit(group))


def deduplicate_spans(entities: DataFrame) -> DataFrame:
    """span_getters.py:40-71 deduplicate: identical (doc, span, label)
    collapse to one row."""
    return entities.dropDuplicates(
        ["note_id", "start_char", "end_char", "label"])


def union_span_groups(*entity_dfs: DataFrame) -> DataFrame:
    """Union of span sources (get_spans over several groups)."""
    out = entity_dfs[0]
    for df in entity_dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
