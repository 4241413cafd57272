"""eds.pollution: boilerplate span tagging + matcher exclusion.

Parity target: edsnlp/pipes/core/normalizer/pollution/pollution.py:15 —
regexes tag pollution spans (page footers, "NBNbWb" OCR noise, biology
result tables, dates-only lines); matchers then skip excluded text
(ignore_excluded, matchers/regex.py:185-191).

Spark design: pollution intervals are a per-row native regex fold (same
machinery as the native RegexMatcher); exclusion is an anti overlap
join — entity dropped when it intersects a pollution interval
(SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.base import Transformer
from .matcher import RegexMatcher
from .. import registry

# Default pollution patterns (classes mirror pollution/patterns.py).
POLLUTION_PATTERNS = {
    "information": [r"(?i)les données de ce document[^.]*\."],
    "bars": [r"[|¦]{2,}", r"_{5,}", r"-{5,}", r"={5,}"],
    "nbnb": [r"(?:[Nn][Bb]|[Ww][Bb]){3,}"],
    "biology": [r"\b\d{2,3}/\d{2,3}(?:/\d{2,3})+\b"],
    "doctors": [r"(?i)^dr\.?\s+\w+\s+tel[ :].*$"],
}


class PollutionTagger(Transformer):
    requires = ("note_id", "note_text")
    name = "eds.pollution"

    def __init__(self, patterns: dict[str, list[str]] | None = None,
                 text_col: str = "note_text"):
        self.patterns = patterns or POLLUTION_PATTERNS
        self.text_col = text_col
        self.requires = ("note_id", text_col)
        self._rx = RegexMatcher(self.patterns, attr="TEXT",
                                span_type="pollution", native=True,
                                text_col=text_col)

    def pollution_table(self, notes: DataFrame) -> DataFrame:
        """(note_id, start_char, end_char, label) pollution intervals."""
        return self._rx.entities(notes).select(
            "note_id", "start_char", "end_char", "label")

    def transform(self, df: DataFrame) -> DataFrame:
        agg = self.pollution_table(df).groupBy(
            F.col("note_id").alias("p_note")).agg(
            F.sort_array(F.collect_list(F.struct("start_char", "end_char")))
            .alias("pollution"))
        out = df.join(agg, F.col("note_id") == F.col("p_note"), "left") \
            .drop("p_note")
        return out.withColumn(
            "pollution",
            F.coalesce(F.col("pollution"), F.expr(
                "cast(array() as array<struct<start_char:int,end_char:int>>)")))


def exclude_polluted(entities: DataFrame, pollution: DataFrame) -> DataFrame:
    """Drop entities overlapping any pollution interval (anti join) —
    the relational form of ignore_excluded."""
    p = pollution.select(
        F.col("note_id").alias("p_note"),
        F.col("start_char").alias("p_s"),
        F.col("end_char").alias("p_e"),
    )
    return entities.join(
        p,
        (entities["note_id"] == p["p_note"])
        & (entities["start_char"] < p["p_e"])
        & (p["p_s"] < entities["end_char"]),
        "left_anti",
    )


@registry.register("eds.pollution")
def _make_pollution(**kw):
    return PollutionTagger(**kw)
