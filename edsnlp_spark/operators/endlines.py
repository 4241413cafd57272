"""eds.endlines: real end-of-line vs PDF-extraction artifact.

Parity target: edsnlp/pipes/core/endlines/endlines.py:16 — the reference
trains an unsupervised ML classifier; SURVEY.md §2.4 scopes v1 to a rule
fallback with the same output contract: each newline is classified and
artifact newlines can be spliced out.

Rule (native expressions): a newline is a TRUE end-of-line when the text
before it ends a sentence (terminal punctuation / colon) or the line is
blank, or the next line starts with an uppercase/enumeration marker;
otherwise (lowercase continuation) it is an artifact of extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.base import Transformer
from .. import registry


class EndLinesClassifier(Transformer):
    requires = ("note_id", "note_text")
    provides = ("endlines",)
    name = "eds.endlines"

    def __init__(self, text_col: str = "note_text"):
        self.text_col = text_col
        self.requires = ("note_id", text_col)

    def endlines_table(self, notes: DataFrame) -> DataFrame:
        """(note_id, line_no, line, true_end) per line."""
        lines = notes.select(
            "note_id",
            F.posexplode(
                F.split(F.coalesce(F.col(self.text_col), F.lit("")), "\n")
            ).alias("line_no", "line"),
        )
        from pyspark.sql import Window
        w = Window.partitionBy("note_id").orderBy("line_no")
        nxt = F.lead("line").over(w)
        ends_sentence = F.trim("line").rlike(r"[.!?:;]\s*$")
        blank = F.trim("line") == ""
        next_upper = F.coalesce(
            nxt.rlike(r"^\s*(?:[A-ZÀ-Ý]|\d+[.)]|[-•*])"), F.lit(True))
        return lines.withColumn(
            "true_end",
            blank | ends_sentence | next_upper,
        )

    def transform(self, df: DataFrame) -> DataFrame:
        """Adds ``clean_text`` with artifact newlines replaced by spaces."""
        t = self.endlines_table(df)
        merged = t.groupBy("note_id").agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("line_no", "line",
                                                     "true_end"))),
                F.lit(""),
                lambda acc, x: F.concat(
                    acc,
                    x["line"],
                    F.when(x["true_end"], F.lit("\n")).otherwise(F.lit(" ")),
                ),
            ).alias("clean_raw"),
        ).select(
            "note_id",
            F.regexp_replace("clean_raw", r"[ \n]$", "").alias("clean_text"),
        )
        return df.join(merged, "note_id", "left")


@registry.register("eds.endlines")
def _make_endlines(**kw):
    return EndLinesClassifier(**kw)
