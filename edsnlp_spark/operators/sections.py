"""eds.sections: header scan -> section intervals via lead() window.

Parity target: edsnlp/pipes/misc/sections/sections.py:13-190 — section
headers from a taxonomy; each section spans from its header to the next
header (or end of doc).  Spark: the header scan is a PhraseMatcher pass;
the interval construction is exactly ``lead(start) over (partition by
note order by start)`` (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window, functions as F

from ..core.base import Transformer
from .matcher import PhraseMatcher
from .. import registry

# Default French clinical section headers (subset of the reference's
# taxonomy, pipes/misc/sections/patterns.py).
DEFAULT_SECTIONS = {
    "antecedents": ["antecedents", "antecedents medicaux", "atcd"],
    "motif": ["motif", "motif de la consultation", "motif d'hospitalisation"],
    "traitement": ["traitement", "traitements", "traitement en cours"],
    "conclusion": ["conclusion", "synthese", "au total"],
    "examen_clinique": ["examen clinique", "examen"],
    "histoire": ["histoire de la maladie", "histoire recente"],
}


class SectionSegmenter(Transformer):
    requires = ("note_id", "tokens")
    name = "eds.sections"

    def __init__(self, sections: dict[str, Iterable[str]] | None = None,
                 attr: str = "NORM"):
        self.sections = sections or DEFAULT_SECTIONS
        self._matcher = PhraseMatcher(self.sections, attr=attr,
                                      span_type="section_header")

    def sections_table(self, notes: DataFrame) -> DataFrame:
        """(note_id, section, sec_id, start_char, tok_start, end_tok)
        — end is the next header's start (or doc token count)."""
        headers = self._matcher.entities(notes)
        ntok = notes.select("note_id", F.size("tokens").alias("n_tokens"))
        w = Window.partitionBy("note_id").orderBy("tok_start")
        return (
            headers.withColumn("next_start", F.lead("tok_start").over(w))
            .withColumn("sec_id", F.row_number().over(w))
            .join(ntok, "note_id")
            .select(
                "note_id",
                F.col("label").alias("section"),
                "sec_id",
                "start_char",
                "tok_start",
                F.coalesce("next_start", "n_tokens").alias("tok_until"),
            )
        )

    def transform(self, df: DataFrame) -> DataFrame:
        secs = self.sections_table(df)
        agg = secs.groupBy("note_id").agg(
            F.sort_array(F.collect_list(F.struct(
                "sec_id", "section", "start_char", "tok_start", "tok_until"
            ))).alias("sections_spans")
        )
        return df.join(agg, "note_id", "left")


@registry.register("eds.sections")
def _make_sections(**kw):
    return SectionSegmenter(**kw)
