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

# FULL reference pollution patterns (normalizer/pollution/patterns.py
# :1-56), with two mechanical adaptations for the shared regex engine:
# global flags scoped as (?x:...) groups (the matcher ORs patterns and
# Python rejects mid-pattern global flags) and Python-only {,n} bounds
# written {0,n}.
_INFO_1 = (
    r"(?s:(=====+\s*)?(L\s*e\s*s\sdonnées\s*administratives,\s*sociales\s*|"
    r"I?nfo\s*rmation\s*aux?\s*patients?|"
    r"L[’']AP-HP\s*collecte\s*vos\s*données\s*administratives|"
    r"L[’']Assistance\s*Publique\s*-\s*Hôpitaux\s*de\s*Paris\s*"
    r"\(?AP-HP\)?\s*a\s*créé\s*une\s*base\s*de\s*données)"
    r".{0,2000}https?:\/\/recherche\.aphp\.fr\/eds\/droit-opposition[\s\.]*)"
)
_INFO_2 = (
    r"(?si:l’arrêt\s*du\s*tabac\s*permet\s*de\s*diminuer\s*le\s*risque\s*"
    r"de\s*maladie\s*cardiovasculaire.)"
)
_DATE = r"\b\d\d/\d\d/\d\d\d\d\b"
_IPP = r"80\d{8}"
_PAGE = r"((^\d\/\d\s?)|(^\d\d?\/\d\d\?))"
_FOOTER = (
    rf"(?i:({_PAGE}.*\n?pat.*(ipp)?.*\n?(courrier valid.*)?)"
    rf"|(.*{_DATE}.*{_IPP}.*)|(imprim.\sle\s{_DATE}.*\d/\d.*\n?pat.*{_DATE}))"
)
POLLUTION_PATTERNS = {
    "information": [_INFO_1, _INFO_2],
    "bars": [r"(?i:([nbw]|_|-|=){5,})"],
    "biology": [r"(\b.*[|¦].*\n)+"],
    "doctors": [r"(?mi:(^((dr)|(pr))(\.|\s|of).*)+)"],
    "web": [r"(www\.\S*)", r"(\S*@\S*)", r"\S*\.(?:fr|com|net|org)"],
    "coding": [r".*? \(\d+\) [a-zA-Z]\d{2,4}.*?(\n|[a-zA-Z]\d{2,4})"],
    "footer": [_FOOTER],
}
# Reference default_enabled (patterns.py:57-66): biology and coding are
# off by default (high false-positive rate on real notes).
DEFAULT_ENABLED = ("information", "bars", "doctors", "web", "footer")


class PollutionTagger(Transformer):
    requires = ("note_id", "note_text")
    name = "eds.pollution"

    def __init__(self, patterns: dict[str, list[str]] | None = None,
                 enabled: tuple[str, ...] = DEFAULT_ENABLED,
                 text_col: str = "note_text"):
        self.patterns = patterns or {
            k: v for k, v in POLLUTION_PATTERNS.items() if k in enabled}
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
