"""eds.reason and eds.consultation_dates — config-not-code pipes.

eds.reason (pipes/misc/reason/reason.py:13): hospitalisation-reason
spans, via patterns ("motif de l'hospitalisation : ...") or via the
'motif' section.

eds.consultation_dates (pipes/misc/consultation_dates/
consultation_dates.py:14): date mentions gated by a consultation cue in
the surrounding window — a dates ∩ context join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .matcher import RegexMatcher
from .dates import (
    ABSOLUTE_DATE_RXS, parse_numeric_date, parse_verbose_date,
)
from .sections import SectionSegmenter
from .. import registry

# (?i:...) scoped flag: legal mid-pattern when matchers OR patterns together
REASON_RX = (
    r"(?i:motif\s*(?:de\s*(?:l['’]hospitalisation|la\s*consultation))?"
    r"\s*:?\s*([^\n.]{3,80}))"
)


def reason_spans(notes: DataFrame, use_sections: bool = True) -> DataFrame:
    """(note_id, start_char, end_char, reason_text, source)."""
    rx = RegexMatcher({"reason": [REASON_RX]}, attr="TEXT", native=False)
    pat = rx.entities(notes).select(
        "note_id", "start_char", "end_char",
        F.regexp_replace(
            F.col("lexical_variant"),
            r"(?i)^motif\s*(?:de\s*(?:l['’]hospitalisation|la\s*consultation))?\s*:?\s*",
            "",
        ).alias("reason_text"),
        F.lit("pattern").alias("source"),
    )
    if not use_sections:
        return pat
    secs = SectionSegmenter().sections_table(notes).filter(
        F.col("section") == "motif"
    ).select(
        "note_id", F.col("start_char"),
        F.lit(None).cast("int").alias("end_char"),
        F.lit(None).cast("string").alias("reason_text"),
        F.lit("section").alias("source"),
    )
    return pat.unionByName(secs)


def link_reason_entities(reasons: DataFrame,
                         entities: DataFrame) -> DataFrame:
    """Flag entities contained in a reason span (``is_reason`` — the
    reference's eds.reason ents_reason linking, reason.py span
    containment).  One interval semi-join per entity; pattern-sourced
    reasons use their char interval, section-sourced ones extend from
    the header to end-of-doc (tok_until is already the section bound
    upstream, so start_char suffices as the left edge)."""
    r = reasons.select(
        F.col("note_id").alias("r_note"),
        F.col("start_char").alias("r_s"),
        F.coalesce(F.col("end_char"), F.lit(1 << 30)).alias("r_e"),
    )
    j = entities.join(
        r,
        (entities["note_id"] == r["r_note"])
        & (entities["start_char"] >= r["r_s"])
        & (entities["end_char"] <= r["r_e"]),
        "left",
    )
    return j.groupBy(*entities.columns).agg(
        (F.count("r_note") > 0).alias("is_reason"))


# Full reference cue vocabularies
# (pipes/misc/consultation_dates/patterns.py:1-49)
CONSULT_CUES = [
    "rendez-vous pris", "consultation", r"consultation.{1,8}examen",
    r"\bcs\b", "examen clinique", "de compte rendu", r"date de l'examen",
    "examen realise le", "date de la visite",
    # engine extras kept from v1
    "consulte", "vu en consultation",
]
TOWN_CUES = [
    "paris", "kremlin.bicetre", "creteil", "boulogne.billancourt",
    "villejuif", "clamart", "bobigny", "clichy", "ivry.sur.seine",
    "issy.les.moulineaux", "draveil", "limeil", "champcueil",
    "roche.guyon", "bondy", "colombes", "hendaye", "berck.sur.mer",
    "labruyere", "garches", "sevran", "hyeres",
]
DOC_DATE_CUES = [
    "imprime le", "signe electroniquement", "signe le", "saisi le",
    "dicte le", "tape le", "date de reference", r"date\s*:",
    "dactylographie le", "date du rapport",
]


def consultation_dates(notes: DataFrame, window_chars: int = 60,
                       consultation_mention: bool = True,
                       town_mention: bool = False,
                       document_date_mention: bool = False) -> DataFrame:
    """Date mentions within ``window_chars`` of an enabled cue; the
    emitted ``cue_kind`` says which vocabulary gated the date
    (consultation_dates.py:107-136: the three cue families are
    independently toggleable, town/document-date default off because
    they are high-recall/low-precision)."""
    kinds = {}
    if consultation_mention:
        kinds["consultation"] = CONSULT_CUES
    if town_mention:
        kinds["town"] = TOWN_CUES
    if document_date_mention:
        kinds["document_date"] = DOC_DATE_CUES
    dates = RegexMatcher(
        {"date": ABSOLUTE_DATE_RXS},
        attr="NORM", native=True,
    ).entities(notes)
    cue_pats = {k: ["|".join(rf"(?:{c})" for c in v)]
                for k, v in kinds.items()}
    cues = RegexMatcher(cue_pats, attr="NORM", native=True) \
        .entities(notes).select(
            F.col("note_id").alias("c_note"),
            F.col("label").alias("cue_kind"),
            F.col("start_char").alias("c_s"),
            F.col("end_char").alias("c_e"),
        )
    j = dates.join(
        cues,
        (dates["note_id"] == cues["c_note"])
        & (cues["c_e"] > dates["start_char"] - window_chars)
        & (cues["c_s"] < dates["end_char"] + window_chars),
        "inner",
    )
    parsed = F.coalesce(
        parse_verbose_date(F.col("lexical_variant")),
        parse_numeric_date(F.col("lexical_variant")),
    )
    return j.groupBy("note_id", "start_char", "end_char",
                     "lexical_variant").agg(
        F.min("cue_kind").alias("cue_kind"),
    ).select(
        "note_id", "start_char", "end_char", "lexical_variant", "cue_kind",
        F.date_format(parsed, "yyyy-MM-dd").alias("consultation_date"),
    )


registry.register("eds.reason")(lambda **kw: reason_spans)
registry.register("eds.consultation_dates")(lambda **kw: consultation_dates)
