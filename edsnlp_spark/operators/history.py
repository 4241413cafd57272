"""eds.history: antecedent-vs-current qualification — cross-pipe.

Parity target: edsnlp/pipes/qualifiers/history/history.py:56 — an entity
is "history" if:
  (a) a history cue precedes it in its boundary (ATCD...)        [cues]
  (b) it sits inside an "antécédents" section                    [sections]
  (c) the nearest preceding date mention is older than
      ``history_limit`` days relative to note_datetime           [dates]

Spark design (SURVEY.md §2.2 join #2): (a) is the shared QualifierEngine;
(b) is an interval-containment join against the sections table; (c) is an
as-of join — nearest preceding date via max_by over a windowed join —
then a timestamp difference against note_datetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .qualifiers import QualifierEngine, HISTORY_CUES
from .sections import SectionSegmenter
from .matcher import RegexMatcher
from .dates import (parse_verbose_date, parse_numeric_date,
                    ABSOLUTE_DATE_RXS)
from .. import registry


class HistoryQualifier:
    def __init__(self, history_limit_days: int = 365,
                 cues: dict | None = None,
                 section_names: tuple[str, ...] = ("antecedents",),
                 sections: SectionSegmenter | None = None,
                 exclude_birthdate: bool = True):
        """``exclude_birthdate`` drops date mentions equal to the
        note's ``birth_datetime`` from the recency evidence (the
        patient's birth date is biographical, not an antecedent marker
        — history.py:224,271,359)."""
        self.limit = history_limit_days
        self.exclude_birthdate = exclude_birthdate
        self.engine = QualifierEngine("history_cue", cues or HISTORY_CUES)
        self.section_names = section_names
        self.sections = sections or SectionSegmenter()
        self.date_matcher = RegexMatcher(
            {"date": ABSOLUTE_DATE_RXS},
            attr="NORM", span_type="date", native=True,
        )

    def date_table(self, notes: DataFrame) -> DataFrame:
        """Date mentions with char anchors + parsed value.

        Cheap pre-gate: every ABSOLUTE_DATE_RXS pattern requires a
        digit, so notes without one skip the multi-family regex pass
        entirely (same coarse-filter-then-exact-scan shape as the
        durations pre-gate; a codegen'd rlike is ~free next to the
        per-family span folds)."""
        gated = notes.filter(F.col("note_text").rlike(r"\d"))
        d = self.date_matcher.entities(gated)
        parsed = F.coalesce(
            parse_verbose_date(F.col("lexical_variant")),
            parse_numeric_date(F.col("lexical_variant")),
        )
        return d.select(
            F.col("note_id").alias("d_note"),
            F.col("start_char").alias("d_start"),
            parsed.alias("d_date"),
        ).filter(F.col("d_date").isNotNull())

    def qualify(self, notes: DataFrame, entities: DataFrame) -> DataFrame:
        # (a) cue-based
        out = self.engine.qualify(notes, entities)

        # (b) section containment (tok interval join)
        secs = self.sections.sections_table(notes).filter(
            F.col("section").isin(*self.section_names)
        ).select(
            F.col("note_id").alias("s_note"),
            F.col("tok_start").alias("s_from"),
            F.col("tok_until").alias("s_until"),
        )
        in_sec = out.join(
            secs,
            (out["note_id"] == secs["s_note"])
            & (out["tok_start"] >= secs["s_from"])
            & (out["tok_start"] < secs["s_until"]),
            "left",
        ).groupBy(*out.columns).agg(
            (F.count("s_note") > 0).alias("in_history_section")
        )

        # (c) recency: nearest preceding date older than the limit
        dates = self.date_table(notes)
        if self.exclude_birthdate and "birth_datetime" in notes.columns:
            bd = notes.select(F.col("note_id").alias("b_note"),
                              F.col("birth_datetime").cast("date")
                              .alias("__bd"))
            dates = dates.join(
                bd, dates["d_note"] == bd["b_note"], "left",
            ).filter(
                F.col("__bd").isNull() | (F.col("d_date") != F.col("__bd"))
            ).drop("b_note", "__bd")
        has_dt = "note_datetime" in notes.columns
        if has_dt:
            base = in_sec.join(
                notes.select(
                    F.col("note_id").alias("n_note"), "note_datetime"),
                in_sec["note_id"] == F.col("n_note"), "left",
            ).drop("n_note")
            j = base.join(
                dates,
                (base["note_id"] == dates["d_note"])
                & (dates["d_start"] <= base["start_char"]),
                "left",
            ).groupBy(*base.columns).agg(
                F.max_by(F.col("d_date"), F.col("d_start")).alias("prev_date")
            )
            old = (
                F.col("prev_date").isNotNull()
                & F.col("note_datetime").isNotNull()
                & (F.datediff(F.col("note_datetime").cast("date"),
                              F.col("prev_date")) > self.limit)
            )
            j = j.withColumn("date_is_old", old)
        else:
            j = in_sec.withColumn("date_is_old", F.lit(False))

        return j.withColumn(
            "history",
            F.col("history_cue") | F.col("in_history_section")
            | F.col("date_is_old"),
        ).drop("history_cue", "in_history_section", "prev_date",
               "date_is_old", "note_datetime")


@registry.register("eds.history_full")
def _make_history(**kw):
    return HistoryQualifier(**kw)
