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
        """Each evidence source is pre-aggregated to ONE row per note
        (a bounded array of section intervals / date mentions), so the
        entity plane takes three equi-joins on ``note_id`` and HOF
        lookups — no join fan-out and no wide re-grouping over every
        entity column.  The earlier join-then-groupBy(*all columns)
        shape shuffled the full entity plane twice and dominated the
        query (~2.5s of a 7.9s sf0.1 run); per-note arrays are bounded
        by note content, so this also holds at cluster scale."""
        # (a) cue-based
        out = self.engine.qualify(notes, entities)

        # (b) section containment: per-note interval array
        secs_agg = self.sections.sections_table(notes).filter(
            F.col("section").isin(*self.section_names)
        ).groupBy("note_id").agg(
            F.collect_list(F.struct(
                F.col("tok_start").alias("s_from"),
                F.col("tok_until").alias("s_until"),
            )).alias("__secs")
        )

        # (c) recency: per-note date mentions sorted by char anchor
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
        dates_agg = dates.groupBy(F.col("d_note").alias("note_id")).agg(
            F.sort_array(F.collect_list(F.struct(
                F.col("d_start"), F.col("d_date")))).alias("__dates")
        )

        j = out.join(secs_agg, "note_id", "left")
        has_dt = "note_datetime" in notes.columns
        if has_dt:
            j = j.join(dates_agg, "note_id", "left").join(
                notes.select("note_id", "note_datetime"), "note_id", "left")
        ts, sc = F.col("tok_start"), F.col("start_char")
        in_sec = F.coalesce(
            F.exists("__secs",
                     lambda s: (ts >= s["s_from"]) & (ts < s["s_until"])),
            F.lit(False))
        if has_dt:
            # nearest preceding mention = last element of the sorted
            # array at or before the entity's char anchor
            prev = F.element_at(
                F.filter("__dates", lambda d: d["d_start"] <= sc), -1)
            old = (
                prev.isNotNull()
                & F.col("note_datetime").isNotNull()
                & (F.datediff(F.col("note_datetime").cast("date"),
                              prev["d_date"]) > self.limit)
            )
        else:
            old = F.lit(False)

        return j.withColumn(
            "history",
            F.col("history_cue") | in_sec | F.coalesce(old, F.lit(False)),
        ).drop("history_cue", "__secs", "__dates", "note_datetime")


@registry.register("eds.history_full")
def _make_history(**kw):
    return HistoryQualifier(**kw)
