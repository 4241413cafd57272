"""eds.dates: French date mention extraction + normalization, native SQL.

Parity target: edsnlp/pipes/misc/dates/dates.py:28 and models.py:44-460 —
absolute dates ("25 septembre 2021", "25/09/2021"), with partial-date
inference against note_datetime (models.py:104-178: a missing year/month
is filled from the note date), normalized to a DATE.

Spark design (SURVEY.md §2.8): regexp scan + arithmetic — fully native,
whole-stage codegen, DuckDB-oracle checkable.  Relative dates/durations
("il y a 3 jours") are parsed into day offsets applied to note_datetime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..core.base import Transformer
from ..functions.text import norm_text
from .. import registry

FR_MONTHS = [
    "janvier", "fevrier", "mars", "avril", "mai", "juin", "juillet",
    "aout", "septembre", "octobre", "novembre", "decembre",
]
# Accent-folded (matching runs on NORM); also accept common abbreviations.
FR_MONTH_ABBREV = {
    "janv": 1, "fevr": 2, "fev": 2, "avr": 4, "juil": 7, "sept": 9,
    "oct": 10, "nov": 11, "dec": 12,
}

# Verbose date: "25 septembre 2021", "1er mars 1998", "25 sept. 2021"
VERBOSE_DATE_RX = (
    r"\b(\d{1,2})(?:er)?\s+([a-z]+)\.?\s+(\d{4})\b"
)
# Numeric date: 25/09/2021, 25-09-2021, 25.09.2021
NUMERIC_DATE_RX = r"\b(\d{1,2})[/.\-](\d{1,2})[/.\-](\d{4})\b"
# Relative: "il y a 3 jours/semaines/mois/ans"
RELATIVE_RX = r"\bil y a (\d+) (jour|jours|semaine|semaines|mois|an|ans)\b"


def month_number(name: Column) -> Column:
    """French month name/abbrev (accent-folded, lowercase) -> 1..12."""
    full = F.array_position(
        F.array(*[F.lit(m) for m in FR_MONTHS]), name
    ).cast("int")
    out = F.when(full > 0, full)
    for ab, num in FR_MONTH_ABBREV.items():
        out = out.when(name == ab, F.lit(num))
    return out


def parse_verbose_date(text: Column) -> Column:
    """First verbose French date in ``text`` -> DATE (null if none/invalid)."""
    day = F.regexp_extract(text, VERBOSE_DATE_RX, 1)
    mon = F.regexp_extract(text, VERBOSE_DATE_RX, 2)
    year = F.regexp_extract(text, VERBOSE_DATE_RX, 3)
    return F.when(
        (day != "") & (month_number(mon).isNotNull()),
        F.try_to_date(
            F.format_string(
                "%s-%s-%s", year, month_number(mon).cast("string"), day
            ),
            "y-M-d",
        ),
    )


def parse_numeric_date(text: Column) -> Column:
    day = F.regexp_extract(text, NUMERIC_DATE_RX, 1)
    mon = F.regexp_extract(text, NUMERIC_DATE_RX, 2)
    year = F.regexp_extract(text, NUMERIC_DATE_RX, 3)
    return F.when(
        day != "",
        F.try_to_date(F.format_string("%s-%s-%s", year, mon, day), "y-M-d"),
    )


def parse_relative_days(text: Column) -> Column:
    """'il y a N <unit>' -> day offset (negative, into the past)."""
    n = F.regexp_extract(text, RELATIVE_RX, 1)
    unit = F.regexp_extract(text, RELATIVE_RX, 2)
    days_per = (
        F.when(unit.startswith("jour"), 1)
        .when(unit.startswith("semaine"), 7)
        .when(unit == "mois", 30)
        .when(unit.startswith("an"), 365)
    )
    return F.when(n != "", -(n.cast("int") * days_per))


# Partial dates (models.py:104-178): missing components fall back to
# note_datetime.  "en mars" -> (year of note, 3, 1); "le 25" -> (year,
# month of note, 25); "en 2019" -> (2019, 1, 1).
PARTIAL_MONTH_RX = r"\ben ([a-z]+)\b(?!\s+\d{4})"
MONTH_YEAR_RX = r"\ben ([a-z]+) (\d{4})\b"
PARTIAL_DAY_RX = r"\ble (\d{1,2})\b(?![/.\-\d])(?!\s+[a-z]+\s+\d{4})"
PARTIAL_YEAR_RX = r"\ben (\d{4})\b"


def parse_partial_date(text: Column, note_dt: Column) -> Column:
    """First partial date resolved against note_datetime; null when the
    needed component of note_datetime is itself null (the reference's
    nullability rule: inference requires an anchor)."""
    mon_name = F.regexp_extract(text, PARTIAL_MONTH_RX, 1)
    day = F.regexp_extract(text, PARTIAL_DAY_RX, 1)
    year = F.regexp_extract(text, PARTIAL_YEAR_RX, 1)
    my_mon = F.regexp_extract(text, MONTH_YEAR_RX, 1)
    my_year = F.regexp_extract(text, MONTH_YEAR_RX, 2)
    m = month_number(mon_name)
    my_m = month_number(my_mon)
    by_month_year = F.when(
        (my_mon != "") & my_m.isNotNull(),
        F.try_to_date(
            F.format_string("%s-%s-1", my_year, my_m.cast("string")),
            "y-M-d"),
    )
    by_year = F.when(
        year != "", F.try_to_date(F.concat(year, F.lit("-1-1")), "y-M-d"))
    by_month = F.when(
        (mon_name != "") & m.isNotNull() & note_dt.isNotNull(),
        F.try_to_date(
            F.format_string("%s-%s-1", F.year(note_dt).cast("string"),
                            m.cast("string")), "y-M-d"),
    )
    by_day = F.when(
        (day != "") & note_dt.isNotNull(),
        F.try_to_date(
            F.format_string("%s-%s-%s", F.year(note_dt).cast("string"),
                            F.month(note_dt).cast("string"), day), "y-M-d"),
    )
    return F.coalesce(by_month_year, by_month, by_year, by_day)


def date_mentions(notes: DataFrame) -> DataFrame:
    """ALL date mentions with char anchors + parsed values — the dates
    TABLE other pipes consume (eds.history recency, consultation_dates).
    Native regex scan; one row per mention."""
    from .matcher import RegexMatcher
    d = RegexMatcher(
        {"date": [VERBOSE_DATE_RX, NUMERIC_DATE_RX]},
        attr="NORM", span_type="date", native=True,
    ).entities(notes)
    parsed = F.coalesce(
        parse_verbose_date(F.col("lexical_variant")),
        parse_numeric_date(F.col("lexical_variant")),
    )
    return d.select(
        "note_id", "start_char", "end_char", "lexical_variant",
        parsed.alias("parsed_date"),
    )


# Period: "du <date> au <date>" (bounds/periods, dates.py linking logic)
PERIOD_RX = r"\bdu\s+(.{4,30}?)\s+(?:au|jusqu'au)\s+(.{4,30}?)(?=[,.;]|$)"


def parse_period(text: Column) -> Column:
    """First 'du X au Y' period -> struct<start date, end date> (null
    unless both bounds parse)."""
    left = F.regexp_extract(text, PERIOD_RX, 1)
    right = F.regexp_extract(text, PERIOD_RX, 2)

    def any_date(c: Column) -> Column:
        return F.coalesce(parse_verbose_date(c), parse_numeric_date(c))

    start, end = any_date(left), any_date(right)
    return F.when(
        start.isNotNull() & end.isNotNull(),
        F.struct(start.alias("start"), end.alias("end")),
    )


class DatesExtractor(Transformer):
    """Adds ``parsed_date`` (first absolute date mention, normalized) and
    ``relative_date`` (note_datetime + relative offset) columns."""

    requires = ("note_text",)
    provides = ("parsed_date", "relative_date")
    name = "eds.dates"

    def __init__(self, text_col: str = "note_text",
                 note_datetime_col: str = "note_datetime"):
        self.text_col = text_col
        self.dt_col = note_datetime_col
        self.requires = (text_col,)

    def transform(self, df: DataFrame) -> DataFrame:
        # NORM (lower + accent fold), not bare lower: VERBOSE_DATE_RX's
        # month group is [a-z]+, so accented months ("février", "août",
        # "décembre") only parse on folded text — same attr as
        # date_mentions uses.
        text = norm_text(F.col(self.text_col))
        absolute = F.coalesce(parse_verbose_date(text), parse_numeric_date(text))
        out = df.withColumn("parsed_date", absolute)
        if self.dt_col in df.columns:
            rel = parse_relative_days(text)
            out = out.withColumn(
                "relative_date",
                F.when(
                    rel.isNotNull(),
                    F.date_add(F.col(self.dt_col).cast("date"), rel),
                ),
            )
        else:
            out = out.withColumn("relative_date", F.lit(None).cast("date"))
        return out


@registry.register("eds.dates")
def _make_dates(**kw):
    return DatesExtractor(**kw)


# eds.dates_normalizer re-normalizes existing date spans with the same
# parser (misc/dates/factory.py registers both names on one pipe).
registry.register("eds.dates_normalizer")(lambda **kw: DatesExtractor(**kw))
