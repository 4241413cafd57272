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
    # word split across a line break ("diab-\ne?te"): excluding the
    # "-\n" glues the halves back together (patterns.py:44)
    "intraword_split": [r"(?<![\W\d_])-\n"],
}
# Reference default_enabled (patterns.py:57-66): biology and coding are
# off by default (high false-positive rate on real notes).
DEFAULT_ENABLED = ("information", "bars", "doctors", "web", "footer",
                   "intraword_split")


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


def strip_pollution(df: DataFrame, text_col: str = "note_text",
                    pollution_col: str = "pollution",
                    out_col: str = "excluded_text",
                    cuts_col: str | None = None) -> DataFrame:
    """The reference's get_text(attr=..., ignore_excluded=True) analog
    (utils/doc_to_text.py): the document text with pollution spans cut
    out — "diab-\\nète" reads back as "diabète" once the intraword
    split is excluded.  A per-row fold over the (few, sorted) pollution
    intervals.  With ``cuts_col`` set, also emits the cut map
    array<struct<clean_pos,cut_len>> (position in the CLEAN text where
    raw chars were removed) so clean-space matches can be re-anchored
    to raw offsets (see entities_with_exclusions)."""
    text = F.col(text_col)
    zero = F.struct(F.lit(0).cast("int").alias("pos"),
                    F.lit("").alias("out"),
                    F.expr("cast(array() as "
                           "array<struct<clean_pos:int,cut_len:int>>)")
                    .alias("cuts"))

    def step(acc, iv):
        # the reference excludes TOKENS, and an excluded token takes its
        # trailing whitespace with it (get_text over token.text_with_ws)
        # -> extend the cut over the whitespace run after the interval
        trail = F.length(F.regexp_extract(
            F.substring(text, iv["end_char"] + 1, 64), r"^\s+", 0))
        new_end = F.greatest(iv["end_char"] + trail, acc["pos"]).cast("int")
        kept = F.substring(text, acc["pos"] + 1,
                           F.greatest(iv["start_char"] - acc["pos"],
                                      F.lit(0)))
        clean_pos = (F.length(acc["out"]) + F.length(kept)).cast("int")
        return F.struct(
            new_end.alias("pos"),
            F.concat(acc["out"], kept).alias("out"),
            F.array_append(
                acc["cuts"],
                F.struct(clean_pos.alias("clean_pos"),
                         (new_end - F.greatest(iv["start_char"], acc["pos"]))
                         .cast("int").alias("cut_len"))).alias("cuts"),
        )

    folded = F.aggregate(
        F.col(pollution_col), zero, step,
        lambda acc: F.struct(
            F.concat(acc["out"],
                     F.substring(text, acc["pos"] + 1,
                                 F.length(text) - acc["pos"])).alias("out"),
            acc["cuts"].alias("cuts")),
    )
    out = df.withColumn("__strip", folded) \
        .withColumn(out_col, F.col("__strip")["out"])
    if cuts_col is not None:
        out = out.withColumn(cuts_col, F.col("__strip")["cuts"])
    return out.drop("__strip")


def entities_with_exclusions(notes: DataFrame, patterns: dict,
                             attr: str = "TEXT",
                             text_col: str = "note_text") -> DataFrame:
    """RegexMatcher(ignore_excluded=True) analog
    (matchers/regex.py:185-191 + tests/matchers/test_regex.py:66-78):
    match on the pollution-stripped text, then re-anchor spans to RAW
    offsets — so 'pneumopathie à coronavirus' matches across an
    excluded 'NbNbWb...' run, and the raw span (lexical_variant)
    contains the pollution while the clean match drove the semantics.

    ``notes`` must carry the ``pollution`` column (PollutionTagger).
    Adds ``clean_variant`` = the matched text in clean space.
    """
    from .matcher import RegexMatcher
    prepared = strip_pollution(notes, text_col=text_col,
                               cuts_col="__cuts")
    m = RegexMatcher(patterns, attr=attr, text_col="excluded_text") \
        .entities(prepared.select("note_id", "excluded_text"))
    slim = prepared.select("note_id", F.col(text_col).alias("__raw"),
                           F.col("__cuts").alias("__cuts"))
    j = m.join(slim, "note_id")

    def shift(pos, strict):
        cond = (lambda c: c["clean_pos"] < pos) if strict else \
            (lambda c: c["clean_pos"] <= pos)
        return pos + F.aggregate(
            F.filter(F.col("__cuts"), cond),
            F.lit(0), lambda a, c: a + c["cut_len"]).cast("int")

    raw_s = shift(F.col("start_char"), strict=False)
    raw_e = shift(F.col("end_char"), strict=True)
    return j.select(
        "note_id",
        raw_s.cast("int").alias("start_char"),
        raw_e.cast("int").alias("end_char"),
        "label",
        F.substring(F.col("__raw"), raw_s + 1, raw_e - raw_s)
        .alias("lexical_variant"),
        F.col("lexical_variant").alias("clean_variant"),
        "span_type",
    )


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


def entities_ignoring_spaces(notes: DataFrame, patterns: dict,
                             attr: str = "TEXT",
                             text_col: str = "note_text") -> DataFrame:
    """RegexMatcher(ignore_space_tokens=True) analog (eds.spaces +
    tests/matchers/test_regex.py:233-250): whitespace RUNS collapse to
    a single space before matching, and spans re-anchor to RAW offsets
    — 'pneumopathie à      coronavirus' matches the single-space
    pattern with the raw stretched span reported.

    Built on the exclusion machinery: the tail of every whitespace run
    (all but its first char) becomes a cut interval.
    """
    from .matcher import RegexMatcher
    sp = RegexMatcher({"__sp": [r"(?<=\s)\s+"]}, attr="TEXT",
                      span_type="sp", text_col=text_col)
    agg = sp.entities(notes).groupBy(
        F.col("note_id").alias("p_note")).agg(
        F.sort_array(F.collect_list(F.struct("start_char", "end_char")))
        .alias("pollution"))
    prepared = notes.join(agg, F.col("note_id") == F.col("p_note"),
                          "left").drop("p_note").withColumn(
        "pollution",
        F.coalesce(F.col("pollution"), F.expr(
            "cast(array() as array<struct<start_char:int,end_char:int>>)")))
    return entities_with_exclusions(prepared, patterns, attr=attr,
                                    text_col=text_col)


@registry.register("eds.pollution")
def _make_pollution(**kw):
    return PollutionTagger(**kw)
