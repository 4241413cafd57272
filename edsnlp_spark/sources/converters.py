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


def from_markup(df: DataFrame, markup_col: str = "markup",
                id_col: str = "note_id") -> tuple[DataFrame, DataFrame]:
    """(notes, entities) from a markup column — the reference's
    MarkupToDocConverter used throughout its test suite.  Markup corpora
    are golden-test sized, so this collects and re-creates (not a hot
    path); large annotated corpora arrive via standoff/parquet instead.
    """
    rows = df.select(F.col(id_col), F.col(markup_col)).collect()
    notes_rows, ent_rows = [], []
    for r in rows:
        text, es = parse_markup(r[markup_col] or "")
        notes_rows.append((r[id_col], text))
        for e in es:
            ent_rows.append((r[id_col], e["start_char"], e["end_char"],
                             e["label"], e["lexical_variant"], "ents",
                             e["attrs"]))
    spark = df.sparkSession
    notes = spark.createDataFrame(notes_rows, "note_id long, note_text string")
    ents = spark.createDataFrame(ent_rows, MARKUP_ENT_DDL) if ent_rows else \
        spark.createDataFrame([], MARKUP_ENT_DDL)
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
