"""Canonical schemas: the two relational planes of the engine.

The reference's data model (SURVEY.md §1.2) is one row per document
("OMOP note", edsnlp/data/converters.py:517-525) in and one row per
entity ("note_nlp" / "ents", converters.py:629-707) out.  We make both
planes explicit, typed DataFrames; every operator is DataFrame -> DataFrame
on one of them.  Tokens and sentences are nested array columns on the
notes plane, computed once and pruned by Catalyst when unused.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- notes plane (input): OMOP note -----------------------------------
NOTES_SCHEMA = T.StructType(
    [
        T.StructField("note_id", T.LongType(), False),
        T.StructField("person_id", T.LongType(), True),
        T.StructField("note_text", T.StringType(), True),
        T.StructField("note_datetime", T.TimestampType(), True),
    ]
)

# token: char-offset interval into note_text plus token index
TOKEN_TYPE = T.StructType(
    [
        T.StructField("i", T.IntegerType(), False),       # token index
        T.StructField("text", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),   # char offset
        T.StructField("end", T.IntegerType(), False),     # char offset (exclusive)
    ]
)
TOKENS_TYPE = T.ArrayType(TOKEN_TYPE)

SENTENCE_TYPE = T.StructType(
    [
        T.StructField("sent_id", T.IntegerType(), False),
        T.StructField("start", T.IntegerType(), False),   # char offsets
        T.StructField("end", T.IntegerType(), False),
        T.StructField("tok_start", T.IntegerType(), False),
        T.StructField("tok_end", T.IntegerType(), False),
    ]
)
SENTENCES_TYPE = T.ArrayType(SENTENCE_TYPE)

# ---- entities plane (output): flat one-row-per-entity -----------------
# Mirrors the reference's "ents" export (converters.py:690-707): char
# offsets are 0-based end-exclusive; lexical_variant = note_text[start:end].
ENTITIES_SCHEMA = T.StructType(
    [
        T.StructField("note_id", T.LongType(), False),
        T.StructField("start_char", T.IntegerType(), False),
        T.StructField("end_char", T.IntegerType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("lexical_variant", T.StringType(), True),
        T.StructField("span_type", T.StringType(), True),
    ]
)

ENTITY_COLS = [f.name for f in ENTITIES_SCHEMA.fields]
