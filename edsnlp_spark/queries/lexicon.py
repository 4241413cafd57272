"""Lexicon-matching driver queries: the real terminology dictionaries
(reference drugs.json / cim10.csv.gz, converted to resources/*.parquet)
matched by the LexiconMatcher anchor+verify join, with a DuckDB oracle
that re-derives the same matching from the precomputed NORM keys.

Corpus construction: the synthetic ``documents`` table is English text
with no French drug mentions, so each document is deterministically
paired with one dictionary surface form (doc_id mod |lexicon|) and the
form's normalized key is appended to the text.  Matching then exercises
both the injected mention (guaranteed hit, incl. multi-token forms) and
any incidental collisions between English tokens and lexicon anchors —
and the oracle reproduces the full n-gram semantics, not just the
injection, so sub-term hits (e.g. 'paracetamol' inside
'paracetamol codeine') are checked too.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .relational import _t
from ..core.base import Pipeline
from ..operators.tokenizer import Tokenizer
from ..operators.terminology import LexiconMatcher
from ..resources import resource_path


def _lexicon_notes(spark, sf_dir, resource: str):
    """documents × one-lexicon-form-per-doc, key appended to the text."""
    from ..resources import load_resource
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    lex = load_resource(spark, resource)
    n = lex.count()
    ranked = lex.select("kb_id", "key").withColumn(
        "rn", F.row_number().over(Window.orderBy("kb_id", "key")))
    return (
        docs.withColumn("rn", (F.col("doc_id") % F.lit(n)) + 1)
        .join(F.broadcast(ranked), "rn")
        .select(
            F.col("doc_id").alias("note_id"),
            F.concat_ws(" ", "text", "key").alias("note_text"),
        )
    )


def drugs_lexicon_match(spark, sf_dir):
    """Full ATC drug dictionary (5 789 forms) via LexiconMatcher."""
    notes = Pipeline([Tokenizer(mode="pretokenized")])(
        _lexicon_notes(spark, sf_dir, "drugs"))
    ents = LexiconMatcher("drug", "drugs").entities(notes)
    return ents.select(
        F.col("note_id").alias("doc_id"),
        (F.col("tok_start") + 1).cast("bigint").alias("pos"),
        "kb_id",
        F.col("lexical_variant").alias("term"),
    )


DRUGS_LEXICON_MATCH_SQL = f"""
WITH lex AS (
  SELECT kb_id, key, n FROM read_parquet('{resource_path("drugs")}')
),
ranked AS (
  SELECT kb_id, key, ROW_NUMBER() OVER (ORDER BY kb_id, key) AS rn FROM lex
),
notes AS (
  SELECT d.doc_id, d.text || ' ' || r.key AS note_text
  FROM documents d
  JOIN ranked r ON (d.doc_id % (SELECT COUNT(*) FROM lex)) + 1 = r.rn
),
toklist AS (SELECT doc_id, string_split(note_text, ' ') AS toks FROM notes),
tok AS (
  SELECT doc_id, unnest(toks) AS token,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM toklist
),
terms AS (
  SELECT kb_id, key, n, string_split(key, ' ') AS ktoks,
         string_split(key, ' ')[1] AS anchor
  FROM lex
),
cand AS (
  SELECT t.doc_id, t.pos, m.kb_id, m.n, m.ktoks
  FROM tok t JOIN terms m ON lower(t.token) = m.anchor
),
hit AS (
  SELECT c.doc_id, CAST(c.pos AS BIGINT) AS pos, c.kb_id,
         array_to_string(list_slice(l.toks, c.pos, c.pos + c.n - 1), ' ')
           AS term
  FROM cand c JOIN toklist l USING (doc_id)
  WHERE c.pos + c.n - 1 <= len(l.toks)
    AND list_transform(list_slice(l.toks, c.pos, c.pos + c.n - 1),
                       x -> lower(x)) = c.ktoks
)
SELECT doc_id, pos, kb_id, term FROM hit
"""


QUERIES = {
    "drugs_lexicon_match": (drugs_lexicon_match, DRUGS_LEXICON_MATCH_SQL),
}
