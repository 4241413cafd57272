"""User-facing facade: the reference's composition API on Spark.

Parity target (§3.1): ``nlp = edsnlp.blank("eds"); nlp.add_pipe(...)``
then ``nlp(text)`` for one document or ``nlp.pipe(df)`` for a corpus.
A user of the reference can keep their pipeline-building code shape:

    import edsnlp_spark as es
    nlp = es.blank()
    nlp.add_pipe("eds.matcher", terms={"covid": ["covid", "coronavirus"]})
    nlp.add_pipe("eds.negation")
    entities = nlp.pipe(notes_df)        # distributed
    doc = nlp("Le patient n'a pas le covid.")   # eager single doc

Under the hood every pipe is a Transformer on the notes/entities planes;
``pipe`` wires matcher-style pipes (entity emitters) and qualifier-style
pipes (entity annotators) in add order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import registry
from .base import Pipeline
from ..operators.tokenizer import Normalizer, Tokenizer
from ..operators.sentences import SentenceSegmenter


class SparkNLP:
    """Composition facade; mirrors Pipeline.add_pipe order semantics
    (edsnlp/core/pipeline.py:251-325): later pipes see earlier output."""

    def __init__(self):
        self._prep = Pipeline([Tokenizer(), Normalizer(), SentenceSegmenter()])
        self._emitters = []     # produce entities (matchers)
        self._qualifiers = []   # annotate entities (qualify(notes, ents))
        self.pipe_names: list[str] = []

    def add_pipe(self, name: str, **config) -> "SparkNLP":
        pipe = registry.create(name, **config) if isinstance(name, str) else name
        if hasattr(pipe, "qualify"):
            self._qualifiers.append(pipe)
        elif hasattr(pipe, "entities"):
            self._emitters.append(pipe)
        else:
            self._prep.add_pipe(pipe)
        self.pipe_names.append(getattr(pipe, "name", str(name)))
        return self

    def prepare(self, notes: DataFrame) -> DataFrame:
        """notes plane with tokens/norm/sentences (persisted: several
        downstream pipes re-read it)."""
        return self._prep(notes).persist()

    def pipe(self, notes: DataFrame) -> DataFrame:
        """Distributed corpus annotation -> entities plane."""
        from ..functions.span_getters import union_span_groups

        prepared = self.prepare(notes)
        if not self._emitters:
            raise ValueError("no entity-emitting pipe added (eds.matcher, ...)")
        ents = union_span_groups(
            *[m.entities(prepared) for m in self._emitters])
        for q in self._qualifiers:
            ents = q.qualify(prepared, ents)
        return ents

    def __call__(self, text: str, spark: SparkSession | None = None):
        """Eager single-document annotation (reference §3.1): returns the
        list of entity Rows for one text."""
        spark = spark or SparkSession.active()
        df = spark.createDataFrame([(0, text)], "note_id long, note_text string")
        return self.pipe(df).collect()


def blank() -> SparkNLP:
    return SparkNLP()
