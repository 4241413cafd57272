"""eds.split and eds.explode: document fan-out operators.

eds.split parity (edsnlp/pipes/misc/split/split.py:92-168): split a doc
into fragments by regex (default newlines) with ``max_length`` and
``overlap`` in words; annotations are re-anchored to fragment-local
offsets (subset_doc :50).  Spark: build fragment intervals natively,
``explode``, and re-anchor with column arithmetic.

eds.explode parity (edsnlp/pipes/misc/explode/explode.py:11-116): one
output row per selected span, keeping the full doc context; optional
``filter_expr`` — which we take as a Spark SQL expression string
(safer than the reference's eval'd lambdas, §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..core.base import Transformer
from .. import registry


class SplitDocs(Transformer):
    """Fragment notes into token windows OR regex fragments; emits one
    row per fragment with re-anchored char offsets and fragment-local
    text.

    ``regex`` mode mirrors the reference eds.split
    (pipes/misc/split/split.py:92-168): the document is cut AFTER each
    regex match (the separator stays with the preceding fragment, like
    the reference's subdoc texts), and ``filter_expr`` is a SQL
    predicate over the fragment row (the relational form of the
    reference's eval'd ``filter_expr`` lambda)."""

    requires = ("note_id", "note_text", "tokens")
    name = "eds.split"

    def __init__(self, max_length: int = 100, overlap: int = 0,
                 regex: str | None = None, filter_expr: str | None = None):
        if not 0 <= overlap < max_length:
            raise ValueError("need 0 <= overlap < max_length")
        self.max_length = max_length
        self.step = max_length - overlap
        self.regex = regex
        self.filter_expr = filter_expr
        if regex is not None:
            self.requires = ("note_id", "note_text")

    def _transform_regex(self, df: DataFrame) -> DataFrame:
        # Cut AFTER each match: append a sentinel to every match, split
        # on the sentinel; fragment start = cumulative length of prior
        # fragments (window prefix sum — one shuffle on note_id).
        sent = "\x00"
        parts = F.split(
            F.regexp_replace(F.coalesce(F.col("note_text"), F.lit("")),
                             self.regex, r"$0" + sent),
            sent)
        frags = df.select(
            "note_id",
            F.posexplode(parts).alias("frag_id", "frag_text"),
        ).filter(F.length("frag_text") > 0)
        w = (Window.partitionBy("note_id").orderBy("frag_id")
             .rowsBetween(Window.unboundedPreceding, -1))
        out = frags.select(
            "note_id", "frag_id",
            F.coalesce(F.sum(F.length("frag_text")).over(w), F.lit(0))
             .cast("int").alias("frag_start_char"),
            "frag_text",
        ).withColumn(
            "frag_end_char",
            F.col("frag_start_char") + F.length("frag_text"),
        ).select("note_id", "frag_id", "frag_start_char", "frag_end_char",
                 "frag_text")
        if self.filter_expr:
            out = out.filter(F.expr(self.filter_expr))
        return out

    def transform(self, df: DataFrame) -> DataFrame:
        if self.regex is not None:
            return self._transform_regex(df)
        toks = F.col("tokens")
        n = F.size(toks)
        starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(self.step))
        frags = df.select(
            "note_id", "note_text", "tokens",
            F.explode(starts).alias("frag_tok_start"),
        ).filter((F.col("frag_tok_start") < n) & (n > 0))
        frag_tok_end = F.least(
            F.col("frag_tok_start") + self.max_length, F.size("tokens")
        )
        start_char = F.element_at(
            F.col("tokens"), F.col("frag_tok_start") + 1)["start"]
        end_char = F.element_at(F.col("tokens"), frag_tok_end)["end"]
        return frags.select(
            "note_id",
            (F.col("frag_tok_start") / self.step).cast("int").alias("frag_id"),
            start_char.alias("frag_start_char"),
            end_char.alias("frag_end_char"),
            F.substring(
                "note_text", start_char + 1, end_char - start_char
            ).alias("frag_text"),
        )


class ExplodeEntities(Transformer):
    """One row per entity from the nested ``entities`` column, keeping
    doc context; optional SQL filter over entity fields."""

    requires = ("note_id", "entities")
    name = "eds.explode"

    def __init__(self, filter_expr: str | None = None,
                 keep_cols: tuple[str, ...] = ("note_text",)):
        self.filter_expr = filter_expr
        self.keep_cols = keep_cols

    def transform(self, df: DataFrame) -> DataFrame:
        out = df.select(
            "note_id", *self.keep_cols, F.explode("entities").alias("ent")
        ).select("note_id", *self.keep_cols, "ent.*")
        if self.filter_expr:
            out = out.filter(F.expr(self.filter_expr))
        return out


@registry.register("eds.split")
def _make_split(**kw):
    return SplitDocs(**kw)


@registry.register("eds.explode")
def _make_explode(**kw):
    return ExplodeEntities(**kw)
