"""eds.sentences: rule-based sentence segmentation, fully native.

Parity target: the reference's Cython splitter
(edsnlp/pipes/core/sentences/fast_sentences.pyx, wrapper sentences.py:60):
a sentence ends at terminal punctuation (. ! ? …) or at a newline
(heuristics on following-uppercase refine this; we implement the
punctuation+newline core, with the uppercase-lookahead gate on
punctuation-free newlines).

Implementation: per-token boundary flags computed with array HOFs over
the nested ``tokens`` column — boundary after token i if token i is
terminal punctuation, or if the inter-token gap (text between token i and
token i+1) contains a newline and token i+1 starts uppercase.  Sentence
ids are the prefix sum of boundary flags.  No UDF, no shuffle: this is a
per-row projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.base import Transformer
from .. import registry

TERMINAL = ("." , "!", "?", "…", ";")


class SentenceSegmenter(Transformer):
    requires = ("note_text", "tokens")
    provides = ("sentences",)
    name = "eds.sentences"

    def __init__(self, terminal: tuple[str, ...] = TERMINAL,
                 newline_breaks: bool = True,
                 text_col: str = "note_text", tokens_col: str = "tokens",
                 out_col: str = "sentences"):
        self.terminal = terminal
        self.newline_breaks = newline_breaks
        self.text_col, self.tokens_col, self.out_col = text_col, tokens_col, out_col
        self.requires = (text_col, tokens_col)
        self.provides = (out_col,)

    def _boundary_flags(self, text, toks):
        """array<int>: 1 if a sentence boundary falls AFTER token i."""
        term = F.array(*[F.lit(t) for t in self.terminal])
        n = F.size(toks)

        def flag(j):
            tok = F.element_at(toks, j + 1)
            is_last = j == n - 1
            punct = F.array_contains(term, tok["text"])
            if not self.newline_breaks:
                return F.when(punct | is_last, 1).otherwise(0)
            nxt = F.element_at(toks, j + 2)
            gap = F.substring(
                text, tok["end"] + 1, F.coalesce(nxt["start"], tok["end"]) - tok["end"]
            )
            nl = F.when(
                is_last, F.lit(False)
            ).otherwise(
                gap.contains("\n")
                & (nxt["text"].substr(1, 1) == F.upper(nxt["text"].substr(1, 1)))
            )
            return F.when(punct | nl | is_last, 1).otherwise(0)

        return F.transform(F.sequence(F.lit(0), n - 1), flag)

    def transform(self, df: DataFrame) -> DataFrame:
        text, toks = F.col(self.text_col), F.col(self.tokens_col)
        flags = self._boundary_flags(text, toks)
        # sent_id of token i = sum(flags[0..i-1]); sentences = group runs.
        # Fold once, building array<struct<sent_id,start,end,tok_start,tok_end>>:
        # maintain (current sentence start token idx, emitted sentences).
        zero = F.struct(
            F.lit(0).cast("int").alias("sstart"),
            F.expr(
                "cast(array() as array<struct<sent_id:int,start:int,end:int,"
                "tok_start:int,tok_end:int>>)"
            ).alias("sents"),
        )
        sents = F.aggregate(
            F.zip_with(toks, flags, lambda t, fl: F.struct(t.alias("t"), fl.alias("f"))),
            zero,
            lambda acc, z: F.when(
                z["f"] == 1,
                F.struct(
                    (z["t"]["i"] + 1).cast("int").alias("sstart"),
                    F.array_append(
                        acc["sents"],
                        F.struct(
                            F.size(acc["sents"]).cast("int").alias("sent_id"),
                            F.element_at(toks, acc["sstart"] + 1)["start"].alias("start"),
                            z["t"]["end"].alias("end"),
                            acc["sstart"].alias("tok_start"),
                            (z["t"]["i"] + 1).cast("int").alias("tok_end"),
                        ),
                    ).alias("sents"),
                ),
            ).otherwise(F.struct(acc["sstart"].alias("sstart"), acc["sents"].alias("sents"))),
            lambda acc: acc["sents"],
        )
        return df.withColumn(self.out_col, F.when(F.size(toks) > 0, sents).otherwise(
            F.expr(
                "cast(array() as array<struct<sent_id:int,start:int,end:int,"
                "tok_start:int,tok_end:int>>)"
            )
        ))


@registry.register("eds.sentences")
def _make_sentences(**kw):
    return SentenceSegmenter(**kw)
