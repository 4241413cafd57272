"""eds tokenizer as a Transformer adding a nested ``tokens`` column.

Parity target: the reference's single-regex French clinical tokenizer
(edsnlp/language.py:46-116).  Fully native (regexp_extract_all + fold,
see functions/text.py) — no UDF, whole-stage codegen, and Catalyst prunes
the column away for queries that never read it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.base import Transformer
from ..functions.text import (
    WORD_REGEX, norm_text, tokenize, tokenize_pretokenized,
)
from .. import registry


class Tokenizer(Transformer):
    """mode='eds': the French-clinical regex tokenizer (exact offsets via
    locate fold).  mode='pretokenized': prefix-sum offsets for corpora
    whose tokens are single-space separated — much cheaper, same schema.
    """

    requires = ("note_text",)
    provides = ("tokens",)
    name = "eds.tokenizer"

    def __init__(self, regex: str = WORD_REGEX, text_col: str = "note_text",
                 out_col: str = "tokens", mode: str = "eds"):
        self.regex = regex
        self.text_col = text_col
        self.out_col = out_col
        self.mode = mode
        self.requires = (text_col,)
        self.provides = (out_col,)

    def transform(self, df: DataFrame) -> DataFrame:
        # The fold expression is thousands of nodes; memoize it per
        # (mode, regex, input name) — it only references F.col(name),
        # so the unresolved tree is reusable across plans
        # (functions/memo.py; measured ~0.4s of driver build per call).
        from ..functions.memo import memo_column
        if self.mode == "pretokenized":
            col = memo_column(
                ("tokenize_pretokenized", self.text_col),
                lambda: tokenize_pretokenized(F.col(self.text_col)))
        else:
            col = memo_column(
                ("tokenize", self.text_col, self.regex),
                lambda: tokenize(F.col(self.text_col), self.regex))
        return df.withColumn(self.out_col, col)


class Normalizer(Transformer):
    """eds.normalizer: adds ``norm_text`` (lower/accents/quotes folded).

    The reference computes a per-token NORM attribute
    (pipes/core/normalizer/normalizer.py:15); our normalizers are
    char-maps, so whole-text NORM preserves char offsets and matchers can
    run on NORM space with TEXT-space spans for free (SURVEY.md §7 hard
    part #1, solved structurally for this subset).
    """

    requires = ("note_text",)
    provides = ("norm_text",)
    name = "eds.normalizer"

    def __init__(self, lowercase: bool = True, accents: bool = True,
                 quotes: bool = True, text_col: str = "note_text",
                 out_col: str = "norm_text"):
        self.lowercase, self.accents, self.quotes = lowercase, accents, quotes
        self.text_col, self.out_col = text_col, out_col
        self.requires = (text_col,)
        self.provides = (out_col,)

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.out_col,
            norm_text(F.col(self.text_col), self.lowercase, self.accents, self.quotes),
        )


@registry.register("eds.tokenizer")
def _make_tokenizer(**kw):
    return Tokenizer(**kw)


@registry.register("eds.normalizer")
def _make_normalizer(**kw):
    return Normalizer(**kw)
