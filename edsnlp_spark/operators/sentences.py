"""eds.sentences: rule-based sentence segmentation, fully native.

Parity target: the reference's Cython splitter
(edsnlp/pipes/core/sentences/fast_sentences.pyx:63-146, wrapper
sentences.py:60-210) — an exact port of its state machine:

* state = (seen_period, newline_count) carried across tokens;
* a pending state (seen_period OR newline_count >= min_newline_count)
  breaks at the next word-like token: always after a sentence
  punctuation mark, and after newlines only when the token is
  capitalized (its spaCy shape is in ``capitalized_shapes``), a bullet
  starter (when enabled), or ``hard_newline_count`` newlines were seen;
* a digit right after a period cancels the pending period without
  breaking ("02.04.2018" stays one sentence);
* punctuation-class tokens keep the pending state alive; any other
  token consumes it.

The reference tokenizer emits one token per newline; ours treats
whitespace as inter-token gaps, so newline counts are derived from the
gap text (a tab in the gap resets the count, like the reference's tab
token resetting ``newline_count``).

Implementation: one pass builds per-token (gap newline count, tab flag,
punctuation flag) structs; a single fold with scalar state + the
sentence-start list runs the machine (expensive predicates — unicode
punct / digit / shape — sit in lazily-evaluated CaseWhen branches, so
they only run while a boundary is pending).  No UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..core.base import Transformer
from ..functions.text import let_bound
from .. import registry

# Reference punctuation set (pipes/core/sentences/terms.py).
PUNCT_CHARS = ("!", ".", "?", "܂", "‼", "‽", "⁇", "⁈", "⁉",
               "﹖", "﹗", "！", "．", "？")

# Reference bullet starters (sentences.py:14-18).
DEFAULT_BULLET_STARTERS = (
    "-", "_", "*", "•", "·", "", "⁃", "‣", "⁎", "⁑", "+",
    "→", "⇒", "⇨", "➔", "➜", "➝", "➞", "➟", "➠", "➡", "➡️",
)

# Kept for API parity with the previous engine versions.
TERMINAL = PUNCT_CHARS


def generate_capitalized_shapes(upper_min: int = 2, upper_max: int = 13,
                                x_min: int = 2, x_max: int = 12,
                                include_all_caps: bool = True,
                                include_titlecase: bool = True,
                                include_apostrophe: bool = True,
                                ) -> tuple[str, ...]:
    """spaCy ``token.shape_`` patterns for capitalized line starts
    (reference sentences.py:21-47)."""
    shapes: list[str] = []
    if include_all_caps:
        shapes += ["X" * i for i in range(upper_min, upper_max + 1)]
    if include_titlecase:
        shapes += ["X" + "x" * (i - 1) for i in range(x_min, x_max + 1)]
    if include_apostrophe:
        shapes.append("X'")
    return tuple(shapes)


DEFAULT_CAPITALIZED_SHAPES = generate_capitalized_shapes(
    upper_min=2, upper_max=13, x_min=2, x_max=12, include_apostrophe=True)
LEGACY_CAPITALIZED_SHAPES = ("X'", "Xx", "Xxx", "Xxxx", "Xxxxx")


def token_shape(col: Column) -> Column:
    """spaCy-compatible word shape: upper -> X, other letters -> x,
    digits -> d, runs longer than 4 collapsed to 4.  Control-char
    placeholders avoid the replaced 'X'/'x'/'d' being re-matched as
    letters by the later class replacements."""
    s = F.regexp_replace(col, r"\p{Lu}", "\x01")
    s = F.regexp_replace(s, r"\p{L}", "\x02")
    s = F.regexp_replace(s, r"\p{Nd}", "\x03")
    s = F.translate(s, "\x01\x02\x03", "Xxd")
    return F.regexp_replace(s, r"(.)\1{4,}", "$1$1$1$1")


_EMPTY_SENTS = ("cast(array() as array<struct<sent_id:int,start:int,end:int,"
                "tok_start:int,tok_end:int>>)")
_EMPTY_INT = "cast(array() as array<int>)"


class SentenceSegmenter(Transformer):
    requires = ("note_text", "tokens")
    provides = ("sentences",)
    name = "eds.sentences"

    def __init__(self,
                 punct_chars: tuple[str, ...] | None = None,
                 check_capitalized: bool = True,
                 capitalized_mode: str = "expanded",
                 capitalized_shapes: tuple[str, ...] | None = None,
                 min_newline_count: int = 1,
                 hard_newline_count: int | None = None,
                 use_bullet_start: bool = False,
                 bullet_starters: tuple[str, ...] | None = None,
                 excluded_newlines_col: str | None = None,
                 terminal: tuple[str, ...] | None = None,
                 newline_breaks: bool = True,
                 text_col: str = "note_text", tokens_col: str = "tokens",
                 out_col: str = "sentences"):
        """Arguments mirror the reference factory (sentences.py:156-210);
        ``terminal`` / ``newline_breaks`` are kept from this engine's
        earlier API (terminal maps to punct_chars, newline_breaks=False
        disables the newline rules entirely).

        excluded_newlines_col: optional column holding an array<int> of
        0-based char offsets of newline characters to IGNORE (the
        eds.endlines integration — reference EXCLUDED tags on newline
        tokens, fast_sentences.pyx:90-91)."""
        self.punct_chars = tuple(terminal if terminal is not None
                                 else (punct_chars if punct_chars is not None
                                       else PUNCT_CHARS))
        self.check_capitalized = check_capitalized
        if capitalized_shapes is not None:
            self.shapes = tuple(capitalized_shapes)
        elif capitalized_mode == "legacy":
            self.shapes = LEGACY_CAPITALIZED_SHAPES
        else:
            self.shapes = DEFAULT_CAPITALIZED_SHAPES
        self.min_newline_count = (min_newline_count if newline_breaks
                                  else 1 << 30)
        self.hard_newline_count = (-1 if hard_newline_count is None
                                   else hard_newline_count)
        self.use_bullet_start = use_bullet_start
        self.bullet_starters = tuple(bullet_starters
                                     if bullet_starters is not None
                                     else DEFAULT_BULLET_STARTERS)
        self.excluded_newlines_col = excluded_newlines_col
        self.text_col, self.tokens_col, self.out_col = (
            text_col, tokens_col, out_col)
        self.requires = (text_col, tokens_col)
        self.provides = (out_col,)

    def _elements(self, text: Column, toks: Column) -> Column:
        """Per-token struct (i, t, nl, tab, pc): gap-derived newline
        count (after the last tab, minus excluded newlines), tab flag,
        and punct-chars membership.

        Documents with no newline/tab anywhere (one doc-level check)
        take a fast path that skips the per-token gap machinery — on a
        newline-free corpus the gap substring/translate work was pure
        overhead (~0.9s of negation_tokens at sf0.1)."""
        punct_arr = F.array(*[F.lit(c) for c in self.punct_chars]) \
            if self.punct_chars else F.expr("cast(array() as array<string>)")
        n = F.size(toks)
        idx = F.sequence(F.lit(0), n - 1)

        def elem_full(i):
            cur = F.element_at(toks, i + 1)
            prev_end = F.when(i == 0, F.lit(0)) \
                .otherwise(F.element_at(toks, i)["end"])
            gap = F.substring(text, prev_end + 1, cur["start"] - prev_end)
            has_tab = gap.contains("\t")
            seg = F.when(has_tab, F.substring_index(gap, "\t", -1)) \
                .otherwise(gap)
            nl = (F.length(seg) - F.length(F.translate(seg, "\n\r", "")))
            if self.excluded_newlines_col is not None:
                seg_start = cur["start"] - F.length(seg)
                exc = F.size(F.filter(
                    F.col(self.excluded_newlines_col),
                    lambda p: (p >= seg_start) & (p < cur["start"])))
                nl = F.greatest(nl - exc, F.lit(0))
            return F.struct(
                i.cast("int").alias("i"),
                cur["text"].alias("t"),
                nl.cast("int").alias("nl"),
                has_tab.alias("tab"),
                F.array_contains(punct_arr, cur["text"]).alias("pc"),
            )

        def elem_simple(i):
            cur = F.element_at(toks, i + 1)
            return F.struct(
                i.cast("int").alias("i"),
                cur["text"].alias("t"),
                F.lit(0).cast("int").alias("nl"),
                F.lit(False).alias("tab"),
                F.array_contains(punct_arr, cur["text"]).alias("pc"),
            )

        has_specials = (text.contains("\n") | text.contains("\r")
                        | text.contains("\t"))
        return F.when(has_specials, F.transform(idx, elem_full)) \
            .otherwise(F.transform(idx, elem_simple))

    def _sentence_starts(self, elements: Column) -> Column:
        """The reference state machine (fast_sentences.pyx:84-146) as a
        fold; returns the ascending token indices starting sentences
        (token 0 excluded — always a start)."""
        minc = F.lit(self.min_newline_count)
        hardc = self.hard_newline_count
        bullet_arr = F.array(*[F.lit(c) for c in self.bullet_starters]) \
            if self.bullet_starters \
            else F.expr("cast(array() as array<string>)")
        shapes_arr = F.array(*[F.lit(s) for s in self.shapes]) \
            if self.shapes else F.expr("cast(array() as array<string>)")
        zero = F.struct(
            F.lit(False).alias("seen"),
            F.lit(0).cast("int").alias("nl"),
            F.expr(_EMPTY_INT).alias("starts"),
        )

        def step(acc, e):
            # gap: a tab resets both pending signals, then trailing
            # newlines (already counted after the last tab) accumulate
            seen1 = F.when(e["tab"], F.lit(False)).otherwise(acc["seen"])
            nl1 = F.when(e["tab"], e["nl"]) \
                .otherwise(acc["nl"] + e["nl"]).cast("int")
            pending = seen1 | (nl1 >= minc)
            txt = e["t"]
            # lazily-evaluated predicates (only while pending)
            dg = txt.rlike(r"^\p{Nd}+$")
            bu = F.array_contains(bullet_arr, txt)
            word_like = ~(e["pc"] | (txt.rlike(r"^\p{P}+$") & ~bu))
            digit_guard = seen1 & dg
            cap = F.array_contains(shapes_arr, token_shape(txt))
            hard = (F.lit(hardc >= 0) & (nl1 >= F.lit(max(hardc, 0))))
            brk = pending & ~digit_guard & word_like & (
                seen1 | hard | F.lit(not self.check_capitalized)
                | (F.lit(self.use_bullet_start) & bu) | cap)
            new_seen = (
                F.when(~pending, e["pc"])
                .when(digit_guard, F.lit(False))
                .when(word_like, F.lit(False))
                .otherwise(seen1 | e["pc"])
            )
            # digit-after-period keeps the newline count (the reference
            # `continue` skips the state update); every other path
            # resets it (non-newline token)
            new_nl = (
                F.when(pending & digit_guard, nl1).otherwise(F.lit(0))
            ).cast("int")
            return F.struct(
                new_seen.alias("seen"), new_nl.alias("nl"),
                F.when(brk, F.array_append(acc["starts"], e["i"]))
                .otherwise(acc["starts"]).alias("starts"),
            )

        return F.aggregate(elements, zero, step, lambda acc: acc["starts"])

    def transform(self, df: DataFrame) -> DataFrame:
        # The state-machine fold is a huge expression; it depends only
        # on column NAMES + this instance's config, so the built Column
        # is memoized and reused across plans (functions/memo.py;
        # measured ~0.6s of driver build time per call).
        from ..functions.memo import memo_column
        key = ("sentences_col", self.punct_chars, self.check_capitalized,
               self.shapes, self.min_newline_count, self.hard_newline_count,
               self.use_bullet_start, self.bullet_starters,
               self.excluded_newlines_col, self.text_col, self.tokens_col)
        return df.withColumn(self.out_col,
                             memo_column(key, self._sentences_col))

    def _sentences_col(self) -> Column:
        text, toks = F.col(self.text_col), F.col(self.tokens_col)
        n = F.size(toks)
        starts = self._sentence_starts(self._elements(text, toks))
        starts_all = F.array_distinct(
            F.concat(F.array(F.lit(0).cast("int")), starts))

        def with_starts(SS):
            def sent(s, k):
                nxt = F.coalesce(F.try_element_at(SS, k + 2), n.cast("int"))
                return F.struct(
                    k.cast("int").alias("sent_id"),
                    F.element_at(toks, s + 1)["start"].alias("start"),
                    F.element_at(toks, nxt)["end"].alias("end"),
                    s.cast("int").alias("tok_start"),
                    nxt.cast("int").alias("tok_end"),
                )
            return F.transform(SS, sent)

        sents = let_bound(starts_all, with_starts)
        # Degenerate-doc short-circuit: with no newline/tab and none of
        # the punct chars anywhere in the text, the machine can never
        # pend, so the answer is one whole-document sentence — skip the
        # per-token pass entirely (big win on pretokenized corpora).
        punct_str = "".join(self.punct_chars)
        trivial = (
            ~(text.contains("\n") | text.contains("\r")
              | text.contains("\t"))
            & (F.length(F.translate(text, punct_str, "")) == F.length(text))
        ) if punct_str else F.lit(False)
        one_sent = F.array(F.struct(
            F.lit(0).cast("int").alias("sent_id"),
            F.element_at(toks, 1)["start"].alias("start"),
            F.element_at(toks, n)["end"].alias("end"),
            F.lit(0).cast("int").alias("tok_start"),
            n.cast("int").alias("tok_end"),
        ))
        return (
            F.when(n == 0, F.expr(_EMPTY_SENTS))
            .when(trivial, one_sent)
            .otherwise(sents))


@registry.register("eds.sentences")
def _make_sentences(use_endlines=None, ignore_excluded=None, **kw):
    # use_endlines/ignore_excluded are accepted for reference-config
    # compatibility; exclusion is wired via excluded_newlines_col.
    return SentenceSegmenter(**kw)
