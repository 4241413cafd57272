"""Matchers: the engine's scan predicates → entities plane.

PhraseMatcher parity: EDSPhraseMatcher (edsnlp/matchers/phrase.pyx:25-177)
matches a term dictionary over token attributes (TEXT/LOWER/NORM).  Spark
design: tokenize the dictionary once on the driver, build token n-grams of
each needed length natively on the nested tokens column, then
broadcast-hash-join n-grams against the terms table — the classic
broadcast join; zero shuffle on the notes side, scales to any corpus size
with the dictionary staying driver/broadcast-side.  For 100k+-term
dictionaries (UMLS tier) the same join simply stops being broadcast and
Catalyst/AQE picks a shuffle hash join keyed by the n-gram — still fully
relational.

RegexMatcher parity: edsnlp/matchers/regex.py:166-494 — regex scan over
TEXT or NORM with char matches aligned back to spans.  Because our NORM is
length-preserving (see operators/tokenizer.py), TEXT/NORM offsets
coincide; exact match offsets come from an Arrow-batched ``mapInPandas``
(re.finditer).  A native variant (`native=True`) uses
regexp_extract_all + in-order locate folding — exact whenever the pattern
has no zero-width assertions that can reject earlier occurrences of an
identical match string.

Output schema = the entities plane (schemas.ENTITIES_SCHEMA) + tok_start /
tok_end / sent anchors when produced from tokens.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core.base import Transformer
from ..functions.text import WORD_REGEX, let_bound, norm_text, py_norm_text
from .. import registry

# Zero-width regex constructs that make the native locate-fold unsound:
# regexp_extract_all returns the matched STRING, and locate() finds its
# earliest occurrence at-or-after the cursor — which a \b / lookaround
# may have rejected at that position (e.g. '125/09/2021 ... 25/09/2021'
# locates inside the first run).  Over-detection (escaped literals) is
# safe: it only routes to the exact UDF path.  '^' is only an anchor
# OUTSIDE a character class — '[^...]' negation must not trip the guard
# (it sent the quotation pattern '"[^"]*"' to Python for no reason).
_ZERO_WIDTH_RX = re.compile(r"\\b|\\B|\(\?=|\(\?!|\(\?<|(?<!\[)\^|\$")


def _scope_flags(p: str) -> str:
    """Rewrite a leading global-flag group ``(?i)rest`` into the scoped
    form ``(?i:rest)``: Python re (unlike Java) rejects global flags that
    are not at the very start of the whole expression, which breaks
    ``(?:...)``-wrapped alternation joins."""
    m = re.match(r"\(\?([aimsxu]+)\)", p)
    if m:
        return f"(?{m.group(1)}:{p[m.end():]})"
    return p


def _tokenize_term(term: str, regex: str = WORD_REGEX) -> list[str]:
    return re.findall(regex, term)


class PhraseMatcher(Transformer):
    """Dictionary matcher: terms -> entities via n-gram broadcast join."""

    requires = ("note_id", "tokens")
    provides = ("entities",)
    name = "eds.matcher"

    def __init__(self, terms: dict[str, Iterable[str]], attr: str = "NORM",
                 span_type: str = "ents", tokens_col: str = "tokens",
                 text_col: str = "note_text"):
        """terms: {label: [surface forms]} — mirrors GenericMatcher
        (pipes/core/matcher/matcher.py:15)."""
        self.attr = attr
        self.span_type = span_type
        self.tokens_col = tokens_col
        self.text_col = text_col
        self.requires = ("note_id", tokens_col)
        # Driver-side: tokenize every term with the same rules as the corpus.
        self.term_rows: list[tuple[str, str, int]] = []  # (ngram_key, label, n)
        for label, forms in terms.items():
            for form in forms:
                toks = _tokenize_term(self._norm(form))
                if toks:
                    self.term_rows.append((" ".join(toks), label, len(toks)))
        self.ns = sorted({n for _, _, n in self.term_rows})

    def _norm(self, s: str) -> str:
        if self.attr == "TEXT":
            return s
        if self.attr == "LOWER":
            return s.lower()
        # NORM: the same char-table fold as the corpus-side norm_text —
        # one shared normalization across driver terms, the UDF path,
        # and the Column expression (so terms with typographic
        # apostrophes or chars outside the table behave identically).
        return py_norm_text(s)

    def _tok_attr(self, tok):
        t = tok["text"]
        if self.attr == "TEXT":
            return t
        if self.attr == "LOWER":
            return F.lower(t)
        return norm_text(t)

    def entities(self, df: DataFrame) -> DataFrame:
        """Return the matched entities as their own DataFrame (flat plane).

        Cost shape (measured, round 3): HOF lambdas are interpreted per
        element, so each token must be attr-normalized exactly ONCE (a
        single transform pass) rather than once per (position, offset)
        inside the n-gram builder — and the per-position key build is a
        JVM ``slice``+``array_join`` over the let-bound normalized array
        instead of n ``element_at`` + n char-map normalizations.
        """
        spark = df.sparkSession
        terms_df = spark.createDataFrame(
            self.term_rows, "ngram_key string, label string, n int"
        )
        toks = F.col(self.tokens_col)
        norm_toks = F.transform(toks, self._tok_attr)
        bound = F.struct(toks.alias("tk"), norm_toks.alias("nt"))

        _EMPTY_GRAMS = (
            "cast(array() as array<struct<ngram_key:string,start_char:int,"
            "end_char:int,tok_start:int,tok_end:int>>)"
        )

        def gram_fn(B, n):
            def fn(j):
                return F.struct(
                    F.array_join(F.slice(B["nt"], j + 1, n), " ")
                    .alias("ngram_key"),
                    F.element_at(B["tk"], j + 1)["start"].alias("start_char"),
                    F.element_at(B["tk"], j + n)["end"].alias("end_char"),
                    F.element_at(B["tk"], j + 1)["i"].alias("tok_start"),
                    (F.element_at(B["tk"], j + n)["i"] + 1).cast("int")
                    .alias("tok_end"),
                )
            return fn

        def with_bound(B):
            grams = []
            for n in self.ns:
                idx = F.sequence(F.lit(0), F.size(B["tk"]) - n)
                grams.append(
                    F.when(
                        F.size(B["tk"]) >= n,
                        F.transform(idx, gram_fn(B, n)),
                    ).otherwise(F.expr(_EMPTY_GRAMS))
                )
            return F.flatten(F.array(*grams))

        # the n-gram builder is a pure function of (attr, tokens_col,
        # n-set) column names — a large nested-HOF tree (py4j-chatty),
        # built once per (gateway, config) and reused across plans
        # (r15, the r4 memo_column rule)
        from ..functions.memo import memo_column
        grams_col = memo_column(
            ("phrase_grams", self.attr, self.tokens_col,
             tuple(self.ns)),
            lambda: let_bound(bound, with_bound))
        exploded = (
            df.select("note_id", F.col(self.text_col).alias("__text"),
                      F.explode(grams_col).alias("g"))
            .select("note_id", "__text", "g.*")
        )
        joined = exploded.join(F.broadcast(terms_df), "ngram_key", "inner")
        return joined.select(
            "note_id",
            F.col("start_char").cast("int"),
            F.col("end_char").cast("int"),
            F.col("label"),
            F.substring(
                F.col("__text"), F.col("start_char") + 1,
                F.col("end_char") - F.col("start_char")
            ).alias("lexical_variant"),
            F.lit(self.span_type).alias("span_type"),
            "tok_start", "tok_end",
        )

    def transform(self, df: DataFrame) -> DataFrame:
        """Attach matches as a nested ``entities`` column (doc-wise view)."""
        ents = self.entities(df)
        agg = ents.groupBy("note_id").agg(
            F.sort_array(F.collect_list(F.struct(
                "start_char", "end_char", "label", "lexical_variant",
                "span_type", "tok_start", "tok_end"
            ))).alias("entities")
        )
        return df.join(agg, "note_id", "left").withColumn(
            "entities",
            F.coalesce(F.col("entities"), F.expr(
                "cast(array() as array<struct<start_char:int,end_char:int,"
                "label:string,lexical_variant:string,span_type:string,"
                "tok_start:int,tok_end:int>>)"
            )),
        )


class RegexMatcher(Transformer):
    """Regex scan -> entities plane with exact char offsets."""

    requires = ("note_id",)
    name = "eds.regex_matcher"

    def __init__(self, patterns: dict[str, Iterable[str]], attr: str = "TEXT",
                 span_type: str = "ents", text_col: str = "note_text",
                 flags: int = 0, native: bool = False,
                 span_from_group: bool = False):
        """span_from_group: emit the first non-null capturing group's span
        instead of the whole match (regex.py:192 semantics; UDF path)."""
        self.patterns = {k: list(v) for k, v in patterns.items()}
        self.attr = attr
        self.span_type = span_type
        self.text_col = text_col
        self.flags = flags
        self.native = native
        self.span_from_group = span_from_group
        self.requires = ("note_id", text_col)

    def _match_col(self, df: DataFrame):
        if self.attr == "NORM":
            return norm_text(F.col(self.text_col))
        if self.attr == "LOWER":
            return F.lower(F.col(self.text_col))
        return F.col(self.text_col)

    def entities(self, df: DataFrame) -> DataFrame:
        # native="unchecked" skips the soundness guard (caller asserts no
        # zero-width assertions can shift a locate); plain native=True
        # auto-routes unsafe patterns to the exact UDF path.
        if self.native:
            unsafe = any(
                _ZERO_WIDTH_RX.search(p)
                for pats in self.patterns.values() for p in pats
            )
            if self.native == "unchecked" or not unsafe:
                return self._entities_native(df)
        return self._entities_udf(df)

    def _entities_native(self, df: DataFrame) -> DataFrame:
        """regexp_extract_all + in-order locate fold (no Python).

        Offsets come from a cursor-advancing ``locate`` fold over the
        match list.  Two structural costs are engineered away (same
        findings as the round-3 tokenizer rewrite, see
        functions/text.py): the normalized haystack is LET-BOUND so the
        per-element lambda reads a bound variable instead of
        re-normalizing the whole document per match, and the span
        starts accumulate chunk-wise (bounded ``cur`` array + chunk
        list) so fold accumulator copies stay O(chunk), linear overall.
        """
        _EMPTY_I = "cast(array() as array<int>)"
        _EMPTY_II = "cast(array() as array<array<int>>)"
        CH = 64
        src0 = F.coalesce(self._match_col(df), F.lit(""))
        parts = []
        def make_with_src(rx):
            # closure factory, NOT a default arg: pyspark treats a
            # 2-arg lambda as (element, index) (CLAUDE.md gotcha)
            def with_src(B):
                matches = F.regexp_extract_all(B["s"], F.lit(rx), F.lit(0))
                zero = F.struct(
                    F.lit(0).cast("int").alias("pos"),
                    F.expr(_EMPTY_I).alias("cur"),
                    F.expr(_EMPTY_II).alias("lps"),
                )

                def step(acc, m):
                    start = (F.call_function("locate", m, B["s"],
                                             acc["pos"] + 1) - 1).cast("int")
                    new_pos = (F.call_function("locate", m, B["s"],
                                               acc["pos"] + 1)
                               + F.length(m) - 1).cast("int")
                    new_cur = F.array_append(acc["cur"], start)
                    closed = F.struct(
                        new_pos.alias("pos"), F.expr(_EMPTY_I).alias("cur"),
                        F.array_append(acc["lps"], new_cur).alias("lps"))
                    opened = F.struct(new_pos.alias("pos"),
                                      new_cur.alias("cur"),
                                      acc["lps"].alias("lps"))
                    return F.when(F.size(new_cur) >= F.lit(CH),
                                  closed).otherwise(opened)

                starts = F.aggregate(
                    matches, zero, step,
                    lambda acc: F.flatten(
                        F.when(F.size(acc["cur"]) > 0,
                               F.array_append(acc["lps"], acc["cur"]))
                        .otherwise(acc["lps"])))
                return F.zip_with(
                    matches, starts,
                    lambda m, s: F.struct(
                        s.alias("start_char"),
                        (s + F.length(m)).cast("int").alias("end_char")))

            return with_src

        for label, pats in self.patterns.items():
            rx = "|".join(f"(?:{p})" for p in pats)
            spans = let_bound(F.struct(src0.alias("s")), make_with_src(rx))
            parts.append(
                df.select(
                    "note_id", F.col(self.text_col).alias("__text"),
                    F.explode(spans).alias("s")
                ).select(
                    "note_id", F.col("s.start_char"), F.col("s.end_char"),
                    F.lit(label).alias("label"),
                    F.substring(F.col("__text"), F.col("s.start_char") + 1,
                                F.col("s.end_char") - F.col("s.start_char"))
                    .alias("lexical_variant"),
                    F.lit(self.span_type).alias("span_type"),
                    F.col("s.start_char").alias("full_start"),
                    F.col("s.end_char").alias("full_end"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def entities_grouped(self, df: DataFrame) -> DataFrame:
        """Arrow path, ONE output row per note with >=1 match:
        ``(note_id, __text, ms array<struct<start_char, end_char,
        label, lexical_variant, full_start, full_end>>)``.

        mapInPandas is a map — the input partitioning survives — so a
        consumer that resolves overlaps / classifies per note can do it
        IN-ROW with array folds instead of a groupBy("note_id") shuffle
        over one-row-per-match output, and it gets the source text for
        free instead of re-joining the notes plane (r4: shaved the two
        shuffles out of temporal_mentions)."""
        compiled = [
            (label, re.compile(
                "|".join(f"(?:{_scope_flags(p)})" for p in pats), self.flags))
            for label, pats in self.patterns.items()
        ]
        text_col = self.text_col
        attr = self.attr
        from_group = self.span_from_group
        out_schema = (
            "note_id long, __text string, ms array<struct<"
            "start_char:int,end_char:int,label:string,"
            "lexical_variant:string,full_start:int,full_end:int>>"
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            norm = py_norm_text
            for pdf in batches:
                rows = []
                for note_id, text in zip(pdf["note_id"], pdf[text_col]):
                    if text is None:
                        continue
                    hay = norm(text) if attr == "NORM" else (
                        text.lower() if attr == "LOWER" else text)
                    ms = []
                    for label, rx in compiled:
                        for m in rx.finditer(hay):
                            fs, fe = m.start(), m.end()
                            s, e = fs, fe
                            if from_group and m.lastindex:
                                for gi in range(1, m.lastindex + 1):
                                    if m.group(gi) is not None:
                                        s, e = m.span(gi)
                                        break
                            ms.append((s, e, label, text[s:e], fs, fe))
                    if ms:
                        rows.append((note_id, text, ms))
                yield pd.DataFrame(rows, columns=["note_id", "__text", "ms"])

        return df.select("note_id", text_col).mapInPandas(run, out_schema)

    def _entities_udf(self, df: DataFrame) -> DataFrame:
        """Arrow-batched mapInPandas with re.finditer — exact semantics,
        the reference's own algorithm class (regex.py:166-494)."""
        compiled = [
            (label, re.compile(
                "|".join(f"(?:{_scope_flags(p)})" for p in pats), self.flags))
            for label, pats in self.patterns.items()
        ]
        span_type = self.span_type
        text_col = self.text_col
        attr = self.attr
        from_group = self.span_from_group
        out_schema = (
            "note_id long, start_char int, end_char int, label string, "
            "lexical_variant string, span_type string, "
            "full_start int, full_end int"
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # Same normalization as norm_text / driver-side terms — and
            # length-preserving, so text[s:e] offsets stay aligned with
            # the NORM haystack (the NFD strip used before this was not).
            norm = py_norm_text

            for pdf in batches:
                rows = []
                for note_id, text in zip(pdf["note_id"], pdf[text_col]):
                    if text is None:
                        continue
                    hay = norm(text) if attr == "NORM" else (
                        text.lower() if attr == "LOWER" else text)
                    for label, rx in compiled:
                        for m in rx.finditer(hay):
                            fs, fe = m.start(), m.end()
                            s, e = fs, fe
                            if from_group and m.lastindex:
                                for gi in range(1, m.lastindex + 1):
                                    if m.group(gi) is not None:
                                        s, e = m.span(gi)
                                        break
                            rows.append((note_id, s, e, label, text[s:e],
                                         span_type, fs, fe))
                yield pd.DataFrame(
                    rows, columns=["note_id", "start_char", "end_char",
                                   "label", "lexical_variant", "span_type",
                                   "full_start", "full_end"])

        return df.select("note_id", text_col).mapInPandas(run, out_schema)

    def entities_with_groupdict(self, df: DataFrame) -> DataFrame:
        """Matches + NAMED capture groups as spans — the reference's
        ``match_with_groupdict_as_spans`` (matchers/regex.py +
        tests/matchers/test_regex.py:221-231): each row carries a
        ``groups`` map of group name -> struct<start_char, end_char,
        text> for the groups that participated in the match."""
        compiled = [
            (label, re.compile(
                "|".join(f"(?:{_scope_flags(p)})" for p in pats), self.flags))
            for label, pats in self.patterns.items()
        ]
        span_type = self.span_type
        text_col = self.text_col
        attr = self.attr
        out_schema = (
            "note_id long, start_char int, end_char int, label string, "
            "lexical_variant string, span_type string, "
            "groups map<string,struct<start_char:int,end_char:int,"
            "text:string>>"
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for note_id, text in zip(pdf["note_id"], pdf[text_col]):
                    if text is None:
                        continue
                    hay = py_norm_text(text) if attr == "NORM" else (
                        text.lower() if attr == "LOWER" else text)
                    for label, rx in compiled:
                        for m in rx.finditer(hay):
                            gd = {}
                            for name, val in (m.groupdict() or {}).items():
                                if val is None:
                                    continue
                                gs, ge = m.span(name)
                                gd[name] = {"start_char": gs,
                                            "end_char": ge,
                                            "text": text[gs:ge]}
                            rows.append((note_id, m.start(), m.end(),
                                         label, text[m.start():m.end()],
                                         span_type, gd))
                yield pd.DataFrame(
                    rows, columns=["note_id", "start_char", "end_char",
                                   "label", "lexical_variant",
                                   "span_type", "groups"])

        return df.select("note_id", text_col).mapInPandas(run, out_schema)

    def transform(self, df: DataFrame) -> DataFrame:
        ents = self.entities(df)
        agg = ents.groupBy("note_id").agg(
            F.sort_array(F.collect_list(F.struct(
                "start_char", "end_char", "label", "lexical_variant", "span_type"
            ))).alias("entities")
        )
        return df.join(agg, "note_id", "left")


@registry.register("eds.matcher")
def _make_matcher(terms=None, regex=None, attr="NORM", **kw):
    if regex:
        return RegexMatcher(regex, attr=attr, **kw)
    return PhraseMatcher(terms or {}, attr=attr, **kw)
