"""SimstringMatcher: approximate dictionary matching via char n-grams.

Parity target: edsnlp/matchers/simstring.py:52-316 — candidate terms
retrieved from a char-ngram index, kept when a string similarity
(dice/jaccard/cosine/overlap) clears a threshold.

Spark design (SURVEY.md §2.5): the scalable shape is
  1. DISTINCT token surface forms (vocabulary dedup — a 100 TB corpus
     has a tiny vocabulary relative to its token count, so similarity is
     computed once per (form, term), not per occurrence);
  2. explode char n-grams on both sides, equi-join on the gram
     (dictionary side broadcast);
  3. group by (form, term) counting shared grams -> similarity filter;
  4. join matches back to token occurrences.
No UDF anywhere.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, functions as F

from ..core.base import Transformer
from ..functions.text import norm_text
from .. import registry


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct padded char n-grams: '##d', '#di', 'dia', ... 'te#'."""
    padded = F.concat(F.lit("#" * (n - 1)), col, F.lit("#" * (n - 1)))
    k = F.length(padded) - (n - 1)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), k),
        lambda i: padded.substr(i, F.lit(n)),
    ))


def _similarity(shared: Column, na: Column, nb: Column, measure: str) -> Column:
    if measure == "dice":
        return 2 * shared / (na + nb)
    if measure == "jaccard":
        return shared / (na + nb - shared)
    if measure == "overlap":
        return shared / F.least(na, nb)
    if measure == "cosine":
        return shared / F.sqrt(na * nb)
    raise ValueError(f"unknown measure {measure!r}")


class SimstringMatcher(Transformer):
    name = "eds.simstring_matcher"
    requires = ("note_id", "tokens")

    def __init__(self, terms: dict[str, Iterable[str]], threshold: float = 0.75,
                 measure: str = "dice", ngram: int = 3, attr: str = "NORM"):
        """terms: {label: [dictionary forms]} — matched approximately
        against single-token surface forms."""
        self.threshold = threshold
        self.measure = measure
        self.ngram = ngram
        self.attr = attr
        self.term_rows = [
            (self._norm(form), label)
            for label, forms in terms.items() for form in forms
        ]

    def _norm(self, s: str) -> str:
        if self.attr == "TEXT":
            return s
        import unicodedata
        s = "".join(c for c in unicodedata.normalize("NFD", s)
                    if unicodedata.category(c) != "Mn")
        return s.lower()

    def _tok_norm(self, col: Column) -> Column:
        return col if self.attr == "TEXT" else norm_text(col)

    def entities(self, notes: DataFrame) -> DataFrame:
        spark = notes.sparkSession
        terms = spark.createDataFrame(self.term_rows, "term string, label string")
        t_grams = terms.select(
            "term", "label",
            F.size(char_ngrams(F.col("term"), self.ngram)).alias("nb"),
            F.explode(char_ngrams(F.col("term"), self.ngram)).alias("g"),
        )

        occurrences = notes.select(
            "note_id", F.explode("tokens").alias("t")
        ).select(
            "note_id",
            self._tok_norm(F.col("t.text")).alias("form"),
            F.col("t.start").alias("start_char"),
            F.col("t.end").alias("end_char"),
            F.col("t.text").alias("surface"),
            F.col("t.i").alias("tok_start"),
            (F.col("t.i") + 1).alias("tok_end"),
        )
        vocab = occurrences.select("form").distinct()
        v_grams = vocab.select(
            "form",
            F.size(char_ngrams(F.col("form"), self.ngram)).alias("na"),
            F.explode(char_ngrams(F.col("form"), self.ngram)).alias("g"),
        )
        sim = _similarity(F.col("shared"), F.col("na"), F.col("nb"),
                          self.measure)
        matches = (
            v_grams.join(F.broadcast(t_grams), "g")
            .groupBy("form", "term", "label", "na", "nb")
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(sim >= self.threshold)
            .select("form", "term", "label",
                    F.round(sim, 4).alias("similarity"))
        )
        return occurrences.join(matches, "form").select(
            "note_id", "start_char",
            F.col("end_char").cast("int"),
            "label",
            F.col("surface").alias("lexical_variant"),
            F.lit("simstring").alias("span_type"),
            F.col("tok_start").cast("int"),
            F.col("tok_end").cast("int"),
            F.col("term").alias("matched_term"),
            "similarity",
        )

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError("use .entities(notes)")


@registry.register("eds.simstring_matcher")
def _make_simstring(**kw):
    return SimstringMatcher(**kw)
