"""PII detection + redaction — the scrubbing step of a training-data
pipeline.

No reference analog: aphp/edsnlp's normalizer removes boilerplate
pollution (edsnlp/pipes/core/normalizer/pollution/pollution.py:1-120),
not identifiers.  Large-scale corpus construction needs both; this
operator covers emails, French phone numbers, French social-security
numbers (NIR) and French IBANs with patterns kept RE2-compatible (no
lookaround, no backreferences) so the SAME regex strings run verbatim
in DuckDB oracles AND stay eligible for the native (JVM, zero-Python)
RegexMatcher path.

Scale posture: detection is the matcher's per-row regexp scan (no
shuffle), redaction is a chain of regexp_replace projections — both
whole-stage-codegen'd, embarrassingly parallel, and column-pruned like
any other projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..core.base import Transformer
from .matcher import RegexMatcher
from .. import registry

# Detection order IS redaction order: longest / most specific first so a
# digit run claimed by an IBAN or NIR is no longer visible to the phone
# pattern when the placeholders go in.
PII_PATTERNS: dict[str, str] = {
    # FR IBAN: FR + 2 check digits + 23 BBAN digits (unspaced form)
    "iban": r"FR\d{25}",
    # NIR: sex(1|2) yy mm(01-12) + 8 position digits [+ 2 key digits]
    "nir": r"[12]\d{2}(?:0[1-9]|1[0-2])\d{8}(?:\d{2})?",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # FR phone: 0X + four 2-digit groups, separators space/dot/dash/none
    "phone": r"0[1-9](?:[ .-]?\d{2}){4}",
}


class PIIScrubber(Transformer):
    """``entities(notes)`` -> one row per PII span (native regex path,
    exact char offsets); ``transform(notes)`` -> adds
    ``note_text_redacted`` with ``[LABEL]`` placeholders."""

    requires = ("note_id", "note_text")
    provides = ("note_text_redacted",)
    name = "eds.pii"

    def __init__(self, patterns: dict[str, str] | None = None,
                 text_col: str = "note_text"):
        self.patterns = dict(patterns or PII_PATTERNS)
        self.text_col = text_col
        self.requires = ("note_id", text_col)
        # none of the shipped patterns carry zero-width constructs, so
        # the matcher keeps them on the JVM locate-fold path
        self._matcher = RegexMatcher(
            {label: [rx] for label, rx in self.patterns.items()},
            attr="TEXT", span_type="pii", text_col=text_col, native=True)

    def entities(self, df: DataFrame) -> DataFrame:
        return self._matcher.entities(df).select(
            "note_id", "start_char", "end_char", "label", "lexical_variant")

    def redacted(self, col: Column) -> Column:
        out = col
        for label, rx in self.patterns.items():
            out = F.regexp_replace(out, rx, f"[{label.upper()}]")
        return out

    def match_count(self, col: Column) -> Column:
        """Total PII matches in ``col`` (sum of per-pattern counts on
        the pre-redaction text — the same counting model as the
        pii_redaction oracle; the shipped patterns are mutually
        disjoint by construction: iban needs 'FR', email needs '@',
        nir/phone differ in the leading digit).  Downstream queries
        carry this so Catalyst cannot prune the PII scan out of a
        composed pipeline whose final projection is metadata-only
        (ADVICE r8 #3)."""
        n: Column = F.lit(0)
        for rx in self.patterns.values():
            n = n + F.regexp_count(col, F.lit(rx))
        return n

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.text_col + "_redacted",
            self.redacted(F.col(self.text_col)))


@registry.register("eds.pii")
def _make_pii(**kw):
    return PIIScrubber(**kw)
