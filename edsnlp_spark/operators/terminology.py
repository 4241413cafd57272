"""eds.terminology: concept dictionary matching (label -> kb_id).

Parity target: edsnlp/pipes/core/terminology/terminology.py:15 — like the
generic matcher but each matched surface form maps to a knowledge-base
concept id (e.g. ATC drugs, ICD-10/cim10); plus the domain NER pipes that
are pure terminology configs (§2.6: eds.drugs, eds.cim10, eds.covid).

Spark design: identical broadcast n-gram join as PhraseMatcher, with the
terms table carrying (term -> kb_id, label); at the ~40k-term cim10 tier
the join flips from broadcast to shuffle automatically past the
autoBroadcastJoinThreshold — no code change.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, functions as F

from ..core.base import Transformer
from .matcher import PhraseMatcher, _tokenize_term
from .. import registry


class TerminologyMatcher(PhraseMatcher):
    name = "eds.terminology"

    def __init__(self, label: str, concepts: dict[str, Iterable[str]],
                 attr: str = "NORM", **kw):
        """concepts: {kb_id: [surface forms]}; output label is the
        terminology name, kb_id is the concept."""
        # Reuse PhraseMatcher machinery with kb_id in the terms table.
        super().__init__({}, attr=attr, **kw)
        self.label = label
        self.term_rows = []
        for kb_id, forms in concepts.items():
            for form in forms:
                toks = _tokenize_term(self._norm(form))
                if toks:
                    self.term_rows.append((" ".join(toks), kb_id, len(toks)))
        self.ns = sorted({n for _, _, n in self.term_rows})

    def entities(self, df: DataFrame) -> DataFrame:
        out = super().entities(df)
        return out.select(
            "note_id", "start_char", "end_char",
            F.lit(self.label).alias("label"),
            F.col("label").alias("kb_id"),
            "lexical_variant", "span_type", "tok_start", "tok_end",
        )


# Domain NER configs (pattern subsets with the reference's structure;
# full dictionaries are data files loaded into the same shape).
COVID_PATTERNS = ["covid", "covid 19", "covid-19", "sars-cov-2", "sars-cov2",
                  "coronavirus", "pandemie"]

DRUGS_SAMPLE = {
    "N02BE01": ["paracetamol", "doliprane", "dafalgan", "efferalgan"],
    "B01AC06": ["aspirine", "kardegic"],
    "N02AA01": ["morphine"],
    "J01CA04": ["amoxicilline", "clamoxyl"],
}

CIM10_SAMPLE = {
    "E11": ["diabete de type 2", "diabete type 2"],
    "I10": ["hypertension", "hta"],
    "J18": ["pneumopathie", "pneumonie"],
    "C50": ["cancer du sein"],
}


@registry.register("eds.terminology")
def _make_terminology(**kw):
    return TerminologyMatcher(**kw)


@registry.register("eds.covid")
def _make_covid(**kw):
    from .matcher import PhraseMatcher
    return PhraseMatcher({"covid": COVID_PATTERNS}, **kw)


@registry.register("eds.drugs")
def _make_drugs(**kw):
    return TerminologyMatcher("drug", DRUGS_SAMPLE, **kw)


@registry.register("eds.cim10")
def _make_cim10(**kw):
    return TerminologyMatcher("cim10", CIM10_SAMPLE, **kw)
