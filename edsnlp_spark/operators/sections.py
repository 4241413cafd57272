"""eds.sections: header scan -> section intervals via lead() window.

Parity target: edsnlp/pipes/misc/sections/sections.py:13-190 — section
headers from a taxonomy; each section spans from its header to the next
header (or end of doc).  Spark: the header scan is a PhraseMatcher pass;
the interval construction is exactly ``lead(start) over (partition by
note order by start)`` (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window, functions as F

from ..core.base import Transformer
from .matcher import PhraseMatcher
from .. import registry

# Default French clinical section headers (subset of the reference's
# taxonomy, pipes/misc/sections/patterns.py).
DEFAULT_SECTIONS = {
    "antecedents": ["antecedents", "antecedents medicaux", "atcd"],
    "motif": ["motif", "motif de la consultation", "motif d'hospitalisation"],
    "traitement": ["traitement", "traitements", "traitement en cours"],
    "conclusion": ["conclusion", "synthese", "au total"],
    "examen_clinique": ["examen clinique", "examen"],
    "histoire": ["histoire de la maladie", "histoire recente"],
}



# FULL reference section vocabulary (pipes/misc/sections/patterns.py:
# 22 sections / 68 header patterns, mostly literal, 2 regexes).
# Header context per sections.py:134: the header must sit within 5
# chars of both the line start and the line end — re-expressed without
# variable-width lookbehind (unsupported by Python re) as a capturing
# group + span_from_group.
REFERENCE_SECTIONS: dict[str, list[str]] = {
    'allergies': [
        'allergies',
    ],
    'antécédents': [
        'antecedents',
        'antecedents medicaux et chirurgicaux',
        'antecedents personnels',
        'antecedents medicaux',
        'antecedents chirurgicaux',
        'atcd',
    ],
    'antécédents familiaux': [
        'antecedents familiaux',
    ],
    'traitements entrée': [
        'attitude therapeutique initiale',
        "traitement a l'entree",
        'traitement actuel',
        'traitement en cours',
        "traitements a l'entree",
    ],
    'conclusion': [
        'au total',
        'conclusion',
        'conclusion de sortie',
        'syntese medicale / conclusion',
        'synthese',
        'synthese medicale',
        'synthese medicale/conclusion',
        'conclusion medicale',
    ],
    'conclusion entrée': [
        "conclusion a l'entree",
    ],
    'habitus': [
        'contexte familial et social',
        'habitus',
        'mode de vie',
        'mode de vie - scolarite',
        'situation sociale, mode de vie',
    ],
    'correspondants': [
        'correspondants',
    ],
    'diagnostic': [
        'diagnostic retenu',
    ],
    'données biométriques entrée': [
        "donnees biometriques et parametres vitaux a l'entree",
        "parametres vitaux et donnees biometriques a l'entree",
    ],
    'examens': [
        'examen clinique',
        "examen clinique a l'entree",
    ],
    'examens complémentaires': [
        'examen(s) complementaire(s)',
        'examens complementaires',
        "examens complementaires a l'entree",
        "examens complementaires realises a l'entree",
        'examens complementaires realises pendant le sejour',
        'examens para-cliniques',
        'imagerie post-operatoire',
    ],
    'facteurs de risques': [
        'facteurs de risque',
        'facteurs de risques',
    ],
    'histoire de la maladie': [
        'histoire de la maladie',
        'histoire de la maladie - explorations',
        'histoire de la maladie actuelle',
        'histoire du poids',
        'histoire recente',
        'histoire recente de la maladie',
        'rappel clinique',
        'resume',
        'resume clinique',
        'resume clinique - histoire de la maladie',
        'antecedents et histoire de la maladie',
    ],
    'actes': [
        'intervention',
    ],
    'motif': [
        'motif',
        "motif d'hospitalisation",
        "motif de l'hospitalisation",
        'motif medical',
    ],
    'prescriptions': [
        'prescriptions de sortie',
        'prescriptions medicales de sortie',
    ],
    'traitements sortie': [
        'traitement de sortie',
    ],
    'evolution': [
        'evolution',
        'evolution et examen clinique aux lits portes :',
    ],
    'modalites sortie': [
        'modalites de sortie',
        'devenir du patient',
    ],
    'vaccinations': [
        'vaccinations',
        'vaccination',
    ],
    'introduction': [
        "compte.?rendu d'hospitalisation.{0,30}",
    ],
}


def _line_anchored(p: str) -> str:
    """sections.py:134 context, lookbehind-free."""
    return r"(?:^|\n)[^\n]{0,5}?(" + p + r")(?=[^\n]{0,5}(?:\n|$))"


class SectionSegmenter(Transformer):
    requires = ("note_id", "tokens")
    name = "eds.sections"

    def __init__(self, sections: dict[str, Iterable[str]] | str | None = None,
                 attr: str = "NORM"):
        """``sections="reference"`` loads the full 22-section reference
        vocabulary with its line-anchored header context (header within
        5 chars of line start AND line end); a dict or None keeps the
        anywhere-match PhraseMatcher path."""
        if sections == "reference":
            from .matcher import RegexMatcher
            self.sections = REFERENCE_SECTIONS
            self._matcher = RegexMatcher(
                {k: [_line_anchored(p) for p in v]
                 for k, v in REFERENCE_SECTIONS.items()},
                attr=attr, span_type="section_header",
                span_from_group=True,
            )
        else:
            self.sections = sections or DEFAULT_SECTIONS
            self._matcher = PhraseMatcher(self.sections, attr=attr,
                                          span_type="section_header")

    def sections_table(self, notes: DataFrame,
                       headers: DataFrame | None = None) -> DataFrame:
        """(note_id, section, sec_id, start_char, tok_start, end_tok)
        — end is the next header's start (or doc token count).

        ``headers``: precomputed header matches (note_id, label,
        start_char [, tok_start]) — lets a caller that already scans the
        notes plane (e.g. HistoryQualifier's merged cue scan) feed this
        without a second PhraseMatcher pass."""
        if headers is None:
            headers = self._matcher.entities(notes)
        if "tok_start" not in headers.columns:
            # exact-regex path emits char anchors only: recover the
            # token anchor as the count of tokens starting before the
            # header (native filter over the tokens plane, one join)
            toks = notes.select("note_id", F.col("tokens").alias("__toks"))
            sc = F.col("start_char")
            headers = (
                headers.join(toks, "note_id")
                .withColumn(
                    "tok_start",
                    F.size(F.filter(
                        "__toks", lambda t: t["start"] < sc)).cast("int"),
                )
                .drop("__toks")
            )
        ntok = notes.select("note_id", F.size("tokens").alias("n_tokens"))
        w = Window.partitionBy("note_id").orderBy("tok_start")
        return (
            headers.withColumn("next_start", F.lead("tok_start").over(w))
            .withColumn("sec_id", F.row_number().over(w))
            .join(ntok, "note_id")
            .select(
                "note_id",
                F.col("label").alias("section"),
                "sec_id",
                "start_char",
                "tok_start",
                F.coalesce("next_start", "n_tokens").alias("tok_until"),
            )
        )

    def transform(self, df: DataFrame) -> DataFrame:
        secs = self.sections_table(df)
        agg = secs.groupBy("note_id").agg(
            F.sort_array(F.collect_list(F.struct(
                "sec_id", "section", "start_char", "tok_start", "tok_until"
            ))).alias("sections_spans")
        )
        return df.join(agg, "note_id", "left")


@registry.register("eds.sections")
def _make_sections(**kw):
    return SectionSegmenter(**kw)
